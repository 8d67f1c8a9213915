"""SAM model registry (reference: build_sam.py:47-107).

build_sam("vit_b" | "vit_l" | "vit_h", checkpoint=...) -> (cfg, params).
Checkpoints may be torch .pth state dicts (converted via
ullsam_tpu.convert.torch_sam) or native orbax/npz trees.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from ullsam_tpu.core.config import SAM_REGISTRY, SamConfig
from ullsam_tpu.models.sam.sam import sam_init


def build_sam(variant: str = "vit_b", checkpoint: Optional[str] = None,
              seed: int = 0) -> Tuple[SamConfig, dict]:
    if variant not in SAM_REGISTRY:
        raise KeyError(f"unknown SAM variant {variant!r}; "
                       f"options: {sorted(SAM_REGISTRY)}")
    cfg = SAM_REGISTRY[variant]()
    params = sam_init(jax.random.PRNGKey(seed), cfg)
    if checkpoint is not None:
        from ullsam_tpu.convert.torch_sam import load_sam_checkpoint
        params = load_sam_checkpoint(checkpoint, cfg, params)
    return cfg, params
