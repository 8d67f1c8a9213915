"""Converter: uLLSAM fusion checkpoints -> ullsam_tpu param tree.

Reference checkpoint layout (train_joint_v2.py:1466-1556 load paths):
top-level prefixes vision_model. / prompt_encoder. / mask_decoder. /
language_model. / mlp1. / mlp2., possibly wrapped in "module." by DDP.
mlp1/mlp2 are Sequential(LN, Linear, GELU, Linear) -> indices 0, 1, 3.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ullsam_tpu.core.config import FusionConfig
from ullsam_tpu.convert.torch_sam import (_lin, _ln, convert_image_encoder,
                                          convert_mask_decoder,
                                          convert_prompt_encoder)
from ullsam_tpu.convert.torch_internlm2 import convert_internlm2_state_dict

ArrayDict = Mapping[str, np.ndarray]


def _convert_proj_mlp(sd: ArrayDict, prefix: str) -> dict:
    return {
        "ln": _ln(sd, f"{prefix}.0"),
        "fc1": _lin(sd, f"{prefix}.1"),
        "fc2": _lin(sd, f"{prefix}.3"),
    }


def strip_module_prefix(sd: ArrayDict) -> dict:
    """Remove DDP's 'module.' wrapper if present."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return dict(sd)


def convert_fusion_state_dict(sd: ArrayDict, cfg: FusionConfig,
                              prefix: str = "") -> dict:
    """Full uLLSAM state dict -> {'sam': ..., 'llm': ..., 'mlp1', 'mlp2'}."""
    sd = strip_module_prefix(sd)
    p = prefix
    return {
        "sam": {
            "image_encoder": convert_image_encoder(
                sd, cfg.sam.vit, f"{p}vision_model."),
            "prompt_encoder": convert_prompt_encoder(
                sd, cfg.sam.prompt_encoder, f"{p}prompt_encoder."),
            "mask_decoder": convert_mask_decoder(
                sd, cfg.sam.mask_decoder, f"{p}mask_decoder."),
        },
        "llm": convert_internlm2_state_dict(sd, cfg.llm,
                                            prefix=f"{p}language_model."),
        "mlp1": _convert_proj_mlp(sd, f"{p}mlp1"),
        "mlp2": _convert_proj_mlp(sd, f"{p}mlp2"),
    }
