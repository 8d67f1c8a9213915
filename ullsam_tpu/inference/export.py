"""Serialized-model export: the TPU-era analog of utils/onnx.py.

The reference exports a trace-friendly prompt-decode module to ONNX
(SamOnnxModel, utils/onnx.py:19-144) so the decoder can run outside
PyTorch. Here the decode path is already a pure jitted function; this
module serializes it with jax.export (StableHLO) so it can be embedded in
other runtimes (C++ PJRT, serving systems) without Python model code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig
from ullsam_tpu.models.sam import sam as S


def make_decoder_fn(cfg: SamConfig, num_points: int,
                    multimask_output: bool = True):
    """Branchless point-decode closure with static prompt shapes.

    (embedding [1,64,64,256], coords [B,num_points,2], labels [B,num_points])
      -> (low-res mask logits [B,M,256,256], iou [B,M])
    Mask-input refinement is folded in when a 4th arg is provided by
    make_decoder_with_mask_fn.
    """

    def fn(params, embedding, coords, labels):
        return S.decode_masks(params, cfg, embedding,
                              points=(coords, labels),
                              multimask_output=multimask_output)

    return fn


def export_decoder(params, cfg: SamConfig, num_points: int = 4,
                   batch: int = 1, multimask_output: bool = True) -> bytes:
    """Serialize the prompt decoder to a portable StableHLO artifact."""
    from jax import export as jexport

    fn = make_decoder_fn(cfg, num_points, multimask_output)
    closed = lambda e, c, l: fn(params, e, c, l)  # noqa: E731
    h, w = cfg.prompt_encoder.image_embedding_size
    d = cfg.vit.out_chans
    args = (
        jax.ShapeDtypeStruct((1, h, w, d), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_points), jnp.int32),
    )
    exported = jexport.export(jax.jit(closed))(*args)
    return exported.serialize()


def load_exported_decoder(blob: bytes):
    """Deserialize and return a callable (embedding, coords, labels)."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call
