"""SAM mask decoder, TPU-native.

Behavioral reference: /root/reference/modeling/mask_decoder.py. Tokens =
[iou_token; 4 mask tokens; sparse prompts]; the dense prompt is added to the
image embedding; a TwoWayTransformer refines tokens & image; the image is
upscaled 4x by two transposed convs and masks are hypernetwork dot products.

jit notes: `multimask_output` is a static python bool (slice choice,
mask_decoder.py:101-107). The hypernetwork MLPs are evaluated as a batched
stack rather than a python loop.

Layouts: image inputs/outputs NHWC; mask logits return [B, M, 4H, 4W].
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import MaskDecoderConfig
from ullsam_tpu.ops import layers as L
from ullsam_tpu.models.sam.two_way_transformer import (
    two_way_transformer_init, two_way_transformer_apply)

Array = jax.Array


def mask_decoder_init(key, cfg: MaskDecoderConfig) -> dict:
    d = cfg.transformer_dim
    nm = cfg.num_mask_tokens
    keys = jax.random.split(key, 6 + nm)
    return {
        "iou_token": jax.random.normal(keys[0], (1, d)),
        "mask_tokens": jax.random.normal(keys[1], (nm, d)),
        "transformer": two_way_transformer_init(keys[2], cfg),
        "upscale": {
            "convt1": L.conv_init(keys[3], d, d // 4, (2, 2)),
            "ln": L.layer_norm_init(d // 4),
            "convt2": L.conv_init(keys[4], d // 4, d // 8, (2, 2)),
        },
        "hyper_mlps": [
            L.mlp_stack_init(keys[5 + i], [d, d, d, d // 8]) for i in range(nm)
        ],
        "iou_head": L.mlp_stack_init(
            keys[5 + nm],
            [d] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1) + [nm]),
    }


def predict_masks(params: dict, cfg: MaskDecoderConfig,
                  image_embeddings: Array, image_pe: Array,
                  sparse_prompt: Array, dense_prompt: Array,
                  ) -> Tuple[Array, Array]:
    """Core decode (mask_decoder.py:112-149).

    image_embeddings: [1 or B, H, W, C] NHWC (broadcast across prompts),
    image_pe: [1, H, W, C], sparse_prompt: [B, N, C],
    dense_prompt: [B, H, W, C].
    Returns (mask logits [B, num_mask_tokens, 4H, 4W], iou_pred [B, nm]).
    """
    B = sparse_prompt.shape[0]
    d = cfg.transformer_dim
    nm = cfg.num_mask_tokens

    output_tokens = jnp.concatenate(
        [params["iou_token"], params["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, 1 + nm, d))
    tokens = jnp.concatenate(
        [output_tokens.astype(sparse_prompt.dtype), sparse_prompt], axis=1)

    # keep src at the NATURAL broadcast batch: when both the embedding and
    # the dense prompt are shared (batch 1, e.g. the AMG no-mask sweep),
    # the transformer's key-side projections run once and per-prompt keys
    # only materialize at the first image->token update
    src = image_embeddings + dense_prompt.astype(image_embeddings.dtype)
    _, H, W, C = src.shape

    hs, keys = two_way_transformer_apply(params["transformer"], cfg, src,
                                         image_pe, tokens)
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1:1 + nm, :]

    # hypernetwork heads: stack the nm small MLPs and evaluate batched
    hyper_in = jnp.stack(
        [L.mlp_stack(params["hyper_mlps"][i], mask_tokens_out[:, i, :])
         for i in range(nm)], axis=1)  # [B, nm, d/8]

    masks = _upscale_hypernet_block(params["upscale"], hyper_in, keys, H, W)

    iou_pred = L.mlp_stack(params["iou_head"], iou_token_out)
    return masks, iou_pred


def _upscale_hypernet_block(up: dict, hyper_in: Array, keys: Array,
                            H: int, W: int) -> Array:
    """4x upscale (two k=s=2 transposed convs + LN + GELU,
    mask_decoder.py:53-69) and hypernetwork dot products in BLOCK layout.

    With kernel == stride, a transposed conv is a per-pixel matmul: output
    pixel (2i+di, 2j+dj) depends only on input pixel (i, j). The naive
    spatial interleave (einsum + 6-D transpose per conv) materialized
    ~2.6 GB of f32 layout copies per 256-prompt AMG decode chunk — ~20 ms
    of a 62 ms chunk. Here the 2x2 sub-pixel indices ride along as
    channel-like dims through both convs, the LN/GELUs, and the hypernet
    contraction; ONE transpose of the final [B, nm, 4H*4W] bf16 masks
    (~134 MB) restores spatial order.

    keys: [B, H*W, C] transformer image output. Returns [B, nm, 4H, 4W].
    """
    B, N, C = keys.shape
    nm = hyper_in.shape[1]
    dtype = keys.dtype

    W1 = up["convt1"]["kernel"]                      # [2, 2, C, C/4] HWIO
    C4 = W1.shape[-1]
    w1 = jnp.transpose(W1, (2, 0, 1, 3)).reshape(C, 4 * C4).astype(dtype)
    u1 = jnp.dot(keys, w1, preferred_element_type=jnp.float32)
    if "bias" in up["convt1"]:
        u1 = u1 + jnp.tile(up["convt1"]["bias"].astype(jnp.float32), 4)

    # grouped LayerNorm over each of the four C4-wide sub-pixel groups,
    # WITHOUT reshaping the 4*C4 lane dim: group statistics via tiny 0/1
    # matmuls (lane-dim splits forced ~3 GB of f32 relayout/broadcast
    # traffic per 256-prompt chunk)
    group = jnp.asarray(np.kron(np.eye(4), np.ones((C4, 1))) / C4,
                        jnp.float32)                 # [4*C4, 4] mean-pool
    expand = jnp.asarray(np.kron(np.eye(4), np.ones((1, C4))),
                         jnp.float32)                # [4, 4*C4] broadcast
    m1 = jnp.dot(u1, group)                          # [B, N, 4]
    m2 = jnp.dot(jnp.square(u1), group)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    inv = jax.lax.rsqrt(var + 1e-6)
    scale = jnp.tile(up["ln"]["scale"].astype(jnp.float32), 4)
    bias = jnp.tile(up["ln"]["bias"].astype(jnp.float32), 4)
    u1 = ((u1 - jnp.dot(m1, expand)) * jnp.dot(inv, expand)) * scale + bias
    u1 = L.gelu(u1).astype(dtype)                    # [B, N, 4*C4]

    # convT2 as ONE lane-native matmul: block-diagonal [4*C4, 4*(4*C8)]
    # (each (di,dj) group maps to its own (ei,ej,c8) span; the 4x zero
    # padding costs idle MXU flops instead of relayout copies)
    W2 = up["convt2"]["kernel"]                      # [2, 2, C4, C/8]
    C8 = W2.shape[-1]
    w2 = jnp.transpose(W2, (2, 0, 1, 3)).reshape(C4, 4 * C8)
    w2bd = jnp.zeros((4 * C4, 16 * C8), w2.dtype)
    for d in range(4):
        w2bd = jax.lax.dynamic_update_slice(w2bd, w2, (d * C4, d * 4 * C8))
    u2 = jnp.dot(u1, w2bd.astype(dtype),
                 preferred_element_type=jnp.float32)  # [B, N, 16*C8]
    if "bias" in up["convt2"]:
        u2 = u2 + jnp.tile(up["convt2"]["bias"].astype(jnp.float32), 16)
    u2 = L.gelu(u2.astype(dtype))                    # cols: (di,dj,ei,ej,c8)

    # hypernet dot as a per-prompt block-diagonal matmul over the SAME
    # lane layout: Hbd[(e, c8), (m, e')] = hyper[m, c8] iff e == e'
    eye16 = jnp.eye(16, dtype=dtype)                 # e == e'
    # [B, 16*C8, nm*16]: kron(eye16, hyper^T) per batch, cols (m, e)
    hbd = jnp.einsum("ef,bmc->becmf", eye16,
                     hyper_in.astype(dtype)).reshape(B, 16 * C8, nm * 16)
    masks = jnp.einsum("bnk,bko->bno", u2, hbd,
                       preferred_element_type=jnp.float32).astype(dtype)
    # cols o = (m, di, dj, ei, ej); 4H = 4i+2di+ei, 4W = 4j+2dj+ej
    masks = masks.reshape(B, H, W, nm, 2, 2, 2, 2)
    masks = jnp.transpose(masks, (0, 3, 1, 4, 6, 2, 5, 7))
    return masks.reshape(B, nm, 4 * H, 4 * W)


def mask_decoder_apply(params: dict, cfg: MaskDecoderConfig,
                       image_embeddings: Array, image_pe: Array,
                       sparse_prompt: Array, dense_prompt: Array,
                       multimask_output: bool) -> Tuple[Array, Array]:
    """Full forward with output-mask selection (mask_decoder.py:71-110)."""
    masks, iou_pred = predict_masks(params, cfg, image_embeddings, image_pe,
                                    sparse_prompt, dense_prompt)
    if multimask_output:
        return masks[:, 1:, :, :], iou_pred[:, 1:]
    return masks[:, 0:1, :, :], iou_pred[:, 0:1]
