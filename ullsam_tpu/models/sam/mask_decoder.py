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

    # upscale image features 4x: convT(s2) -> LN -> GELU -> convT(s2) -> GELU
    up = params["upscale"]
    src = keys.reshape(keys.shape[0], H, W, C)
    x = L.conv_transpose2d(up["convt1"], src, stride=(2, 2))
    x = L.gelu(L.layer_norm(up["ln"], x, eps=1e-6))
    x = L.gelu(L.conv_transpose2d(up["convt2"], x, stride=(2, 2)))  # [B,4H,4W,d/8]

    # hypernetwork heads: stack the nm small MLPs and evaluate batched
    hyper_in = jnp.stack(
        [L.mlp_stack(params["hyper_mlps"][i], mask_tokens_out[:, i, :])
         for i in range(nm)], axis=1)  # [B, nm, d/8]
    up_flat = x.reshape(x.shape[0], 4 * H * 4 * W, x.shape[-1])
    masks = jnp.einsum("bmc,bnc->bmn", hyper_in, up_flat,
                       preferred_element_type=jnp.float32)
    masks = masks.reshape(B, nm, 4 * H, 4 * W).astype(x.dtype)

    iou_pred = L.mlp_stack(params["iou_head"], iou_token_out)
    return masks, iou_pred


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
