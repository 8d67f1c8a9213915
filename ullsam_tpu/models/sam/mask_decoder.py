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

from typing import Optional, Tuple

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


def _upscale_weight_views(up: dict):
    """Matmul views of the transposed-conv / LN weights.

    With kernel == stride, a transposed conv is a per-pixel matmul: output
    pixel (2i+di, 2j+dj) depends only on input pixel (i, j), so the 2x2
    sub-pixel indices can ride along as channel-like dims (block-column
    layout). Returns (w1c [C, 4*C4], b1t, ln_scale_t, ln_bias_t [1, 4*C4],
    w2bd [4*C4, 16*C8] block-diagonal, b2t [1, 16*C8]), biases/LN in f32.
    """
    W1 = up["convt1"]["kernel"]                      # [2, 2, C, C/4] HWIO
    C, C4 = W1.shape[-2], W1.shape[-1]
    w1c = jnp.transpose(W1, (2, 0, 1, 3)).reshape(C, 4 * C4)
    b1 = (up["convt1"]["bias"].astype(jnp.float32) if "bias" in up["convt1"]
          else jnp.zeros((C4,), jnp.float32))
    b1t = jnp.tile(b1, 4)[None]                      # [1, 4*C4]
    lns = jnp.tile(up["ln"]["scale"].astype(jnp.float32), 4)[None]
    lnb = jnp.tile(up["ln"]["bias"].astype(jnp.float32), 4)[None]

    # convT2 as ONE lane-native matmul: block-diagonal [4*C4, 4*(4*C8)]
    # (each (di,dj) group maps to its own (ei,ej,c8) span; the 4x zero
    # padding costs idle MXU flops instead of relayout copies)
    W2 = up["convt2"]["kernel"]                      # [2, 2, C4, C/8]
    C8 = W2.shape[-1]
    w2 = jnp.transpose(W2, (2, 0, 1, 3)).reshape(C4, 4 * C8)
    w2bd = jnp.zeros((4 * C4, 16 * C8), w2.dtype)
    for d in range(4):
        w2bd = jax.lax.dynamic_update_slice(w2bd, w2, (d * C4, d * 4 * C8))
    b2 = (up["convt2"]["bias"].astype(jnp.float32) if "bias" in up["convt2"]
          else jnp.zeros((C8,), jnp.float32))
    b2t = jnp.tile(b2, 16)[None]                     # [1, 16*C8]
    return w1c, b1t, lns, lnb, w2bd, b2t


def _upscale_hypernet_cols(up: dict, hyper_in: Array, keys: Array,
                           use_pallas: bool = False) -> Array:
    """4x upscale (two k=s=2 transposed convs + LN + GELU,
    mask_decoder.py:53-69) and hypernetwork dot products in BLOCK-COLUMN
    layout: returns [B, N, nm*16] with cols o = (m, di, dj, ei, ej), where
    output pixel (4i+2di+ei, 4j+2dj+ej) of mask m is row i*W+j, col o.

    The naive spatial interleave (einsum + 6-D transpose per conv)
    materialized ~2.6 GB of f32 layout copies per 256-prompt AMG decode
    chunk; this layout keeps every op lane-native. On TPU with production
    shapes the whole chain runs as one Pallas kernel
    (ops/pallas/decoder.fused_upscale_hypernet): the per-prompt hypernet
    contraction and ~1 GB of f32 LN/GELU HBM traffic collapse into VMEM.
    """
    B, N, C = keys.shape
    nm = hyper_in.shape[1]
    dtype = keys.dtype
    w1c, b1t, lns, lnb, w2bd, b2t = _upscale_weight_views(up)

    if use_pallas:
        from ullsam_tpu.ops.pallas import decoder as PD
        if PD.supported(keys.shape, C):
            return PD.fused_upscale_hypernet(keys, hyper_in, w1c, b1t,
                                             lns, lnb, w2bd, b2t)

    u1 = jnp.dot(keys, w1c.astype(dtype),
                 preferred_element_type=jnp.float32) + b1t
    # grouped LayerNorm over each of the four C4-wide sub-pixel groups,
    # WITHOUT reshaping the 4*C4 lane dim: group statistics via tiny 0/1
    # matmuls (lane-dim splits forced ~3 GB of f32 relayout/broadcast
    # traffic per 256-prompt chunk)
    C4 = w1c.shape[1] // 4
    group = jnp.asarray(np.kron(np.eye(4), np.ones((C4, 1))) / C4,
                        jnp.float32)                 # [4*C4, 4] mean-pool
    expand = jnp.asarray(np.kron(np.eye(4), np.ones((1, C4))),
                         jnp.float32)                # [4, 4*C4] broadcast
    m1 = jnp.dot(u1, group)                          # [B, N, 4]
    m2 = jnp.dot(jnp.square(u1), group)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    inv = jax.lax.rsqrt(var + 1e-6)
    u1 = ((u1 - jnp.dot(m1, expand)) * jnp.dot(inv, expand)) * lns + lnb
    u1 = L.gelu(u1).astype(dtype)                    # [B, N, 4*C4]

    u2 = jnp.dot(u1, w2bd.astype(dtype),
                 preferred_element_type=jnp.float32) + b2t
    u2 = L.gelu(u2.astype(dtype))                    # cols: (di,dj,ei,ej,c8)

    # hypernet dot as a per-prompt block-diagonal matmul over the SAME
    # lane layout: Hbd[(e, c8), (m, e')] = hyper[m, c8] iff e == e'
    C8 = u2.shape[-1] // 16
    eye16 = jnp.eye(16, dtype=dtype)                 # e == e'
    # [B, 16*C8, nm*16]: kron(eye16, hyper^T) per batch, cols (m, e)
    hbd = jnp.einsum("ef,bmc->becmf", eye16,
                     hyper_in.astype(dtype)).reshape(B, 16 * C8, nm * 16)
    return jnp.einsum("bnk,bko->bno", u2, hbd,
                      preferred_element_type=jnp.float32).astype(dtype)


def cols_to_spatial(masks_cols: Array, nm: int, H: int, W: int) -> Array:
    """Block-column masks [B, N, nm*16] -> spatial [B, nm, 4H, 4W]."""
    B = masks_cols.shape[0]
    # cols o = (m, di, dj, ei, ej); 4H = 4i+2di+ei, 4W = 4j+2dj+ej
    masks = masks_cols.reshape(B, H, W, nm, 2, 2, 2, 2)
    masks = jnp.transpose(masks, (0, 3, 1, 4, 6, 2, 5, 7))
    return masks.reshape(B, nm, 4 * H, 4 * W)


def _upscale_hypernet_block(up: dict, hyper_in: Array, keys: Array,
                            H: int, W: int) -> Array:
    """Spatial-layout wrapper: ONE transpose of the final [B, nm, 4H*4W]
    bf16 masks restores spatial order. keys: [B, H*W, C]."""
    cols = _upscale_hypernet_cols(up, hyper_in, keys)
    return cols_to_spatial(cols, hyper_in.shape[1], H, W)


def predict_masks_cols(params: dict, cfg: MaskDecoderConfig,
                       image_embeddings: Array, image_pe: Array,
                       sparse_prompt: Array, dense_prompt: Array,
                       multimask_output: Optional[bool] = None,
                       ) -> Tuple[Array, Array]:
    """Decode to BLOCK-COLUMN mask layout (the AMG sweep fast path).

    Same math as predict_masks but the final masks stay as
    [B, N, M*16] (cols = (m, di, dj, ei, ej); see _upscale_hypernet_cols)
    — no [B, nm, 4H, 4W] spatial transpose. On TPU the upscale+hypernet
    chain runs as one fused Pallas kernel. `multimask_output` selects the
    mask tokens BEFORE the upscale (True -> m=1..nm-1, False -> m=0,
    None -> all nm), so unused hypernet columns are never computed.
    Returns (masks_cols, iou_pred [B, M]).
    """
    B = sparse_prompt.shape[0]
    d = cfg.transformer_dim
    nm = cfg.num_mask_tokens

    output_tokens = jnp.concatenate(
        [params["iou_token"], params["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, 1 + nm, d))
    tokens = jnp.concatenate(
        [output_tokens.astype(sparse_prompt.dtype), sparse_prompt], axis=1)
    src = image_embeddings + dense_prompt.astype(image_embeddings.dtype)

    from ullsam_tpu.ops.pallas import decoder as PD
    _, H, W, _ = src.shape
    if (src.shape[0] == 1
            and PD.twt_supported(d, d // cfg.attention_downsample_rate,
                                 cfg.transformer_num_heads,
                                 cfg.transformer_depth, tokens.shape[1],
                                 H * W)):
        # shared image embedding: per-prompt fused Pallas transformer
        hs, keys = PD.fused_two_way_transformer(
            params["transformer"], src.reshape(1, H * W, d),
            image_pe.reshape(1, H * W, d), tokens,
            heads=cfg.transformer_num_heads,
            mlp_dim=cfg.transformer_mlp_dim, eps=cfg.ln_eps)
    else:
        hs, keys = two_way_transformer_apply(params["transformer"], cfg,
                                             src, image_pe, tokens)
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1:1 + nm, :]
    m_idx = (range(1, nm) if multimask_output is True
             else range(0, 1) if multimask_output is False
             else range(nm))
    hyper_in = jnp.stack(
        [L.mlp_stack(params["hyper_mlps"][i], mask_tokens_out[:, i, :])
         for i in m_idx], axis=1)  # [B, M, d/8]

    masks_cols = _upscale_hypernet_cols(params["upscale"], hyper_in, keys,
                                        use_pallas=True)
    iou_pred = L.mlp_stack(params["iou_head"], iou_token_out)
    iou_pred = iou_pred[:, list(m_idx)]
    return masks_cols, iou_pred


def predict_masks_cols_stats(params: dict, cfg: MaskDecoderConfig,
                             image_embeddings: Array, image_pe: Array,
                             sparse_prompt: Array, dense_prompt: Array,
                             multimask_output: Optional[bool],
                             thr: float, off: float):
    """predict_masks_cols + IN-KERNEL mask statistics.

    On TPU the fused upscale kernel also emits hi/lo pixel counts and
    row/col occupancy bitmaps while each logit tile is in VMEM, so the
    stability scores and bounding boxes cost a few tiny reductions
    instead of several HBM passes over the cols tensor (the XLA stats
    chain was ~2.9 ms of the AMG decode chunk). Returns
    (masks_cols, iou_pred, stats) where stats = (stability [B, M],
    boxes_lowres [B, M, 4]) or None when the kernel path is off (the
    caller then computes them from the cols — identical values).
    """
    B = sparse_prompt.shape[0]
    d = cfg.transformer_dim
    nm = cfg.num_mask_tokens

    output_tokens = jnp.concatenate(
        [params["iou_token"], params["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, 1 + nm, d))
    tokens = jnp.concatenate(
        [output_tokens.astype(sparse_prompt.dtype), sparse_prompt], axis=1)
    src = image_embeddings + dense_prompt.astype(image_embeddings.dtype)

    from ullsam_tpu.ops.pallas import decoder as PD
    _, H, W, _ = src.shape
    m_idx = (range(1, nm) if multimask_output is True
             else range(0, 1) if multimask_output is False
             else range(nm))
    M = len(m_idx)

    if (src.shape[0] == 1
            and PD.decode_fused_supported(
                d, d // cfg.attention_downsample_rate,
                cfg.transformer_num_heads, cfg.transformer_depth,
                tokens.shape[1], H * W, M)):
        # one-dispatch megakernel: TWT + hypernet MLPs + upscale + stats
        # with the per-prompt keys VMEM-resident (never in HBM)
        hs, cols, counts, rowany, colany = PD.fused_decode_masks(
            params["transformer"], _upscale_weight_views(params["upscale"]),
            PD.pack_hyper_mlps([params["hyper_mlps"][i] for i in m_idx],
                               dtype=src.dtype),
            src.reshape(1, H * W, d), image_pe.reshape(1, H * W, d),
            tokens, heads=cfg.transformer_num_heads,
            mlp_dim=cfg.transformer_mlp_dim, eps=cfg.ln_eps, W=W, nm=M,
            thr=float(thr), off=float(off), m_lo=m_idx.start)
        iou_pred = L.mlp_stack(params["iou_head"],
                               hs[:, 0, :])[:, list(m_idx)]
        return cols, iou_pred, _stats_from_kernel(
            counts, rowany, colany, M, H, W)

    if (src.shape[0] == 1
            and PD.twt_supported(d, d // cfg.attention_downsample_rate,
                                 cfg.transformer_num_heads,
                                 cfg.transformer_depth, tokens.shape[1],
                                 H * W)):
        hs, keys = PD.fused_two_way_transformer(
            params["transformer"], src.reshape(1, H * W, d),
            image_pe.reshape(1, H * W, d), tokens,
            heads=cfg.transformer_num_heads,
            mlp_dim=cfg.transformer_mlp_dim, eps=cfg.ln_eps)
    else:
        hs, keys = two_way_transformer_apply(params["transformer"], cfg,
                                             src, image_pe, tokens)
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1:1 + nm, :]
    hyper_in = jnp.stack(
        [L.mlp_stack(params["hyper_mlps"][i], mask_tokens_out[:, i, :])
         for i in m_idx], axis=1)  # [B, M, d/8]
    iou_pred = L.mlp_stack(params["iou_head"], iou_token_out)[:, list(m_idx)]

    if PD.supported(keys.shape, d) and M <= 8:
        w1c, b1t, lns, lnb, w2bd, b2t = _upscale_weight_views(
            params["upscale"])
        cols, counts, rowany, colany = PD.fused_upscale_hypernet_stats(
            keys, hyper_in, w1c, b1t, lns, lnb, w2bd, b2t,
            W=W, nm=M, thr=float(thr), off=float(off))
        return cols, iou_pred, _stats_from_kernel(
            counts, rowany, colany, M, H, W)

    cols = _upscale_hypernet_cols(params["upscale"], hyper_in, keys)
    return cols, iou_pred, None


def _stats_from_kernel(counts: Array, rowany: Array, colany: Array,
                       M: int, H: int, W: int):
    """(stability, boxes) from the in-kernel statistics outputs."""
    hi = counts[:, 0, :M]
    lo = counts[:, 1, :M]
    stability = hi / jnp.maximum(lo, 1.0)
    # boxes from the occupancy bitmaps (mask_to_box_cols semantics:
    # inclusive edges, zeros for empty)
    any_row = rowany[:, :M, :] > 0          # [B, M, 4H]
    any_col = colany[:, :M, :] > 0          # [B, M, 4W]
    rows = jnp.arange(4 * H)
    cols_i = jnp.arange(4 * W)
    top = jnp.min(jnp.where(any_row, rows, 4 * H), axis=-1)
    bottom = jnp.max(jnp.where(any_row, rows, -1), axis=-1)
    left = jnp.min(jnp.where(any_col, cols_i, 4 * W), axis=-1)
    right = jnp.max(jnp.where(any_col, cols_i, -1), axis=-1)
    empty = ~jnp.any(any_row, axis=-1)
    boxes = jnp.stack([left, top, right, bottom], axis=-1)
    boxes = jnp.where(empty[..., None], 0, boxes).astype(jnp.float32)
    return stability, boxes


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
