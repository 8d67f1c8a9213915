"""Pallas TPU flash-attention kernels.

Two variants cover the reference's external flash-attn dependency
(SURVEY §2.9) the TPU way:

  * vit_flash_attention — non-causal, with the ViTDet DECOMPOSED relative
    position bias consumed in FACTORED form (rel_h [B,N,Kh] + rel_w
    [B,N,Kw], image_encoder.py:325-361): each k-tile's bias block is
    reconstructed on the fly from two skinny tensors, so the [N, N] bias is
    never materialized in HBM (for ViT-B global layers that is 12x4096^2
    floats per image saved).
  * llm_flash_attention — causal + GQA + segment-ids (the varlen
    replacement, modeling_internlm2.py:509-561), O(S) memory.

Both use the standard online-softmax recurrence with fp32 accumulators in
VMEM scratch, k-tiles iterated in the innermost (sequential) grid dim.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# ViT: non-causal + factored decomposed rel-pos bias
# ---------------------------------------------------------------------------


def _bias_select(rhw, sel_bool, compute_dtype):
    """Rebuild a [TQ, TK] rel-pos bias tile: rhw [TQ, KH+KW] f32 through a
    one-hot selection matmul. The dot only COPIES rhw values, so operand
    precision is a speed knob: an f32 dot runs at a fraction of the MXU's
    bf16 rate and costs more than q@k itself. bf16 compute: ONE bf16 pass
    (operand rounding ~2^-9 relative on a pre-softmax bias — inside the
    bf16 noise the logits already carry). f32 compute: bf16 hi+lo passes
    reproduce each f32 value to ~2^-16 relative (exact selection, rounded
    operands; parity tests hold atol<=1e-5)."""
    sel = sel_bool.astype(jnp.bfloat16)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if compute_dtype == jnp.float32:
        hi = rhw.astype(jnp.bfloat16)
        lo = (rhw - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(hi, sel) + dot(lo, sel)
    return dot(rhw.astype(jnp.bfloat16), sel)


def _vit_kernel(q_ref, k_ref, v_ref, rhw_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, kh: int, kw: int, block_k: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [TQ, D] (pre-scaled)
    k = k_ref[0]                      # [TK, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [TQ, TK]

    # factored rel-pos bias for this k tile. Key index within the tile:
    # kj -> grid row ik*rows + kj//kw, grid col kj%kw. The bias block is
    # ONE matmul: [rel_h | rel_w] @ sel, where sel is a dynamic-content
    # one-hot selector built from iotas (Mosaic cannot reshape lane dims
    # or slice them at non-128 offsets, but a 128-wide dot is native).
    rows_per_tile = block_k // kw
    rhw = rhw_ref[0]                  # [TQ, KH + KW]
    hsel_rows = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 1)
    h_onehot = hsel_rows == (ik * rows_per_tile + kj // kw)
    w_onehot = hsel_rows == (kh + kj % kw)
    logits = logits + _bias_select(rhw, h_onehot | w_onehot, q_ref.dtype)

    m_prev = m_scr[:, 0:1]                               # [TQ, 1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)      # [TQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)                          # [TQ, TK]
    alpha = jnp.exp(m_prev - m_new)                      # [TQ, 1]
    l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)
        lse = m_scr[:, 0:1] + jnp.log(l_scr[:, 0:1])
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _vit_attention_xla(q: Array, k: Array, v: Array, rel_h: Array,
                       rel_w: Array) -> Array:
    """Reference math used for the backward pass (bias materialized)."""
    B, N, D = q.shape
    KH, KW = rel_h.shape[-1], rel_w.shape[-1]
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(B, N, N)
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits + bias.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _vit_flash_impl(q: Array, k: Array, v: Array, rel_h: Array,
                    rel_w: Array, block_q: int = 1024,
                    block_k: int = 1024):
    """Flash attention with decomposed rel-pos bias.

    q, k, v: [B, N, D] (B = batch*heads folded), N = kh*kw grid tokens.
    rel_h: [B, N, KH], rel_w: [B, N, KW] fp32 bias factors
    (bias[b, i, kh*KW + kw] = rel_h[b, i, kh] + rel_w[b, i, kw]).
    Returns [B, N, D]. Scale (1/sqrt(D)) must be pre-applied to q or folded
    into rel factors by the caller... it is applied here to q.
    """
    B, N, D = q.shape
    KH = rel_h.shape[-1]
    KW = rel_w.shape[-1]
    assert KH * KW == N, (KH, KW, N)
    assert N % block_q == 0 and N % block_k == 0
    assert block_k % KW == 0, "k tile must cover whole key-grid rows"

    qs = (q * (D ** -0.5)).astype(q.dtype)
    grid = (B, N // block_q, N // block_k)
    # bf16 compute consumes the bias factors at bf16 anyway (_bias_select
    # rounds them before the selection dot), so ship them to the kernel at
    # bf16 and halve their HBM write+read (~100 MB/layer on ViT-H global);
    # f32 compute keeps f32 factors for the hi/lo exact-selection path.
    rel_dtype = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    rel_hw = jnp.concatenate([rel_h, rel_w], axis=-1).astype(rel_dtype)

    kernel = functools.partial(_vit_kernel, kh=KH, kw=KW, block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, KH + KW),
                         lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, iq, ik: (b, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), q.dtype),
            # row logsumexp, lane-replicated x8 (a [B, N] output violates
            # the (8, 128) tile rule for B > 1)
            jax.ShapeDtypeStruct((B, N, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )(qs, k, v, rel_hw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def vit_flash_attention(q: Array, k: Array, v: Array, rel_h: Array,
                        rel_w: Array, block_q: int = 1024,
                        block_k: int = 1024) -> Array:
    """Public entry: flash forward; custom fused backward (below)."""
    return _vit_flash_impl(q, k, v, rel_h, rel_w, block_q, block_k)[0]


# ---------------------------------------------------------------------------
# ViT GLOBAL attention on the PACKED head-major layout
# ---------------------------------------------------------------------------
#
# Same online-softmax flash as _vit_kernel, but q/k/v arrive as 128-lane
# head slices of the packed qkv projection ([B, N, 3*nh*128], the window
# kernel's layout) and the head axis rides the GRID: no [B, N, 3, nh, hd]
# head-split transpose, no output merge-transpose — the relayout copies
# that cost ~1 ms/layer on the windowed path before it was packed
# (image_encoder.py:144-180). The rel-pos bias still arrives factored
# per (head, token) as rhw = [rel_h | rel_w].


def _vit_kernel_packed(q_ref, k_ref, v_ref, rhw_ref, o_ref, lse_ref,
                       m_scr, l_scr, acc_scr, *, kh: int, kw: int,
                       block_k: int, scale: float):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = (q_ref[0] * scale).astype(q_ref.dtype)   # scale applied in-kernel
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    rows_per_tile = block_k // kw
    rhw = rhw_ref[0]
    hsel_rows = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 1)
    h_onehot = hsel_rows == (ik * rows_per_tile + kj // kw)
    w_onehot = hsel_rows == (kh + kj % kw)
    logits = logits + _bias_select(rhw, h_onehot | w_onehot, q_ref.dtype)

    m_prev = m_scr[:, 0:1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)
        lse = m_scr[:, 0:1] + jnp.log(l_scr[:, 0:1])
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _vit_flash_packed_impl(qkvp: Array, rel_h: Array, rel_w: Array,
                           nh: int, hd: int, block_q: int, block_k: int):
    """qkvp [B, N, 3*nh*128] packed; rel_h/rel_w [B*nh, N, KH/KW].

    Returns (out [B, N, nh*128] head-major padded, lse [B*nh, N, 8])."""
    B, N, _ = qkvp.shape
    KH = rel_h.shape[-1]
    KW = rel_w.shape[-1]
    assert KH * KW == N, (KH, KW, N)
    assert N % block_q == 0 and N % block_k == 0
    assert block_k % KW == 0
    rel_dtype = jnp.float32 if qkvp.dtype == jnp.float32 else qkvp.dtype
    rhw = jnp.concatenate([rel_h, rel_w], axis=-1).astype(rel_dtype)

    kernel = functools.partial(_vit_kernel_packed, kh=KH, kw=KW,
                               block_k=block_k, scale=hd ** -0.5)
    HP = _HP
    return pl.pallas_call(
        kernel,
        grid=(B * nh, N // block_q, N // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, HP),
                         lambda bh, iq, ik: (bh // nh, iq, bh % nh)),
            pl.BlockSpec((1, block_k, HP),
                         lambda bh, iq, ik: (bh // nh, ik, nh + bh % nh)),
            pl.BlockSpec((1, block_k, HP),
                         lambda bh, iq, ik: (bh // nh, ik, 2 * nh + bh % nh)),
            pl.BlockSpec((1, block_q, KH + KW),
                         lambda bh, iq, ik: (bh, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, HP),
                         lambda bh, iq, ik: (bh // nh, iq, bh % nh)),
            pl.BlockSpec((1, block_q, 8), lambda bh, iq, ik: (bh, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, nh * HP), qkvp.dtype),
            jax.ShapeDtypeStruct((B * nh, N, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, _HP), jnp.float32),
        ],
    )(qkvp, qkvp, qkvp, rhw)


def _unpack_heads(a: Array, nh: int) -> Array:
    """[B, N, nh*HP] head-major padded -> [B*nh, N, HP]."""
    B, N, _ = a.shape
    return a.reshape(B, N, nh, _HP).transpose(0, 2, 1, 3).reshape(
        B * nh, N, _HP)


def _pack_heads(a: Array, B: int, nh: int) -> Array:
    """[B*nh, N, HP] -> [B, N, nh*HP]."""
    _, N, HP = a.shape
    return a.reshape(B, nh, N, HP).transpose(0, 2, 1, 3).reshape(
        B, N, nh * HP)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def vit_flash_attention_packed(qkvp: Array, rel_h: Array, rel_w: Array,
                               nh: int, hd: int, block_q: int = 1024,
                               block_k: int = 1024) -> Array:
    """Global flash attention over the packed head-major qkv layout.

    qkvp: [B, N, 3*nh*128] (q|k|v sections, per-head hd channels
    left-aligned in a 128-lane slot, pad lanes zero).
    rel_h/rel_w: [B*nh, N, KH]/[B*nh, N, KW] factored rel-pos bias.
    Returns [B, N, nh*128] head-major padded (pad lanes zero).
    """
    return _vit_flash_packed_impl(qkvp, rel_h, rel_w, nh, hd,
                                  block_q, block_k)[0]


def _vit_flash_packed_fwd(qkvp, rel_h, rel_w, nh, hd, block_q, block_k):
    out, lse = _vit_flash_packed_impl(qkvp, rel_h, rel_w, nh, hd,
                                      block_q, block_k)
    return out, (qkvp, rel_h, rel_w, out, lse)


def _vit_flash_packed_bwd(nh, hd, block_q, block_k, res, g):
    """Unpack to the per-head layout and reuse the fused flash backward.

    The unpack/repack transposes only exist in the BACKWARD (training);
    the inference encode path that motivates the packed forward never
    runs them."""
    qkvp, rel_h, rel_w, out, lse = res
    B, N, _ = qkvp.shape
    qkv = qkvp.reshape(B, N, 3, nh * _HP)
    q = _unpack_heads(qkv[:, :, 0], nh)
    k = _unpack_heads(qkv[:, :, 1], nh)
    v = _unpack_heads(qkv[:, :, 2], nh)
    do = _unpack_heads(g, nh)
    o = _unpack_heads(out, nh)
    bq, bk = min(block_q, 512), min(block_k, 512)
    dq, dk, dv, drel_h, drel_w = _vit_flash_bwd_impl(
        q, k, v, rel_h, rel_w, o, lse, do, bq, bk, scale=hd ** -0.5)
    dqkvp = jnp.stack([_pack_heads(dq, B, nh), _pack_heads(dk, B, nh),
                       _pack_heads(dv, B, nh)], axis=2).reshape(
        B, N, 3 * nh * _HP)
    return dqkvp, drel_h, drel_w


vit_flash_attention_packed.defvjp(_vit_flash_packed_fwd,
                                  _vit_flash_packed_bwd)


def _vit_flash_fwd(q, k, v, rel_h, rel_w, block_q, block_k):
    out, lse = _vit_flash_impl(q, k, v, rel_h, rel_w, block_q, block_k)
    return out, (q, k, v, rel_h, rel_w, out, lse)


# The fused pallas backward (below) is the default: 14.5 vs 26.9 ms
# standalone fwd+bwd at ViT-B global size, and the full rematerialized
# flagship train step runs 179 ms fused vs 232 ms with the XLA-math
# backward (benchmarks/bench_train_step.py). An earlier-round scheduling
# pathology (283 ms -> 5-23 s with the fused bwd in-graph) no longer
# reproduces after the decoder/upscale rework; set
# ULLSAM_FUSED_FLASH_BWD=0 to fall back to the XLA vjp for debugging.
import os as _os

USE_FUSED_BWD = _os.environ.get("ULLSAM_FUSED_FLASH_BWD", "1") != "0"


def _vit_flash_bwd(block_q, block_k, res, g):
    q, k, v, rel_h, rel_w, out, lse = res
    if USE_FUSED_BWD:
        # the backward keeps more tiles resident (q/k/v/do/out + two f32
        # accumulators); 1024-blocks (the FORWARD's fastest size) push its
        # scoped VMEM past the 16 MB default — ULLSAM_VIT_BWD_BLOCK
        # selects the tile (raised vmem_limit_bytes covers the larger
        # sizes). 1024 is the measured default (round 5): flagship train
        # step 123.8 vs 125.5 ms at 512, back-to-back A/B (first pair
        # 122.8 vs 125.3 in a separate session).
        bb = int(_os.environ.get("ULLSAM_VIT_BWD_BLOCK", "1024"))
        bq, bk = min(block_q, bb), min(block_k, bb)
        return _vit_flash_bwd_impl(q, k, v, rel_h, rel_w, out, lse, g,
                                   bq, bk)
    _, vjp = jax.vjp(_vit_attention_xla, q, k, v, rel_h, rel_w)
    return vjp(g)


vit_flash_attention.defvjp(_vit_flash_fwd, _vit_flash_bwd)


# ---------------------------------------------------------------------------
# LLM: causal + GQA + segment ids
# ---------------------------------------------------------------------------


def _llm_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, block_q: int, block_k: int,
                causal: bool):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TQ, TK]

        q_pos = (iq * block_q
                 + jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 0))
        k_pos = (ik * block_k
                 + jax.lax.broadcasted_iota(jnp.int32,
                                            (block_q, block_k), 1))
        mask = qseg_ref[0][:, None] == kseg_ref[0][None, :]  # [TQ, TK]
        if causal:
            mask = jnp.logical_and(mask, q_pos >= k_pos)
        logits = jnp.where(mask, logits, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        # fully-masked rows: keep p at 0 (m_new = NEG_INF -> exp(0)=1 bug
        # guard): where m_new is NEG_INF the row has no valid key yet.
        p = jnp.where(m_new > NEG_INF / 2, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        alpha = jnp.where(m_prev > NEG_INF / 2, alpha, 0.0)
        l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    if causal:
        # skip k tiles entirely above the diagonal
        pl.when((ik * block_k) <= (iq * block_q + block_q - 1))(_compute)
    else:
        _compute()

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, 0:1]
        o_ref[0, 0] = jnp.where(
            l > 0, acc_scr[:] / jnp.maximum(l, 1e-30), 0.0
        ).astype(o_ref.dtype)
        lse = jnp.where(l > 0, m_scr[:, 0:1] + jnp.log(jnp.maximum(l, 1e-30)),
                        NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _llm_pad(q, k, v, q_seg, kv_seg, block_q: int, block_k: int):
    """Pad S to a tile multiple. Pad positions get segment id -1, NOT 0:
    real id-0 (padding-token) query rows must not attend the zero-padded
    kv tail — with a 0 pad id they would match it and, non-causally, fold
    its exp(0) terms into their softmax denominator."""
    S = q.shape[1]
    Sp = ((S + block_q - 1) // block_q) * block_q
    Sp = ((Sp + block_k - 1) // block_k) * block_k
    if Sp != S:
        pad = Sp - S
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        q_seg = jnp.pad(q_seg, ((0, 0), (0, pad)), constant_values=-1)
        kv_seg = jnp.pad(kv_seg, ((0, 0), (0, pad)), constant_values=-2)
    return q, k, v, q_seg, kv_seg, Sp


def _llm_flash_impl(q, k, v, q_seg, kv_seg, num_kv_heads: int, causal: bool,
                    block_q: int, block_k: int):
    """Forward kernel dispatch; returns (out [B, S, nh, D] unpadded,
    lse [B, nh, Sp, 8] f32 lane-replicated, for the fused backward)."""
    B, S, nh, D = q.shape
    group = nh // num_kv_heads
    q, k, v, q_seg, kv_seg, Sp = _llm_pad(q, k, v, q_seg, kv_seg,
                                          block_q, block_k)

    qt = (q * (D ** -0.5)).astype(q.dtype).transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)                   # [B, n_kv, Sp, D]
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, nh, Sp // block_q, Sp // block_k)

    kernel = functools.partial(_llm_kernel, block_q=block_q,
                               block_k=block_k, causal=causal)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q), lambda b, h, iq, ik: (b, iq)),
            pl.BlockSpec((1, block_k), lambda b, h, iq, ik: (b, ik)),
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, iq, ik: (b, h // group, ik, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, iq, ik: (b, h // group, ik, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nh, Sp, D), q.dtype),
            jax.ShapeDtypeStruct((B, nh, Sp, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )(q_seg.astype(jnp.int32), kv_seg.astype(jnp.int32), qt, kt, vt)

    return out.transpose(0, 2, 1, 3)[:, :S], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _llm_flash(q, k, v, q_seg, kv_seg, num_kv_heads: int, causal: bool,
               block_q: int, block_k: int):
    return _llm_flash_impl(q, k, v, q_seg, kv_seg, num_kv_heads, causal,
                           block_q, block_k)[0]


def _llm_flash_fwd(q, k, v, q_seg, kv_seg, num_kv_heads, causal,
                   block_q, block_k):
    out, lse = _llm_flash_impl(q, k, v, q_seg, kv_seg, num_kv_heads, causal,
                               block_q, block_k)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _llm_flash_bwd(num_kv_heads, causal, block_q, block_k, res, g):
    q, k, v, q_seg, kv_seg, out, lse = res
    if USE_FUSED_BWD:
        dq, dk, dv = _llm_flash_bwd_impl(
            q, k, v, q_seg, kv_seg, out, lse, g, num_kv_heads, causal,
            block_q, block_k)
    else:
        _, vjp = jax.vjp(
            lambda a, b, c: reference_attention(a, b, c, q_seg, kv_seg,
                                                num_kv_heads, causal),
            q, k, v)
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_llm_flash.defvjp(_llm_flash_fwd, _llm_flash_bwd)


@functools.partial(jax.jit,
                   static_argnames=("causal", "block_q", "block_k",
                                    "num_kv_heads"))
def llm_flash_attention(q: Array, k: Array, v: Array,
                        q_segment_ids: Array, kv_segment_ids: Array,
                        num_kv_heads: int, causal: bool = True,
                        block_q: int = 256, block_k: int = 256) -> Array:
    """Causal GQA flash attention with segment-id masking.

    q: [B, S, nh, D]; k, v: [B, S, n_kv, D]; segment ids [B, S] int32
    (0 = padding; tokens attend only within equal nonzero segments).
    Returns [B, S, nh, D]. Scale is applied internally. Differentiable:
    the fused flash backward (below) runs by default, the XLA-math vjp
    with ULLSAM_FUSED_FLASH_BWD=0.
    """
    assert k.shape[2] == num_kv_heads
    return _llm_flash(q, k, v, q_segment_ids.astype(jnp.int32),
                      kv_segment_ids.astype(jnp.int32), num_kv_heads,
                      causal, block_q, block_k)


def reference_attention(q, k, v, q_seg, kv_seg, num_kv_heads, causal=True):
    """XLA reference for kernel tests: same signature/semantics."""
    B, S, nh, D = q.shape
    group = nh // num_kv_heads
    k = jnp.repeat(k, group, axis=2)
    v = jnp.repeat(v, group, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    mask = (q_seg[:, None, :, None] == kv_seg[:, None, None, :])
    if causal:
        ii = jnp.arange(S)
        mask = jnp.logical_and(mask, ii[:, None] >= ii[None, :])
    logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# LLM flash backward kernels (causal + GQA + segment ids)
# ---------------------------------------------------------------------------


def _llm_bwd_p(qseg_ref, kseg_ref, q, kk, lse, *, iq, ik, block_q: int,
               block_k: int, causal: bool, scale: float):
    """Recompute the probability tile p = exp(logits + mask - lse)."""
    logits = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    mask = qseg_ref[0][:, None] == kseg_ref[0][None, :]   # [TQ, TK]
    if causal:
        q_pos = iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = jnp.logical_and(mask, q_pos >= k_pos)
    # fully-masked rows have lse = NEG_INF; exp(NEG_INF - NEG_INF) would
    # be exp(0) = 1 — mask them to 0 explicitly
    ok = jnp.logical_and(mask, lse > NEG_INF / 2)
    return jnp.where(ok, jnp.exp(logits - lse), 0.0)


def _llm_bwd_dq_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref,
                       lse_ref, dd_ref, dq_ref, dq_scr,
                       *, block_q: int, block_k: int, causal: bool,
                       scale: float):
    """dq, q-tile major (k tiles innermost). Grid (B, nh, nq, nk)."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def _compute():
        q = q_ref[0, 0]                   # [TQ, D] UNscaled
        kk = k_ref[0, 0]                  # [TK, D]
        p = _llm_bwd_p(qseg_ref, kseg_ref, q, kk, lse_ref[0, 0][:, 0:1],
                       iq=iq, ik=ik, block_q=block_q, block_k=block_k,
                       causal=causal, scale=scale)
        # grad matmul precision follows the input dtype (see ViT bwd)
        cdt = q_ref.dtype
        do = do_ref[0, 0].astype(cdt)
        dov = jax.lax.dot_general(do, v_ref[0, 0].astype(cdt),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dov - dd_ref[0, 0][:, 0:1])
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(cdt), kk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        pl.when((ik * block_k) <= (iq * block_q + block_q - 1))(_compute)
    else:
        _compute()

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _llm_bwd_dkv_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref,
                        lse_ref, dd_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                        *, block_q: int, block_k: int, causal: bool,
                        scale: float, n_q_tiles: int):
    """dk and dv, k-tile major. Grid (B, n_kv, nk, group * nq): the
    innermost axis enumerates (head-in-group, q tile) so each kv head's
    accumulator sums over all of its query heads."""
    ik = pl.program_id(2)
    t = pl.program_id(3)
    nt = pl.num_programs(3)
    iq = t % n_q_tiles

    @pl.when(t == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def _compute():
        q = q_ref[0, 0]
        kk = k_ref[0, 0]
        p = _llm_bwd_p(qseg_ref, kseg_ref, q, kk, lse_ref[0, 0][:, 0:1],
                       iq=iq, ik=ik, block_q=block_q, block_k=block_k,
                       causal=causal, scale=scale)
        cdt = q_ref.dtype
        do = do_ref[0, 0].astype(cdt)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(cdt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dov = jax.lax.dot_general(do, v_ref[0, 0].astype(cdt),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dov - dd_ref[0, 0][:, 0:1])
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(cdt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        pl.when((ik * block_k) <= (iq * block_q + block_q - 1))(_compute)
    else:
        _compute()

    @pl.when(t == nt - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _llm_flash_bwd_impl(q, k, v, q_seg, kv_seg, out, lse, g,
                        num_kv_heads: int, causal: bool,
                        block_q: int, block_k: int):
    """Fused flash backward: O(S) memory, probs recomputed per tile."""
    B, S, nh, D = q.shape
    group = nh // num_kv_heads
    scale = D ** -0.5
    # dd[b, h, i] = sum_d dout * out (the softmax-jacobian row term)
    dd = jnp.einsum("bshd,bshd->bhs", g.astype(jnp.float32),
                    out.astype(jnp.float32))
    g = g.astype(q.dtype)
    qp, kp, vp, q_seg, kv_seg, Sp = _llm_pad(q, k, v, q_seg, kv_seg,
                                             block_q, block_k)
    gp = jnp.pad(g, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
    dd = jnp.pad(dd, ((0, 0), (0, 0), (0, Sp - S)))
    dd = jnp.broadcast_to(dd[..., None], dd.shape + (8,))  # lane-replicated

    qt = qp.transpose(0, 2, 1, 3)                  # [B, nh, Sp, D]
    kt = kp.transpose(0, 2, 1, 3)                  # [B, n_kv, Sp, D]
    vt = vp.transpose(0, 2, 1, 3)
    gt = gp.transpose(0, 2, 1, 3)
    nq, nk = Sp // block_q, Sp // block_k

    kern_q = functools.partial(_llm_bwd_dq_kernel, block_q=block_q,
                               block_k=block_k, causal=causal, scale=scale)
    dq = pl.pallas_call(
        kern_q,
        grid=(B, nh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q), lambda b, h, iq, ik: (b, iq)),
            pl.BlockSpec((1, block_k), lambda b, h, iq, ik: (b, ik)),
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, iq, ik: (b, h // group, ik, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, iq, ik: (b, h // group, ik, 0)),
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nh, Sp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )(q_seg, kv_seg, qt, kt, vt, gt, lse, dd)

    kern_kv = functools.partial(_llm_bwd_dkv_kernel, block_q=block_q,
                                block_k=block_k, causal=causal,
                                scale=scale, n_q_tiles=nq)
    dk, dv = pl.pallas_call(
        kern_kv,
        grid=(B, num_kv_heads, nk, group * nq),
        in_specs=[
            pl.BlockSpec((1, block_q), lambda b, h, ik, t: (b, t % nq)),
            pl.BlockSpec((1, block_k), lambda b, h, ik, t: (b, ik)),
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, ik, t: (b, h * group + t // nq,
                                              t % nq, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ik, t: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ik, t: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, ik, t: (b, h * group + t // nq,
                                              t % nq, 0)),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, ik, t: (b, h * group + t // nq,
                                              t % nq, 0)),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, ik, t: (b, h * group + t // nq,
                                              t % nq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ik, t: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ik, t: (b, h, ik, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, num_kv_heads, Sp, D), k.dtype),
            jax.ShapeDtypeStruct((B, num_kv_heads, Sp, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )(q_seg, kv_seg, qt, kt, vt, gt, lse, dd)

    dq = dq.transpose(0, 2, 1, 3)[:, :S]
    dk = dk.transpose(0, 2, 1, 3)[:, :S]
    dv = dv.transpose(0, 2, 1, 3)[:, :S]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# ViT flash backward kernels
# ---------------------------------------------------------------------------


def _vit_bwd_dq_kernel(q_ref, k_ref, v_ref, rhw_ref, do_ref, lse_ref,
                       dd_ref, dq_ref, drhw_ref, dq_scr, drhw_scr,
                       *, kh: int, kw: int, block_k: int, scale: float):
    """dq and d(rel_h|rel_w), q-tile major (k tiles innermost)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        drhw_scr[:] = jnp.zeros_like(drhw_scr)

    q = q_ref[0]                      # [TQ, D] UNscaled
    kk = k_ref[0]                     # [TK, D]
    logits = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    rows_per_tile = block_k // kw
    rhw = rhw_ref[0]                  # [TQ, KH+KW]
    rsel = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 1)
    sel_bool = ((rsel == (ik * rows_per_tile + kj // kw))
                | (rsel == (kh + kj % kw)))
    bias = _bias_select(rhw, sel_bool, q_ref.dtype)  # matches the fwd tile
    p = jnp.exp(logits + bias - lse_ref[0][:, 0:1])           # [TQ, TK]

    # matmul precision follows the input dtype: bf16 training inputs run
    # the three grad matmuls at bf16 MXU rate (f32 accumulate), f32
    # inputs keep the exact-parity path (tests assert atol=1e-5 at f32)
    cdt = q_ref.dtype
    sel = sel_bool.astype(cdt)
    do = do_ref[0].astype(cdt)                                # [TQ, D]
    dov = jax.lax.dot_general(do, v_ref[0].astype(cdt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dov - dd_ref[0][:, 0:1])                        # [TQ, TK]
    ds_c = ds.astype(cdt)

    dq_scr[:] += jax.lax.dot_general(
        ds_c, kk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    drhw_scr[:] += jax.lax.dot_general(ds_c, sel,
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)
        drhw_ref[0] = drhw_scr[:]


def _vit_bwd_dkv_kernel(q_ref, k_ref, v_ref, rhw_ref, do_ref, lse_ref,
                        dd_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                        *, kh: int, kw: int, block_k: int, scale: float):
    """dk and dv, k-tile major (q tiles innermost)."""
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    kk = k_ref[0]
    logits = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    rows_per_tile = block_k // kw
    rhw = rhw_ref[0]
    rsel = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 1)
    sel_bool = ((rsel == (ik * rows_per_tile + kj // kw))
                | (rsel == (kh + kj % kw)))
    bias = _bias_select(rhw, sel_bool, q_ref.dtype)  # matches the fwd tile
    p = jnp.exp(logits + bias - lse_ref[0][:, 0:1])           # [TQ, TK]

    # see _vit_bwd_dq_kernel: matmul precision follows the input dtype
    cdt = q_ref.dtype
    do = do_ref[0].astype(cdt)
    dv_scr[:] += jax.lax.dot_general(p.astype(cdt), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dov = jax.lax.dot_general(do, v_ref[0].astype(cdt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dov - dd_ref[0][:, 0:1])
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(cdt), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _vit_flash_bwd_impl(q, k, v, rel_h, rel_w, out, lse, g,
                        block_q: int, block_k: int, scale=None):
    """Fused flash backward: O(N) memory, no materialized bias.

    scale defaults to D**-0.5; the packed-global path passes hd**-0.5
    explicitly because its lane dim D=128 exceeds the real head dim."""
    B, N, D = q.shape
    KH = rel_h.shape[-1]
    KW = rel_w.shape[-1]
    if scale is None:
        scale = D ** -0.5
    # blocks > 512 need more than the 16 MB default scoped VMEM
    _cp = (dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))
        if max(block_q, block_k) > 512 else {})
    rel_hw = jnp.concatenate([rel_h, rel_w], axis=-1).astype(jnp.float32)
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1)
    dd = jnp.broadcast_to(dd[..., None], dd.shape + (8,))  # lane-replicated

    kern_q = functools.partial(_vit_bwd_dq_kernel, kh=KH, kw=KW,
                               block_k=block_k, scale=scale)
    dq, drhw = pl.pallas_call(
        kern_q,
        grid=(B, N // block_q, N // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, KH + KW),
                         lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, KH + KW),
                         lambda b, iq, ik: (b, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, N, KH + KW), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, KH + KW), jnp.float32),
        ],
        **_cp,
    )(q, k, v, rel_hw, g, lse, dd)

    kern_kv = functools.partial(_vit_bwd_dkv_kernel, kh=KH, kw=KW,
                                block_k=block_k, scale=scale)
    dk, dv = pl.pallas_call(
        kern_kv,
        grid=(B, N // block_k, N // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, KH + KW),
                         lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, ik, iq: (b, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, D), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ik, iq: (b, ik, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, N, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        **_cp,
    )(q, k, v, rel_hw, g, lse, dd)

    drel_h = drhw[..., :KH].astype(rel_h.dtype)
    drel_w = drhw[..., KH:].astype(rel_w.dtype)
    return dq, dk, dv, drel_h, drel_w


# ---------------------------------------------------------------------------
# ViT WINDOWED attention (packed head-major layout, rel-pos built in-kernel)
# ---------------------------------------------------------------------------
#
# The 28 windowed ViT-H layers ran attention in XLA: the f32 [B*nh, N, N]
# logits/bias chain plus the [B, N, 3, nh, hd] head-split materialized ~1 ms
# of relayout copies per layer (~25 ms of the 108 ms encode). Here the qkv
# projection is emitted in a PACKED head-major layout — each head's hd
# channels padded to 128 lanes, so per-head q/k/v are 128-aligned lane
# slices and no head-split transpose ever exists in HBM — and one grid
# program computes a whole window: per head, the decomposed rel-pos bias is
# rebuilt from the (shared) gathered tables with two masked matmuls, and a
# direct single-tile softmax finishes the window.

_HP = 128  # padded per-head width (hd <= 128)


def _window_selectors(kh: int, kw: int):
    """Boolean masks/selectors for the in-kernel decomposed rel-pos fold.

    gh[q, c] = q . Rh[c // kw, c % kw] over the gathered table; the bias
    contribution is bias_h[q, m] = gh[q, (q//kw)*kw + m//kw]. That is ONE
    selection matmul: zero gh outside the q-row block (MH), then dot with
    the constant TH[c, m] = (c % kw == m // kw) — exactly one masked term
    survives per (q, m), so the dot is a pure copy (round-5 rework: the
    old fold-then-expand pair per axis was two dots with 9x lane padding,
    [N,N]@[N,kw] and [N,kh]@[kh,N]; the kernel was MXU-issue-bound at
    ~7% utilization, 0.96 ms/layer of the 64 ms ViT-H encode)."""
    n = kh * kw
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    qi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    MH = ci // kw == qi // kw
    MW = ci // kw == qi % kw
    # selector operands are transposed relative to the masks: rows = c
    TH = qi % kw == ci // kw          # TH[c, m] = (c % kw == m // kw)
    TW = qi % kw == ci % kw           # TW[c, m] = (c % kw == m % kw)
    return MH, MW, TH, TW


def _vit_window_kernel(qkvp_ref, rhf_ref, rwf_ref, o_ref,
                       *, kh: int, kw: int, nh: int, scale: float):
    n = kh * kw
    f32 = jnp.float32
    MH, MW, TH, TW = _window_selectors(kh, kw)
    HP = _HP
    qkvp = qkvp_ref[0]                          # [N, 3*nh*HP]
    cdt = qkvp.dtype
    for h in range(nh):
        q = qkvp[:, h * HP:(h + 1) * HP]        # [N, HP] (pad cols zero)
        k = qkvp[:, (nh + h) * HP:(nh + h + 1) * HP]
        v = qkvp[:, (2 * nh + h) * HP:(2 * nh + h + 1) * HP]
        # decomposed rel-pos: one masked selection dot per axis
        # (_bias_select: bf16 single pass / f32 exact hi+lo)
        gh = jax.lax.dot_general(q, rhf_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        gw = jax.lax.dot_general(q, rwf_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        bias = (_bias_select(jnp.where(MH, gh, 0.0), TH, cdt)
                + _bias_select(jnp.where(MW, gw, 0.0), TW, cdt))
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) * scale + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, h * HP:(h + 1) * HP] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(o_ref.dtype)


def _vit_window_kernel_twophase(qkvp_ref, rhf_ref, rwf_ref, o_ref, l_scr,
                                *, kh: int, kw: int, nh: int,
                                scale: float):
    """Two-phase variant (ULLSAM_WINDOW_TWOPHASE=1): all heads'
    logits+bias land in a VMEM scratch first (back-to-back MXU work with
    no softmax in between), then a second pass does softmax+pv.

    MEASURED DEAD END (round 5, stays opt-in): 0.80 vs 0.70-0.74
    ms/layer for the baseline at ViT-H window shapes — the scratch
    round-trip costs more than any scheduling gain, i.e. Mosaic already
    overlaps MXU/VPU across the unrolled head loop and the baseline
    kernel is NOT bound by the per-head dependency chain (the same
    conclusion as the selector-fusion A/B: encode-neutral)."""
    n = kh * kw
    f32 = jnp.float32
    MH, MW, TH, TW = _window_selectors(kh, kw)
    HP = _HP
    qkvp = qkvp_ref[0]
    cdt = qkvp.dtype
    for h in range(nh):
        q = qkvp[:, h * HP:(h + 1) * HP]
        k = qkvp[:, (nh + h) * HP:(nh + h + 1) * HP]
        gh = jax.lax.dot_general(q, rhf_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        gw = jax.lax.dot_general(q, rwf_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        bias = (_bias_select(jnp.where(MH, gh, 0.0), TH, cdt)
                + _bias_select(jnp.where(MW, gw, 0.0), TW, cdt))
        l_scr[h * n:(h + 1) * n, :] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) * scale + bias
    for h in range(nh):
        v = qkvp[:, (2 * nh + h) * HP:(2 * nh + h + 1) * HP]
        logits = l_scr[h * n:(h + 1) * n, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        o_ref[0, :, h * HP:(h + 1) * HP] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(o_ref.dtype)


def _window_packed_xla(qkvp, rhf, rwf, nh, hd, kh, kw):
    """Reference math on the packed layout (backward pass + tests).

    NB: the dense per-token one-hot formulation below MEASURES faster
    under grad than the "obviously cheaper" compact decomposed einsum
    (q5 [B,kh,kw,nh,HP] x Rh [kh,kh,HP] batched matmuls): the compact
    form cost +20 ms on the flagship train step (163.5 vs 142.2 ms,
    round-3 A/B) despite a ~50 ms estimated-cycles tally against this
    form — XLA's fusion of the selector einsums beats the small batched
    matmuls' layout churn. Do not "optimize" this without measuring."""
    B, N, _ = qkvp.shape
    HP = _HP
    qkv = qkvp.reshape(B, N, 3, nh, HP)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    g_h = jnp.einsum("bnhd,dm->bnhm", q, rhf.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    g_w = jnp.einsum("bnhd,dm->bnhm", q, rwf.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    import numpy as _np
    rows = _np.arange(N) // kw
    cols = _np.arange(N) % kw
    oh = _np.zeros((N, kh, kh * kw), _np.float32)
    ow = _np.zeros((N, kw, kw * kw), _np.float32)
    oh[_np.arange(N)[:, None], _np.arange(kh)[None, :],
       rows[:, None] * kw + _np.arange(kh)[None, :]] = 1.0
    ow[_np.arange(N)[:, None], _np.arange(kw)[None, :],
       cols[:, None] * kw + _np.arange(kw)[None, :]] = 1.0
    rel_h = jnp.einsum("bnhm,nim->bnhi", g_h, jnp.asarray(oh))
    rel_w = jnp.einsum("bnhm,njm->bnhj", g_w, jnp.asarray(ow))
    bias = rel_h[..., :, None] + rel_w[..., None, :]   # [B, N, nh, kh, kw]
    bias = bias.reshape(B, N, nh, N).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd ** -0.5) + bias, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, N, nh * HP).astype(qkvp.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def vit_window_attention_packed(qkvp: Array, rhf: Array, rwf: Array,
                                nh: int, hd: int, kh: int, kw: int) -> Array:
    """Whole-window attention over the packed head-major qkv.

    qkvp: [B_windows, N, 3*nh*128] — q|k|v sections, each head's hd
    channels left-aligned in a 128-lane slot (pad lanes zero).
    rhf/rwf: [128, kh*kh] / [128, kw*kw] gathered rel-pos tables,
    rhf[d, r*kw + i] = Rh[r, i, d] (pad rows zero).
    Returns [B, N, nh*128] head-major padded outputs (pad lanes zero).
    Backward is the exact XLA-math vjp (windowed layers run under remat).
    """
    B, N, _ = qkvp.shape
    # The in-kernel rel-pos fold (T/MH/MW masks built with % kw and // kw
    # over a kh*kh table) is only correct for square windows; fail loudly
    # rather than silently corrupting the bias (ADVICE r2).
    assert kh == kw, f"packed window kernel requires square windows, got {kh}x{kw}"
    if _os.environ.get("ULLSAM_WINDOW_TWOPHASE", "0") == "1":
        kernel = functools.partial(_vit_window_kernel_twophase, kh=kh,
                                   kw=kw, nh=nh, scale=hd ** -0.5)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, 3 * nh * _HP), lambda w: (w, 0, 0)),
                pl.BlockSpec((_HP, kh * kh), lambda w: (0, 0)),
                pl.BlockSpec((_HP, kw * kw), lambda w: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N, nh * _HP), lambda w: (w, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, nh * _HP), qkvp.dtype),
            scratch_shapes=[pltpu.VMEM((nh * N, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkvp, rhf.astype(qkvp.dtype), rwf.astype(qkvp.dtype))
    kernel = functools.partial(_vit_window_kernel, kh=kh, kw=kw, nh=nh,
                               scale=hd ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3 * nh * _HP), lambda w: (w, 0, 0)),
            pl.BlockSpec((_HP, kh * kh), lambda w: (0, 0)),
            pl.BlockSpec((_HP, kw * kw), lambda w: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, nh * _HP), lambda w: (w, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, nh * _HP), qkvp.dtype),
    )(qkvp, rhf.astype(qkvp.dtype), rwf.astype(qkvp.dtype))


def _vit_window_bwd_kernel(qkvp_ref, rhf_ref, rwf_ref, g_ref,
                           dqkvp_ref, drhf_ref, drwf_ref,
                           *, kh: int, kw: int, nh: int, scale: float):
    """Whole-window attention backward: one grid program per window.

    Recomputes the forward softmax (cheaper than stashing [N, N] probs
    per window per head), then runs the five grad matmuls per head on
    the same packed lane-aligned layout as the forward. The rel-pos
    table grads accumulate across the sequential window grid directly in
    the resident output block (constant index map)."""
    b = pl.program_id(0)
    n = kh * kw
    f32 = jnp.float32
    # selection masks/selectors identical to the forward kernel's
    MH, MW, TH, TW = _window_selectors(kh, kw)

    @pl.when(b == 0)
    def _init():
        drhf_ref[:] = jnp.zeros_like(drhf_ref)
        drwf_ref[:] = jnp.zeros_like(drwf_ref)

    HP = _HP
    qkvp = qkvp_ref[0]                          # [N, 3*nh*HP]
    g = g_ref[0]                                # [N, nh*HP]
    cdt = qkvp.dtype

    def dot(a, bb, dims):
        return jax.lax.dot_general(a, bb, (dims, ((), ())),
                                   preferred_element_type=f32)

    for h in range(nh):
        q = qkvp[:, h * HP:(h + 1) * HP]
        k = qkvp[:, (nh + h) * HP:(nh + h + 1) * HP]
        v = qkvp[:, (2 * nh + h) * HP:(2 * nh + h + 1) * HP]
        # -- forward recompute (mirrors _vit_window_kernel) --
        gh = dot(q, rhf_ref[:], ((1,), (0,)))
        gw = dot(q, rwf_ref[:], ((1,), (0,)))
        bias = (_bias_select(jnp.where(MH, gh, 0.0), TH, cdt)
                + _bias_select(jnp.where(MW, gw, 0.0), TW, cdt))
        logits = dot(q, k, ((1,), (1,))) * scale + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)              # [N, N] f32
        # -- grads --
        do = g[:, h * HP:(h + 1) * HP].astype(cdt)              # [N, HP]
        p_c = p.astype(cdt)
        dv = dot(p_c, do, ((0,), (0,)))                         # [N, HP]
        dp = dot(do, v, ((1,), (1,)))                           # [N, N]
        dd = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - dd)
        ds_c = ds.astype(cdt)
        # bias path: bias_h = where(MH, gh, 0) @ TH, so
        # d(gh) = where(MH, ds @ TH^T, 0) — one dot per axis
        dgh = jnp.where(MH, dot(ds_c, TH.astype(cdt), ((1,), (1,))),
                        0.0)                                    # [N, N]
        dgw = jnp.where(MW, dot(ds_c, TW.astype(cdt), ((1,), (1,))),
                        0.0)
        dgh_c = dgh.astype(cdt)
        dgw_c = dgw.astype(cdt)
        dq = (dot(ds_c, k, ((1,), (0,))) * scale
              + dot(dgh_c, rhf_ref[:], ((1,), (1,)))
              + dot(dgw_c, rwf_ref[:], ((1,), (1,))))
        dk = dot(ds_c, q, ((0,), (0,))) * scale
        dqkvp_ref[0, :, h * HP:(h + 1) * HP] = dq.astype(dqkvp_ref.dtype)
        dqkvp_ref[0, :, (nh + h) * HP:(nh + h + 1) * HP] = \
            dk.astype(dqkvp_ref.dtype)
        dqkvp_ref[0, :, (2 * nh + h) * HP:(2 * nh + h + 1) * HP] = \
            dv.astype(dqkvp_ref.dtype)
        drhf_ref[:] += dot(q, dgh_c, ((0,), (0,)))              # [HP, N]
        drwf_ref[:] += dot(q, dgw_c, ((0,), (0,)))


def _vit_window_packed_bwd_impl(qkvp, rhf, rwf, g, nh, hd, kh, kw,
                                interpret: bool = False):
    B, N, _ = qkvp.shape
    kernel = functools.partial(_vit_window_bwd_kernel, kh=kh, kw=kw,
                               nh=nh, scale=hd ** -0.5)
    dqkvp, drhf, drwf = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3 * nh * _HP), lambda w: (w, 0, 0)),
            pl.BlockSpec((_HP, kh * kh), lambda w: (0, 0)),
            pl.BlockSpec((_HP, kw * kw), lambda w: (0, 0)),
            pl.BlockSpec((1, N, nh * _HP), lambda w: (w, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, N, 3 * nh * _HP), lambda w: (w, 0, 0)),
            pl.BlockSpec((_HP, kh * kh), lambda w: (0, 0)),
            pl.BlockSpec((_HP, kw * kw), lambda w: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(qkvp.shape, qkvp.dtype),
            jax.ShapeDtypeStruct((_HP, kh * kh), jnp.float32),
            jax.ShapeDtypeStruct((_HP, kw * kw), jnp.float32),
        ),
        interpret=interpret,
    )(qkvp, rhf.astype(qkvp.dtype), rwf.astype(qkvp.dtype), g)
    return dqkvp, drhf.astype(rhf.dtype), drwf.astype(rwf.dtype)


# Pallas window backward default ON (A/B measured in docs/BENCHMARKS.md);
# ULLSAM_FUSED_WINDOW_BWD=0 falls back to the XLA-math vjp.


def _vit_window_packed_fwd(qkvp, rhf, rwf, nh, hd, kh, kw):
    return (vit_window_attention_packed(qkvp, rhf, rwf, nh, hd, kh, kw),
            (qkvp, rhf, rwf))


def _vit_window_packed_bwd(nh, hd, kh, kw, res, g):
    qkvp, rhf, rwf = res
    if _os.environ.get("ULLSAM_FUSED_WINDOW_BWD", "1") != "0":
        return _vit_window_packed_bwd_impl(qkvp, rhf, rwf, g,
                                           nh, hd, kh, kw)
    _, vjp = jax.vjp(
        lambda a, b, c: _window_packed_xla(a, b, c, nh, hd, kh, kw),
        qkvp, rhf, rwf)
    return vjp(g)


vit_window_attention_packed.defvjp(_vit_window_packed_fwd,
                                   _vit_window_packed_bwd)
