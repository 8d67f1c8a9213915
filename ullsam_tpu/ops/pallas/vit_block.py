"""Fused ViT block kernels for the SAM image encoder.

The encoder's per-block XLA chain (reference behavior:
/root/reference/modeling/image_encoder.py:119-182) leaves ~40% of its time
in unfused LayerNorms and layout copies on v5e: profile_encode.py measured
0.32 ms per LayerNorm call (10x its HBM roofline) and a windowed block at
2.1 ms against a ~1.2 ms compute bound. These kernels fuse the two halves
of the block:

  * fused_ln_mlp: residual + LN + fc1 + GELU + fc2 + residual, row-chunked,
    weights VMEM-resident. Used by EVERY block (windowed and global).
  * fused_window_attn: LN + packed qkv projection + whole-window attention
    with decomposed rel-pos bias + output projection + residual, one grid
    program per window group. Replaces the XLA LN/qkv/proj around the
    packed window kernel (flash_attention._vit_window_kernel math).

Backward passes re-run the exact XLA math via jax.vjp (the training path
typically runs under remat which already disables the window kernels; the
custom vjp keeps non-remat training correct too).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_HP = 128  # padded per-head lane width (must match flash_attention._HP)
NEG_INF = -1e30


def _gelu_tanh(x: Array) -> Array:
    """tanh-form GELU in f32 (Mosaic has no erf; matches ops.layers.gelu
    on bfloat16 inputs)."""
    f = x.astype(jnp.float32)
    inner = 0.7978845608028654 * (f + 0.044715 * (f * f * f))
    return (0.5 * f * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def _ln_rows(x32, scale_ref, bias_ref, eps: float):
    """LayerNorm rows in f32 (ops.layers.layer_norm one-pass semantics)."""
    m1 = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    y = (x32 - m1) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[:] + bias_ref[:]


# ---------------------------------------------------------------------------
# fused LN + MLP + residual
# ---------------------------------------------------------------------------


def _ln_mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps: float):
    f32 = jnp.float32
    x = x_ref[:]
    y = _ln_rows(x.astype(f32), lns_ref, lnb_ref, eps).astype(x.dtype)
    h = jax.lax.dot_general(y, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + b1_ref[:]
    h = _gelu_tanh(h.astype(x.dtype))
    o = jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + b2_ref[:]
    o_ref[:] = (x.astype(f32) + o).astype(o_ref.dtype)


def _ln_mlp_xla(x2d, lns, lnb, w1, b1, w2, b2, eps):
    """Exact XLA math of the fused chain (backward + parity tests);
    mirrors L.layer_norm + L.mlp_block on bf16 inputs."""
    f32 = jnp.float32
    x32 = x2d.astype(f32)
    m1 = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    y = ((x32 - m1) * jax.lax.rsqrt(var + eps) * lns.astype(f32)
         + lnb.astype(f32)).astype(x2d.dtype)
    h = jnp.dot(y, w1.astype(x2d.dtype),
                preferred_element_type=f32) + b1.astype(f32)
    h = jax.nn.gelu(h.astype(x2d.dtype), approximate=True)
    o = jnp.dot(h, w2.astype(x2d.dtype),
                preferred_element_type=f32) + b2.astype(f32)
    return (x32 + o).astype(x2d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ln_mlp_call(x2d, lns, lnb, w1, b1, w2, b2, eps, block_rows):
    T, C = x2d.shape
    F = w1.shape[1]
    kernel = functools.partial(_ln_mlp_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(T // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda r: (r, 0)),
            pl.BlockSpec((1, C), lambda r: (0, 0)),
            pl.BlockSpec((1, C), lambda r: (0, 0)),
            pl.BlockSpec((C, F), lambda r: (0, 0)),
            pl.BlockSpec((1, F), lambda r: (0, 0)),
            pl.BlockSpec((F, C), lambda r: (0, 0)),
            pl.BlockSpec((1, C), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((T, C), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(x2d, lns, lnb, w1, b1, w2, b2)


def _ln_mlp_fwd(x2d, lns, lnb, w1, b1, w2, b2, eps, block_rows):
    return (_ln_mlp_call(x2d, lns, lnb, w1, b1, w2, b2, eps, block_rows),
            (x2d, lns, lnb, w1, b1, w2, b2))


def _ln_mlp_bwd(eps, block_rows, res, g):
    x2d, lns, lnb, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x, a, b, c, d, e, f: _ln_mlp_xla(x, a, b, c, d, e, f, eps),
        x2d, lns, lnb, w1, b1, w2, b2)
    return vjp(g)


_ln_mlp_call.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)


def ln_mlp_supported(T: int, C: int, F: int) -> bool:
    # default OFF: the on-chip A/B (benchmarks/ab_encode_fused.py, v5e,
    # ViT-H interleaved 4 rounds) measured the fused LN+MLP chain SLOWER
    # than XLA's own fusion — 67.3 ms/encode mlp_only vs 65.6 neither —
    # XLA already fuses the LN into the fc1 epilogue and overlaps better.
    # ULLSAM_FUSED_VIT_MLP=1 re-enables for experiments; parity stays
    # covered by tests/test_kernels.py.
    from ullsam_tpu.ops.pallas import backend_ok
    if os.environ.get("ULLSAM_FUSED_VIT_MLP", "0") == "0":
        return False
    return backend_ok() and C % 128 == 0 and F % 128 == 0 and T >= 256


def fused_ln_mlp(x: Array, ln: dict, mlp: dict, *, eps: float,
                 block_rows: int = 512) -> Array:
    """x + fc2(gelu(fc1(LN(x)))) with everything fused per row-chunk.

    x: [..., C] (any leading shape); LN/MLP params as ops.layers pytrees
    (common.py:13-26 MLPBlock + pre-norm, image_encoder.py:119-182).
    Rows are independent, so leading dims are flattened and padded to a
    block multiple (pad rows compute garbage that never leaves the pad).
    """
    lead = x.shape[:-1]
    C = x.shape[-1]
    x2d = x.reshape(-1, C)
    T = x2d.shape[0]
    Tp = -(-T // block_rows) * block_rows
    if Tp != T:
        x2d = jnp.pad(x2d, ((0, Tp - T), (0, 0)))
    dt = x.dtype
    out = _ln_mlp_call(
        x2d,
        ln["scale"].astype(jnp.float32)[None],
        ln["bias"].astype(jnp.float32)[None],
        mlp["fc1"]["kernel"].astype(dt),
        mlp["fc1"].get("bias", jnp.zeros((mlp["fc1"]["kernel"].shape[1],))
                       ).astype(jnp.float32)[None],
        mlp["fc2"]["kernel"].astype(dt),
        mlp["fc2"].get("bias", jnp.zeros((C,))).astype(jnp.float32)[None],
        eps, block_rows)
    return out[:T].reshape(*lead, C)


# ---------------------------------------------------------------------------
# fused LN + qkv + whole-window attention + proj + residual
# ---------------------------------------------------------------------------


def pack_window_attn_weights(blk: dict, nh: int, hd: int, dtype):
    """(qkvw [C, 3*nh*HP] bf16, bqkv [1, 3*nh*HP] f32, wo [nh*HP, C] bf16,
    bo [1, C] f32) — per-head hd channels left-aligned in 128-lane slots
    so per-head q/k/v are aligned lane slices in-kernel."""
    attn = blk["attn"]
    C = attn["qkv"]["kernel"].shape[0]
    wq = attn["qkv"]["kernel"].astype(dtype)
    qkvw = jnp.pad(wq.reshape(C, 3, nh, hd),
                   ((0, 0), (0, 0), (0, 0), (0, _HP - hd)))
    qkvw = qkvw.reshape(C, 3 * nh * _HP)
    if "bias" in attn["qkv"]:
        bb = attn["qkv"]["bias"].astype(jnp.float32)
        bqkv = jnp.pad(bb.reshape(3, nh, hd),
                       ((0, 0), (0, 0), (0, _HP - hd))).reshape(1, -1)
    else:
        bqkv = jnp.zeros((1, 3 * nh * _HP), jnp.float32)
    wo = attn["proj"]["kernel"].astype(dtype)
    wo = jnp.pad(wo.reshape(nh, hd, C),
                 ((0, 0), (0, _HP - hd), (0, 0))).reshape(nh * _HP, C)
    bo = (attn["proj"]["bias"].astype(jnp.float32)[None]
          if "bias" in attn["proj"] else jnp.zeros((1, C), jnp.float32))
    return qkvw, bqkv, wo, bo


def _window_attn_kernel(x_ref, lns_ref, lnb_ref, qkvw_ref, bqkv_ref,
                        wo_ref, bo_ref, rhf_ref, rwf_ref, o_ref, *,
                        P: int, n: int, nh: int, scale: float, kh: int,
                        kw: int, eps: float, nwx: int, nwy: int, Hv: int,
                        Wv: int, masked: bool):
    """One grid program = P whole windows (rows r = p*n + t).

    LN1 -> (optional zero of pad tokens, matching the reference's
    pad-then-window order, image_encoder.py:166-182) -> packed qkv
    -> per-head attention with the decomposed rel-pos bias rebuilt from
    the gathered tables -> output projection -> residual."""
    f32 = jnp.float32
    Pn = P * n
    x = x_ref[0]                                 # [Pn, C] bf16
    y32 = _ln_rows(x.astype(f32), lns_ref, lnb_ref, eps)

    if masked:
        # zero pad-tokens of edge windows before attention: window
        # w = g*P + p at grid row w // nwx, col w % nwx
        g = pl.program_id(0)
        r = jax.lax.broadcasted_iota(jnp.int32, (Pn, 1), 0)
        w = (g * P + r // n) % (nwy * nwx)  # window index within its image
        t = r % n
        row_img = (w // nwx) * kh + t // kw
        col_img = (w % nwx) * kw + t % kw
        valid = ((row_img < Hv) & (col_img < Wv)).astype(f32)
        y32 = y32 * valid

    y = y32.astype(x.dtype)
    qkvp = (jax.lax.dot_general(y, qkvw_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            + bqkv_ref[:]).astype(x.dtype)       # [Pn, 3*nh*HP]

    # selectors for the decomposed rel-pos fold (flash_attention
    # _vit_window_kernel math, generalized to P windows per program)
    MH = (jax.lax.broadcasted_iota(jnp.int32, (Pn, n), 1) // kw
          == (jax.lax.broadcasted_iota(jnp.int32, (Pn, n), 0) % n) // kw)
    MW = (jax.lax.broadcasted_iota(jnp.int32, (Pn, n), 1) // kw
          == (jax.lax.broadcasted_iota(jnp.int32, (Pn, n), 0) % n) % kw)
    T = (jax.lax.broadcasted_iota(jnp.int32, (n, kw), 0) % kw
         == jax.lax.broadcasted_iota(jnp.int32, (n, kw), 1)).astype(f32)
    SH = (jax.lax.broadcasted_iota(jnp.int32, (kh, Pn), 1) % n // kw
          == jax.lax.broadcasted_iota(jnp.int32, (kh, Pn), 0)).astype(f32)
    SW = (jax.lax.broadcasted_iota(jnp.int32, (kw, Pn), 1) % n % kw
          == jax.lax.broadcasted_iota(jnp.int32, (kw, Pn), 0)).astype(f32)
    # same-window block mask for the [Pn, Pn] logits
    blockm = (jax.lax.broadcasted_iota(jnp.int32, (Pn, Pn), 0) // n
              == jax.lax.broadcasted_iota(jnp.int32, (Pn, Pn), 1) // n)

    HP = _HP
    for h in range(nh):
        q = qkvp[:, h * HP:(h + 1) * HP]         # [Pn, HP]
        k = qkvp[:, (nh + h) * HP:(nh + h + 1) * HP]
        v = qkvp[:, (2 * nh + h) * HP:(2 * nh + h + 1) * HP]
        gh = jax.lax.dot_general(q, rhf_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)  # [Pn, kh*kh]
        rel_h = jax.lax.dot_general(jnp.where(MH, gh, 0.0), T,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)  # [Pn, kh]
        gw = jax.lax.dot_general(q, rwf_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        rel_w = jax.lax.dot_general(jnp.where(MW, gw, 0.0), T,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)  # [Pn, kw]
        bias = (jax.lax.dot_general(rel_h, SH, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
                + jax.lax.dot_general(rel_w, SW, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32))
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) * scale + bias
        logits = jnp.where(blockm, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        o_h = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)

        if h == 0:
            attn_out = jax.lax.dot_general(
                o_h.astype(x.dtype), wo_ref[h * HP:(h + 1) * HP, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
        else:
            attn_out = attn_out + jax.lax.dot_general(
                o_h.astype(x.dtype), wo_ref[h * HP:(h + 1) * HP, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)

    o_ref[0] = (x.astype(f32) + attn_out + bo_ref[:]).astype(o_ref.dtype)


def _window_attn_xla(x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf, mask,
                     nh, hd, kh, kw, eps):
    """Exact XLA math of the fused chain (backward + parity tests):
    LN -> mask -> packed qkv -> _window_packed_xla -> proj -> residual."""
    from ullsam_tpu.ops.pallas.flash_attention import _window_packed_xla
    f32 = jnp.float32
    Bw, n, C = x.shape
    x32 = x.astype(f32)
    m1 = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    y = ((x32 - m1) * jax.lax.rsqrt(var + eps) * lns.astype(f32)
         + lnb.astype(f32))
    if mask is not None:
        y = y * mask
    y = y.astype(x.dtype)
    qkvp = (jnp.einsum("bnc,ck->bnk", y, qkvw,
                       preferred_element_type=f32) + bqkv).astype(x.dtype)
    out = _window_packed_xla(qkvp, rhf, rwf, nh, hd, kh, kw)
    proj = jnp.einsum("bnk,kc->bnc", out, wo,
                      preferred_element_type=f32) + bo
    return (x32 + proj).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14,
                                                    15, 16, 17, 18, 19))
def _window_attn_call(x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf,
                      P, nh, hd, kh, kw, eps, nwx, nwy, Hv, Wv, masked):
    Bw, n, C = x.shape
    xg = x.reshape(Bw // P, P * n, C)
    kernel = functools.partial(
        _window_attn_kernel, P=P, n=n, nh=nh, scale=hd ** -0.5, kh=kh,
        kw=kw, eps=eps, nwx=nwx, nwy=nwy, Hv=Hv, Wv=Wv, masked=masked)
    out = pl.pallas_call(
        kernel,
        grid=(Bw // P,),
        in_specs=[
            pl.BlockSpec((1, P * n, C), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec(qkvw.shape, lambda g: (0, 0)),
            pl.BlockSpec(bqkv.shape, lambda g: (0, 0)),
            pl.BlockSpec(wo.shape, lambda g: (0, 0)),
            pl.BlockSpec(bo.shape, lambda g: (0, 0)),
            pl.BlockSpec(rhf.shape, lambda g: (0, 0)),
            pl.BlockSpec(rwf.shape, lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P * n, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bw // P, P * n, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf)
    return out.reshape(Bw, n, C)


def _window_attn_fwd(x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf,
                     P, nh, hd, kh, kw, eps, nwx, nwy, Hv, Wv, masked):
    out = _window_attn_call(x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf,
                            P, nh, hd, kh, kw, eps, nwx, nwy, Hv, Wv, masked)
    return out, (x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf)


def _window_attn_hybrid(x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf, mask,
                        nh, hd, kh, kw, eps):
    """Same chain as _window_attn_xla but with the attention core routed
    through vit_window_attention_packed, whose custom vjp is the Pallas
    window BACKWARD kernel — so differentiating this function runs the
    fused backward for the attention while LN/qkv/proj grads stay XLA."""
    from ullsam_tpu.ops.pallas.flash_attention import (
        vit_window_attention_packed)
    f32 = jnp.float32
    x32 = x.astype(f32)
    m1 = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    y = ((x32 - m1) * jax.lax.rsqrt(var + eps) * lns.astype(f32)
         + lnb.astype(f32))
    if mask is not None:
        y = y * mask
    y = y.astype(x.dtype)
    qkvp = (jnp.einsum("bnc,ck->bnk", y, qkvw,
                       preferred_element_type=f32) + bqkv).astype(x.dtype)
    out = vit_window_attention_packed(qkvp, rhf, rwf, nh, hd, kh, kw)
    proj = jnp.einsum("bnk,kc->bnc", out, wo,
                      preferred_element_type=f32) + bo
    return (x32 + proj).astype(x.dtype)


def _window_attn_bwd(P, nh, hd, kh, kw, eps, nwx, nwy, Hv, Wv, masked,
                     res, g):
    x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf = res
    mask = None
    if masked:
        Bw, n, _ = x.shape
        w = jnp.arange(Bw)[:, None] % (nwy * nwx)
        t = jnp.arange(n)[None, :]
        row_img = (w // nwx) * kh + t // kw
        col_img = (w % nwx) * kw + t % kw
        mask = ((row_img < Hv) & (col_img < Wv)
                ).astype(jnp.float32)[..., None]
    # ULLSAM_FUSED_WINDOW_BWD (trace-time, default on): attention-core
    # grads via the Pallas window backward kernel; =0 keeps the full
    # XLA-math vjp
    chain = (_window_attn_hybrid
             if os.environ.get("ULLSAM_FUSED_WINDOW_BWD", "1") != "0"
             else _window_attn_xla)
    _, vjp = jax.vjp(
        lambda *a: chain(*a, mask, nh, hd, kh, kw, eps),
        x, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf)
    return vjp(g)


_window_attn_call.defvjp(_window_attn_fwd, _window_attn_bwd)


def window_attn_supported(n: int, C: int, nh: int, hd: int) -> bool:
    # default ON: the on-chip A/B (benchmarks/ab_encode_fused.py, v5e,
    # ViT-H interleaved 4 rounds) measured 64.0 ms/encode attn_only vs
    # 65.6 ms with the standalone packed window kernel (LN/qkv/proj in
    # XLA) — the in-kernel qkv/proj with VMEM-resident weights removes
    # the padded-layout HBM round trip. ULLSAM_FUSED_VIT_ATTN=0 falls
    # back for debugging.
    from ullsam_tpu.ops.pallas import backend_ok
    if os.environ.get("ULLSAM_FUSED_VIT_ATTN", "1") == "0":
        return False
    return (backend_ok() and C % 128 == 0 and hd <= _HP
            and 4 <= n < 1024)


def fused_window_attn(x: Array, blk: dict, rhf: Array, rwf: Array, *,
                      nh: int, hd: int, kh: int, kw: int, eps: float,
                      nwx: int, nwy: int, Hv: int, Wv: int,
                      masked: bool) -> Array:
    """x + proj(window_attention(LN(x))) fused per window group.

    x: [Bw, n, C] pre-partitioned windows (n = kh*kw); rhf/rwf the
    gathered rel-pos tables [128, kh*kh]/[128, kw*kw] (pad rows zero).
    `masked` zeroes the normed activations of pad tokens (edge windows)
    exactly like the reference's pad-before-window
    (image_encoder.py:166-182); nwx/Hv/Wv give the window-grid geometry.
    """
    assert kh == kw, "square windows only (rel-pos fold)"
    Bw, n, C = x.shape
    dt = x.dtype
    qkvw, bqkv, wo, bo = pack_window_attn_weights(blk, nh, hd, dt)
    P = 1
    want = int(os.environ.get("ULLSAM_VIT_ATTN_P", "1"))
    for p in (8, 4, 2):
        if p <= want and Bw % p == 0:
            P = p
            break
    return _window_attn_call(x, blk["norm1"]["scale"].astype(jnp.float32)[None],
                             blk["norm1"]["bias"].astype(jnp.float32)[None],
                             qkvw, bqkv, wo, bo,
                             rhf.astype(dt), rwf.astype(dt),
                             P, nh, hd, kh, kw, eps, nwx, nwy, Hv, Wv,
                             masked)
