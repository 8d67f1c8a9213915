"""Pallas TPU kernels for the SAM mask-decoder hot path.

The AMG sweep decodes 256 prompts per chunk against a shared [64, 64, 256]
image embedding (reference: /root/reference/modeling/mask_decoder.py:112-149
and transformer.py:16-184). Profiling the XLA decode chunk on v5e showed the
upscale + hypernetwork stage dominated by
  * the per-prompt hypernet contraction (batched [N, 2C] @ [2C, nm*16] with a
    tiny per-batch RHS — ~9 ms, MXU-hostile), and
  * ~1 GB of f32 LayerNorm/GELU elementwise HBM traffic between the matmuls.

fused_upscale_hypernet runs the whole chain — convT1-as-matmul, grouped LN,
GELU, convT2-as-block-diag-matmul, GELU, hypernet dot — in VMEM per
(prompt, row-tile) program, reading keys once and writing only the final
block-column masks. Outputs stay in BLOCK-COLUMN layout [B, N, nm*16]
(cols = (mask, di, dj, ei, ej) sub-pixel indices; see
mask_decoder._upscale_hypernet_cols): the AMG pipeline consumes that layout
directly and only restores spatial order after top-k selection.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gelu(x: Array) -> Array:
    """Kernel GELU. Mosaic has no erf/erfc lowering; an erf polynomial
    (A&S 7.1.26, exp+div based) costs ~4 ms/chunk more than the VPU tanh
    intrinsic at AMG scale (805M activations/chunk). Deviation from the
    exact erf GELU is <= ~1.5e-3 absolute — inside bf16 rounding noise for
    the mask logits this kernel feeds.

    ULLSAM_KERNEL_GELU=poly swaps the tanh intrinsic for a transcendental-
    free odd minimax polynomial of the SAME tanh-form function (degree-13
    in x, Horner in x^2, endpoint-constrained so gelu(x) == x exactly for
    x >= 4): max |err| vs the tanh form 4.9e-4 over all x — below the
    tanh-form's own 1.5e-3 deviation from erf. Read at trace time; see
    benchmarks/ablate_gelu.py for the on-chip A/B."""
    f = x.astype(jnp.float32)
    mode = os.environ.get("ULLSAM_KERNEL_GELU", "tanh")
    if mode == "id":  # timing ceiling probe only (ablate_gelu.py)
        return x
    if mode == "poly":
        y = jnp.clip(f, -4.0, 4.0)
        t = y * y
        h = (((((2.9225219743598021e-08 * t - 1.9582960649183773e-06) * t
                + 5.5764190412293351e-05) * t - 8.9643829814620808e-04) * t
              + 9.2000206800642321e-03) * t - 6.551874005207356e-02) * t \
            + 0.3984482633655887
        return (f * (0.5 + y * h)).astype(x.dtype)
    inner = 0.7978845608028654 * (f + 0.044715 * (f * f * f))
    return (0.5 * f * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def _upscale_core(x, w1_ref, b1_ref, lns_ref, lnb_ref, w2_ref, b2_ref,
                  *, c4: int, eps: float):
    """convT1-as-matmul + grouped LN + GELU + convT2-as-matmul + GELU on
    one [TN, C] bf16 row block; returns u2 [TN, 2C] bf16 ready for the
    hypernet contraction. Shared by the standalone upscale kernels and
    the fused decode megakernel."""
    u1 = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]    # [TN, C] f32

    # grouped LayerNorm over the four c4-wide sub-pixel groups; statistics
    # via 0/1 pool matmuls (lane-dim reshapes are not Mosaic-native)
    C = u1.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, 4), 0) // c4
    gj = jax.lax.broadcasted_iota(jnp.int32, (C, 4), 1)
    pool = (gi == gj).astype(jnp.float32) / c4             # [C, 4]
    expand = jnp.transpose((gi == gj).astype(jnp.float32)) # [4, C]
    m1 = jax.lax.dot_general(u1, pool, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(u1 * u1, pool, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    inv = jax.lax.rsqrt(var + eps)                         # [TN, 4]
    mean_full = jax.lax.dot_general(m1, expand, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    inv_full = jax.lax.dot_general(inv, expand, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    u1 = (u1 - mean_full) * inv_full * lns_ref[:] + lnb_ref[:]
    u1 = _gelu(u1).astype(x.dtype)                         # [TN, C]

    u2 = jax.lax.dot_general(
        u1, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]    # [TN, 2C]
    return _gelu(u2).astype(x.dtype)


def _upscale_kernel(keys_ref, hbd_ref, w1_ref, b1_ref, lns_ref, lnb_ref,
                    w2_ref, b2_ref, o_ref, *, c4: int, eps: float):
    u2 = _upscale_core(keys_ref[0], w1_ref, b1_ref, lns_ref, lnb_ref,
                       w2_ref, b2_ref, c4=c4, eps=eps)
    o_ref[0] = jax.lax.dot_general(
        u2, hbd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _upscale_stats_kernel(keys_ref, hbd_ref, w1_ref, b1_ref, lns_ref,
                          lnb_ref, w2_ref, b2_ref, o_ref, cnt_ref, row_ref,
                          col_ref, *, c4: int, eps: float, thr: float,
                          off: float, W: int, nm: int):
    """_upscale_kernel + in-VMEM mask statistics.

    While each [block_n, nm*16] logit tile is still in VMEM, emits the
    hi/lo pixel counts (stability score numerator/denominator) and the
    spatial row/col occupancy bitmaps (bounding boxes) as accumulated
    side outputs — the XLA stats chain re-read the ~100 MB bf16 cols
    tensor several times per chunk (~2.9 ms, round-2 verdict item 2).

    cnt_ref [1, 8, 128] f32: row 0 = hi counts, row 1 = lo counts, lanes
    [:nm]. row_ref [1, 8, 4H], col_ref [1, 8, 4W] f32: >0 where any pixel
    of mask m (sublane) occupies that spatial row/col.
    """
    n = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(n == 0)
    def _init():
        cnt_ref[0] = jnp.zeros_like(cnt_ref[0])
        row_ref[0] = jnp.zeros_like(row_ref[0])
        col_ref[0] = jnp.zeros_like(col_ref[0])

    u2 = _upscale_core(keys_ref[0], w1_ref, b1_ref, lns_ref, lnb_ref,
                       w2_ref, b2_ref, c4=c4, eps=eps)
    logits = jax.lax.dot_general(
        u2, hbd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                        # [TN, nm*16]
    o_ref[0] = logits.astype(o_ref.dtype)

    rows_blk = logits.shape[0] // W
    cnt, row_add, col_add = _stats_of_block(
        logits, base_row=n * rows_blk * 4, W=W, nm=nm, thr=thr, off=off,
        H4=row_ref.shape[-1], W4=col_ref.shape[-1])
    cnt_ref[0] = cnt_ref[0] + cnt
    row_ref[0] = row_ref[0] + row_add
    col_ref[0] = col_ref[0] + col_add


def _stats_of_block(logits, *, base_row, W: int, nm: int, thr: float,
                    off: float, H4: int, W4: int):
    """Mask statistics of one [TN, nm*16] logit block, returned as
    accumulator deltas: (cnt [8, 128] — row 0 = hi counts, row 1 = lo,
    lanes [:nm]; row_any [8, H4]; col_any [8, W4]). `base_row` is the
    spatial row offset of this block (4 * first grid row)."""
    f32 = jnp.float32
    TN, L = logits.shape                                   # L = nm*16
    rows_blk = TN // W

    def nn(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # hi/lo counts per mask token: lane-group sums via a [L, nm] selector
    csel = (jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0) // 16
            == jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
            ).astype(f32)                                  # [L, 128]
    zhi = (logits > (thr + off)).astype(f32)
    zlo = (logits > (thr - off)).astype(f32)
    hi = nn(jnp.sum(zhi, axis=0, keepdims=True), csel)     # [1, 128]
    lo = nn(jnp.sum(zlo, axis=0, keepdims=True), csel)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cnt = jnp.where(rsel == 0, hi, jnp.where(rsel == 1, lo, 0.0))

    # occupancy bitmaps. Sub-pixel layout: col = m*16 + di*8 + dj*4 +
    # ei*2 + ej; spatial row = 4*(grid_row) + 2di + ei, spatial col =
    # 4*(grid_col) + 2dj + ej (mask_decoder._upscale_hypernet_cols).
    z0 = (logits > thr).astype(f32)
    g3 = z0.reshape(rows_blk, W, L)
    row_occ = jnp.max(g3, axis=1)                          # [rows_blk, L]
    col_occ = jnp.max(g3, axis=0)                          # [W, L]

    li = jax.lax.broadcasted_iota(jnp.int32, (L, nm * 4), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, nm * 4), 1)
    m_of = li // 16
    di2ei = ((li % 16) // 8) * 2 + (li % 4) // 2           # 2di + ei
    dj2ej = ((li % 8) // 4) * 2 + li % 2                   # 2dj + ej
    sel_r = ((m_of * 4 + di2ei) == lj).astype(f32)         # [L, nm*4]
    sel_c = ((m_of * 4 + dj2ej) == lj).astype(f32)
    r12 = nn(row_occ, sel_r)                               # [rows_blk, nm*4]
    c12 = nn(col_occ, sel_c)                               # [W, nm*4]

    # placement: out[m, 4*pos + s] += part[pos, m*4 + s], accumulated.
    # Static loop over the 4 sub-offsets; each (extract, transpose-place)
    # pair is two small matmuls — lane-dim reshapes are not Mosaic-native.
    row_acc = jnp.zeros((8, H4), f32)
    col_acc = jnp.zeros((8, W4), f32)
    for s in range(4):
        ex = (jax.lax.broadcasted_iota(jnp.int32, (nm * 4, nm), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (nm * 4, nm), 1) * 4
              + s).astype(f32)                             # [nm*4, nm]
        r_m = nn(r12, ex)                                  # [rows_blk, nm]
        c_m = nn(c12, ex)                                  # [W, nm]
        # transpose+place via one matmul each: P[pos, lane] = 1 at
        # lane = 4*pos + s (+ block row offset for rows)
        pr = (jax.lax.broadcasted_iota(jnp.int32, (rows_blk, H4), 0) * 4
              + s + base_row
              == jax.lax.broadcasted_iota(jnp.int32, (rows_blk, H4), 1)
              ).astype(f32)
        pc = (jax.lax.broadcasted_iota(jnp.int32, (W, W4), 0) * 4 + s
              == jax.lax.broadcasted_iota(jnp.int32, (W, W4), 1)
              ).astype(f32)
        row_acc = row_acc + jnp.pad(
            jax.lax.dot_general(r_m, pr, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32),
            ((0, 8 - nm), (0, 0)))
        col_acc = col_acc + jnp.pad(
            jax.lax.dot_general(c_m, pc, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32),
            ((0, 8 - nm), (0, 0)))
    return cnt, row_acc, col_acc


@functools.partial(jax.jit, static_argnames=("W", "nm", "thr", "off",
                                             "block_n", "eps", "interpret"))
def fused_upscale_hypernet_stats(keys: Array, hyper_in: Array, w1c: Array,
                                 b1t: Array, ln_scale_t: Array,
                                 ln_bias_t: Array, w2bd: Array, b2t: Array,
                                 *, W: int, nm: int, thr: float, off: float,
                                 block_n: int = 512, eps: float = 1e-6,
                                 interpret: bool = False):
    """fused_upscale_hypernet + in-kernel mask statistics.

    Returns (cols [B, N, nm*16] bf16, counts [B, 8, 128] f32 with hi/lo
    pixel counts in rows 0/1 lanes [:nm], row_any [B, 8, 4H], col_any
    [B, 8, 4W] f32 occupancy bitmaps) — stability scores and bounding
    boxes then cost a few tiny reductions instead of several passes over
    the cols tensor.
    """
    B, N, C = keys.shape
    assert hyper_in.shape[1] == nm and N % block_n == 0
    assert block_n % W == 0
    H = N // W
    c4 = C // 4
    dtype = keys.dtype
    eye16 = jnp.eye(16, dtype=dtype)
    hbd = jnp.einsum("ef,bmc->becmf", eye16,
                     hyper_in.astype(dtype)).reshape(B, 2 * C, nm * 16)

    kernel = functools.partial(_upscale_stats_kernel, c4=c4, eps=eps,
                               thr=thr, off=off, W=W, nm=nm)
    return pl.pallas_call(
        kernel,
        grid=(B, N // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0)),
            pl.BlockSpec((1, 2 * C, nm * 16), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((C, 2 * C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, 2 * C), lambda b, n: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n, nm * 16), lambda b, n: (b, n, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((1, 8, 4 * H), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((1, 8, 4 * W), lambda b, n: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, nm * 16), dtype),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 4 * W), jnp.float32),
        ),
        interpret=interpret,
    )(keys, hbd, w1c.astype(dtype), b1t, ln_scale_t, ln_bias_t,
      w2bd.astype(dtype), b2t)


def supported(keys_shape, transformer_dim: int) -> bool:
    """Kernel engages for production shapes on a real TPU backend."""
    from ullsam_tpu.ops.pallas import backend_ok
    if not backend_ok():
        return False
    B, N, C = keys_shape
    return (C == transformer_dim and C % 128 == 0 and N % 512 == 0
            and C >= 128)


@functools.partial(jax.jit, static_argnames=("block_n", "eps", "interpret"))
def fused_upscale_hypernet(keys: Array, hyper_in: Array, w1c: Array,
                           b1t: Array, ln_scale_t: Array, ln_bias_t: Array,
                           w2bd: Array, b2t: Array, *, block_n: int = 512,
                           eps: float = 1e-6,
                           interpret: bool = False) -> Array:
    """keys [B, N, C] -> block-column masks [B, N, nm*16].

    hyper_in: [B, nm, C//8] hypernet outputs. w1c [C, C], w2bd [C, 2C],
    biases/LN params pre-tiled to [1, C] / [1, 2C] f32 (see
    mask_decoder._upscale_weight_views). Matches the XLA reference
    `_upscale_hypernet_cols` to bf16 tolerance.
    """
    B, N, C = keys.shape
    nm = hyper_in.shape[1]
    c4 = C // 4
    assert N % block_n == 0, (N, block_n)
    dtype = keys.dtype

    # per-prompt block-diagonal hypernet RHS [B, 2C, nm*16] (tiny; built in
    # XLA once per call): hbd[(e, c8), (m, e')] = hyper[m, c8] iff e == e'
    eye16 = jnp.eye(16, dtype=dtype)
    hbd = jnp.einsum("ef,bmc->becmf", eye16,
                     hyper_in.astype(dtype)).reshape(B, 2 * C, nm * 16)

    kernel = functools.partial(_upscale_kernel, c4=c4, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B, N // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0)),
            pl.BlockSpec((1, 2 * C, nm * 16), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((C, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((C, 2 * C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, 2 * C), lambda b, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, nm * 16), lambda b, n: (b, n, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, nm * 16), dtype),
        interpret=interpret,
    )(keys, hbd, w1c.astype(dtype), b1t, ln_scale_t, ln_bias_t,
      w2bd.astype(dtype), b2t)


# ---------------------------------------------------------------------------
# Fused two-way transformer (per-prompt megakernel)
# ---------------------------------------------------------------------------
#
# The AMG decode runs 256 prompts against ONE shared [4096, 256] image
# embedding. The XLA two-way transformer (transformer.py:16-184 semantics)
# materializes per-prompt image keys and head-split [.., heads, 16] tensors
# in HBM (~18 ms/chunk). Here one grid program computes the ENTIRE depth-2
# transformer for one prompt with the image keys resident in VMEM.
#
# Head handling without lane reshapes: tokens are padded to TP=16 rows and
# expanded to (head, token) row-blocks of 128 via a 0/1 selection matmul;
# per-head restriction is a column mask (col // head_dim == row // TP).
# The image->token softmax groups 16 lanes per head: a GLOBAL row max is a
# valid per-group shift (uniform within each group), and group sums come
# from one [128, heads] 0/1 matmul.

NEG_INF = -1e30
_TP = 16  # padded token count; heads * _TP must equal 128


def pack_twt_weights(tw: dict, mlp_dim: int, dtype=jnp.bfloat16):
    """Pack the two_way_transformer param pytree into 5 kernel arrays.

    Returns (w256 [C, X], w128 [Cd, Y], wfc2 [mlp_dim, nb*C],
    bias [R, C] f32, bmlp [nb, mlp_dim] f32). Column/row offsets are the
    static layout the kernel assumes (see _twt_kernel)."""
    layers = tw["layers"]
    fin = tw["final_attn_t2i"]
    C = layers[0]["self_attn"]["q"]["kernel"].shape[0]
    Cd = layers[0]["cross_attn_t2i"]["q"]["kernel"].shape[1]

    def k_(p):
        return p["kernel"].astype(dtype)

    def b_(p, width):
        b = p.get("bias")
        b = (jnp.zeros((width,), jnp.float32) if b is None
             else b.astype(jnp.float32))
        out = jnp.zeros((C,), jnp.float32)
        return out.at[:width].set(b)

    w256_cols, w128_cols, wfc2_cols, bias_rows, bmlp_rows = [], [], [], [], []
    for lyr in layers:
        sa, t2i, i2t = (lyr["self_attn"], lyr["cross_attn_t2i"],
                        lyr["cross_attn_i2t"])
        w256_cols += [k_(sa["q"]), k_(sa["k"]), k_(sa["v"]), k_(sa["out"]),
                      k_(t2i["q"]), k_(t2i["k"]), k_(t2i["v"]),
                      k_(i2t["q"]), k_(i2t["k"]), k_(i2t["v"]),
                      k_(lyr["mlp"]["fc1"])]
        w128_cols += [k_(t2i["out"]), k_(i2t["out"])]
        wfc2_cols += [k_(lyr["mlp"]["fc2"])]
        bias_rows += [b_(sa["q"], C), b_(sa["k"], C), b_(sa["v"], C),
                      b_(sa["out"], C),
                      b_(t2i["q"], Cd), b_(t2i["k"], Cd), b_(t2i["v"], Cd),
                      b_(t2i["out"], C),
                      b_(i2t["q"], Cd), b_(i2t["k"], Cd), b_(i2t["v"], Cd),
                      b_(i2t["out"], C),
                      b_(lyr["mlp"]["fc2"], C)]
        for nrm in ("norm1", "norm2", "norm3", "norm4"):
            bias_rows += [lyr[nrm]["scale"].astype(jnp.float32),
                          lyr[nrm]["bias"].astype(jnp.float32)]
        bmlp_rows += [lyr["mlp"]["fc1"].get(
            "bias", jnp.zeros((mlp_dim,))).astype(jnp.float32)]
    w256_cols += [k_(fin["q"]), k_(fin["k"]), k_(fin["v"])]
    w128_cols += [k_(fin["out"])]
    bias_rows += [b_(fin["q"], Cd), b_(fin["k"], Cd), b_(fin["v"], Cd),
                  b_(fin["out"], C),
                  tw["norm_final"]["scale"].astype(jnp.float32),
                  tw["norm_final"]["bias"].astype(jnp.float32)]
    return (jnp.concatenate(w256_cols, axis=1),
            jnp.concatenate(w128_cols, axis=1),
            jnp.concatenate(wfc2_cols, axis=1),
            jnp.stack(bias_rows),
            jnp.stack(bmlp_rows))


def _twt_compute(src_ref, tok_ref, k1_ref, v1_ref, qi1_ref,
                 pewk2_ref, pewq2_ref, pewkf_ref,
                 w256_ref, w128_ref, wfc2_ref, bias_ref, bmlp_ref,
                 *, T: int, C: int, Cd: int,
                 heads: int, mlp_dim: int, eps: float, P: int = 1):
    """In-VMEM two-way-transformer compute shared by _twt_kernel and the
    fused decode megakernel. Returns (q [P*_TP, C] bf16 post-final-norm,
    keys: list of P [N, C] bf16 refined image embeddings) as VALUES —
    callers decide what to write where.

    P prompts per grid program (prompt-major row blocks): the fixed
    per-program overhead and the shared block-1 attention matmuls
    amortize over P prompts. Expansion rows r = p*HT + h*TP + t.

    Image-side projections never recompute shared work: block 1's
    k/v/qi come in precomputed (k1/v1/qi1); block 2 and the final
    attention project the per-prompt keys with ONE [N, 3Cd] / [N, 2Cd]
    matmul each (t2i.k|t2i.v|i2t.q and fin.k|fin.v are contiguous in
    the w256 pack) plus the precomputed pe-halves pewk2/pewq2/pewkf —
    so pe itself never enters the kernel."""
    f32 = jnp.float32
    bf = src_ref.dtype
    hd_self = C // heads
    hd_cross = Cd // heads
    TP = _TP
    HT = heads * TP  # 128
    R = P * HT       # expansion rows
    PT = P * TP      # token rows

    w_blk = 4 * C + 6 * Cd + mlp_dim
    b_blk = 21

    def nt(a, b):  # a [M, K], b [N, K] -> [M, N] f32
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def nn(a, b):  # a [M, K], b [K, N] -> [M, N] f32
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def brow(r, width):
        return bias_ref[r:r + 1, :width]

    # (prompt, head, token) expansion: S[r, c] = (c == (r//HT)*TP + r%TP)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, PT), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, PT), 1)
    S = ((ci // TP == ri // HT) & (ci % TP == ri % TP)).astype(bf)
    Tcol = jnp.transpose(S)  # [PT, R] collapse

    def headmask(x, hd):  # zero cols outside the row's head slice
        row_h = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % HT) // TP
        col_h = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) // hd
        return jnp.where(row_h == col_h, x, 0.0)

    def ln(x32, r, width):  # LayerNorm rows -> bf16 (layers.layer_norm)
        m1 = jnp.mean(x32, axis=-1, keepdims=True)
        m2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        y = (x32 - m1) * jax.lax.rsqrt(var + eps)
        return (y * brow(r, width) + brow(r + 1, width)).astype(bf)

    def softmax_rows(logits):  # last-axis softmax, f32
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        return e / jnp.sum(e, axis=-1, keepdims=True)

    tok0 = tok_ref[0]  # [PT, C] bf16 — initial tokens AND query PE

    def self_attn(blk, q_in, k_in, v_in):  # [PT, C] bf16 each -> f32
        ow = blk * w_blk
        ob = blk * b_blk
        q = nn(q_in, w256_ref[:, ow:ow + C]) + brow(ob, C)
        k = nn(k_in, w256_ref[:, ow + C:ow + 2 * C]) + brow(ob + 1, C)
        v = nn(v_in, w256_ref[:, ow + 2 * C:ow + 3 * C]) + brow(ob + 2, C)
        Qm = headmask(nn(S, q.astype(bf)), hd_self)        # [R, C]
        logits = nt(Qm.astype(bf), k.astype(bf)) * (hd_self ** -0.5)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (R, PT), 1)
        rrow = jax.lax.broadcasted_iota(jnp.int32, (R, PT), 0)
        ok = (kcol % TP < T) & (kcol // TP == rrow // HT)  # same prompt
        logits = jnp.where(ok, logits, NEG_INF)
        p = softmax_rows(logits)
        om = headmask(nn(p.astype(bf), v.astype(bf)), hd_self)
        out = nn(Tcol, om.astype(bf))                      # [PT, C]
        return (nn(out.astype(bf), w256_ref[:, ow + 3 * C:ow + 4 * C])
                + brow(ob + 3, C))

    N = src_ref.shape[0]

    def project_block2(keys):
        """Per-prompt image-side projections for block 2: ONE [P*N, 3Cd]
        matmul covers t2i.k, t2i.v, i2t.q for ALL P prompts (the three
        kernels are contiguous in the w256 pack, the P keys concatenate
        on the sublane axis); the pe-dependent halves of k and qi are
        the shared precomputed pewk2/pewq2. Returns ([(k, v)], [qi])."""
        ow = w_blk + 4 * C
        ob = b_blk + 4
        kcat = keys[0] if P == 1 else jnp.concatenate(keys, axis=0)
        prjc = nn(kcat, w256_ref[:, ow + Cd:ow + 4 * Cd])
        kv, qis = [], []
        for pi in range(P):
            prj = prjc[pi * N:(pi + 1) * N]
            k = (prj[:, :Cd] + pewk2_ref[:] + brow(ob + 1, Cd)).astype(bf)
            v = (prj[:, Cd:2 * Cd] + brow(ob + 2, Cd)).astype(bf)
            qis.append((prj[:, 2 * Cd:] + pewq2_ref[:]
                        + brow(b_blk + 8, Cd)).astype(bf))
            kv.append((k, v))
        return kv, qis

    def project_final(keys):
        """fin.k|fin.v as one [P*N, 2Cd] matmul across all prompts."""
        ow, ob = 2 * w_blk, 2 * b_blk
        kcat = keys[0] if P == 1 else jnp.concatenate(keys, axis=0)
        prjc = nn(kcat, w256_ref[:, ow + Cd:ow + 3 * Cd])
        kv = []
        for pi in range(P):
            prj = prjc[pi * N:(pi + 1) * N]
            k = (prj[:, :Cd] + pewkf_ref[:] + brow(ob + 1, Cd)).astype(bf)
            v = (prj[:, Cd:] + brow(ob + 2, Cd)).astype(bf)
            kv.append((k, v))
        return kv

    def t2i(blk, q_tok, kv, final=False):
        """token->image cross-attn. q_tok [PT, C] bf; kv: shared (k, v)
        pair (block 1) or per-prompt list from project_block2/final."""
        if final:
            ow, ob = 2 * w_blk, 2 * b_blk
            wout_o, bout_r = 4 * C, 2 * b_blk + 3
        else:
            ow, ob = blk * w_blk + 4 * C, blk * b_blk + 4
            wout_o, bout_r = blk * 2 * C, blk * b_blk + 7
        q = nn(q_tok, w256_ref[:, ow:ow + Cd]) + brow(ob, Cd)   # [PT, Cd]
        Qm = headmask(nn(S, q.astype(bf)), hd_cross)            # [R, Cd]
        if not isinstance(kv, list):
            # block 1: ONE [R, N] pass against the shared projections
            k_pre, v_pre = kv
            logits = nt(Qm.astype(bf), k_pre) * (hd_cross ** -0.5)
            p = softmax_rows(logits)
            om = headmask(nn(p.astype(bf), v_pre), hd_cross)    # [R, Cd]
        else:
            oms = []
            for pi in range(P):
                k, v = kv[pi]
                Qp = Qm[pi * HT:(pi + 1) * HT].astype(bf)       # [HT, Cd]
                logits = nt(Qp, k) * (hd_cross ** -0.5)         # [HT, N]
                pr = softmax_rows(logits)
                oms.append(headmask(nn(pr.astype(bf), v), hd_cross))
            om = jnp.concatenate(oms, axis=0)                   # [R, Cd]
        out = nn(Tcol, om.astype(bf))                           # [PT, Cd]
        return (nn(out.astype(bf), w128_ref[:, wout_o:wout_o + C])
                + brow(bout_r, C))                              # [PT, C] f32

    def i2t(blk, qi, q_tok, v_tok):
        """image->token cross-attn: queries = image rows, keys/values =
        tokens. qi: shared [N, Cd] (block 1) or per-prompt list.
        Returns per-prompt [N, C] f32 keys updates."""
        ow = blk * w_blk + 4 * C + 3 * Cd
        ob = blk * b_blk + 8
        wout_o = blk * 2 * C + C
        kt = nn(q_tok, w256_ref[:, ow + Cd:ow + 2 * Cd]) + brow(ob + 1, Cd)
        vt = nn(v_tok, w256_ref[:, ow + 2 * Cd:ow + 3 * Cd]) + brow(ob + 2, Cd)
        Km = headmask(nn(S, kt.astype(bf)), hd_cross)           # [R, Cd]
        Vm = headmask(nn(S, vt.astype(bf)), hd_cross)           # [R, Cd]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, HT), 1)
        valid = (lane % TP) < T
        G = (jax.lax.broadcasted_iota(jnp.int32, (HT, heads), 0) // TP
             == jax.lax.broadcasted_iota(jnp.int32, (HT, heads), 1)
             ).astype(f32)
        upds = []
        for pi in range(P):
            qi_p = qi[pi] if isinstance(qi, list) else qi       # [N, Cd]
            Kp = Km[pi * HT:(pi + 1) * HT].astype(bf)           # [HT, Cd]
            logits = nt(qi_p, Kp) * (hd_cross ** -0.5)          # [N, HT]
            logits = jnp.where(valid, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.where(valid, jnp.exp(logits - m), 0.0)
            sg = nn(e, G)                                       # [N, heads]
            sx = nn(sg, jnp.transpose(G))                       # [N, HT]
            pr = e / sx
            Vp = Vm[pi * HT:(pi + 1) * HT].astype(bf)
            o = nn(pr.astype(bf), Vp)                           # [N, Cd]
            upds.append(nn(o.astype(bf), w128_ref[:, wout_o:wout_o + C])
                        + brow(blk * b_blk + 11, C))            # [N, C] f32
        return upds

    def mlp(blk, x):  # ReLU MLP on tokens (transformer.py:23)
        ow = blk * w_blk + 4 * C + 6 * Cd
        h = nn(x, w256_ref[:, ow:ow + mlp_dim]) + bmlp_ref[blk:blk + 1, :]
        h = jnp.maximum(h, 0.0).astype(bf)
        return (nn(h, wfc2_ref[:, blk * C:(blk + 1) * C])
                + brow(blk * b_blk + 12, C))

    def ln_tok(x32, blk, which):  # norm1..3 rows at blk*b_blk + 13 + 2*w
        return ln(x32, blk * b_blk + 13 + 2 * which, C)

    # ---- block 1 (skip_first_layer_pe: no PE, no residual on self-attn)
    q = ln_tok(self_attn(0, tok0, tok0, tok0), 0, 0)
    qpe = (q.astype(f32) + tok0.astype(f32)).astype(bf)
    q = ln_tok(q.astype(f32) + t2i(0, qpe, (k1_ref[:], v1_ref[:])), 0, 1)
    q = ln_tok(q.astype(f32) + mlp(0, q), 0, 2)
    qpe = (q.astype(f32) + tok0.astype(f32)).astype(bf)
    upds = i2t(0, qi1_ref[:], qpe, q)
    keys = [ln(src_ref[:].astype(f32) + upds[pi], 0 * b_blk + 19, C)
            for pi in range(P)]

    # ---- block 2
    kv2, qi2 = project_block2(keys)
    qpe = (q.astype(f32) + tok0.astype(f32)).astype(bf)
    q = ln_tok(q.astype(f32) + self_attn(1, qpe, qpe, q), 1, 0)
    qpe = (q.astype(f32) + tok0.astype(f32)).astype(bf)
    q = ln_tok(q.astype(f32) + t2i(1, qpe, kv2), 1, 1)
    q = ln_tok(q.astype(f32) + mlp(1, q), 1, 2)
    qpe = (q.astype(f32) + tok0.astype(f32)).astype(bf)
    upds = i2t(1, qi2, qpe, q)
    keys = [ln(keys[pi].astype(f32) + upds[pi], 1 * b_blk + 19, C)
            for pi in range(P)]

    # ---- final token->image attention + norm_final
    kvf = project_final(keys)
    qpe = (q.astype(f32) + tok0.astype(f32)).astype(bf)
    q = ln(q.astype(f32) + t2i(0, qpe, kvf, final=True),
           2 * b_blk + 4, C)
    return q, keys


def _twt_kernel(src_ref, tok_ref, k1_ref, v1_ref, qi1_ref,
                pewk2_ref, pewq2_ref, pewkf_ref,
                w256_ref, w128_ref, wfc2_ref, bias_ref, bmlp_ref,
                q_out_ref, keys_ref, *, T: int, C: int, Cd: int,
                heads: int, mlp_dim: int, eps: float, P: int = 1):
    q, keys = _twt_compute(
        src_ref, tok_ref, k1_ref, v1_ref, qi1_ref, pewk2_ref, pewq2_ref,
        pewkf_ref, w256_ref, w128_ref, wfc2_ref, bias_ref, bmlp_ref,
        T=T, C=C, Cd=Cd, heads=heads, mlp_dim=mlp_dim, eps=eps, P=P)
    q_out_ref[0] = q
    for pi in range(P):
        keys_ref[0, pi] = keys[pi]


def twt_supported(C: int, Cd: int, heads: int, depth: int, T: int,
                  N: int) -> bool:
    """Fused two-way transformer engages for SAM production shapes on a
    real TPU backend (heads*16 must equal the 128-lane width)."""
    from ullsam_tpu.ops.pallas import backend_ok
    if not backend_ok():
        return False
    return (heads * _TP == 128 and depth == 2 and T <= _TP
            and C % 128 == 0 and Cd % 128 == 0 and Cd // heads >= 8
            and N % 8 == 0 and C // heads >= 8)


def _twt_prologue(tw: dict, image_embedding: Array, image_pe: Array,
                  tokens: Array, mlp_dim: int):
    """Shared-work prologue for the fused TWT / decode kernels: weight
    packs + the image-side projections that depend only on the SHARED
    embedding/pe, computed once in XLA."""
    layers = tw["layers"]
    B, T, C = tokens.shape
    src = image_embedding.reshape(-1, image_embedding.shape[-2],
                                  C)[0]                     # [N, C]
    pe = image_pe.reshape(-1, src.shape[0], C)[0].astype(src.dtype)
    Cd = layers[0]["cross_attn_t2i"]["q"]["kernel"].shape[1]
    dtype = src.dtype

    w256, w128, wfc2, bias, bmlp = pack_twt_weights(tw, mlp_dim, dtype)

    def lin(p, x):  # [N, C] @ [C, Cd] + b, bf16 out
        y = jnp.dot(x, p["kernel"].astype(dtype),
                    preferred_element_type=jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(dtype)

    src_pe = (src.astype(jnp.float32) + pe.astype(jnp.float32)).astype(dtype)
    k1 = lin(layers[0]["cross_attn_t2i"]["k"], src_pe)      # [N, Cd]
    v1 = lin(layers[0]["cross_attn_t2i"]["v"], src)
    qi1 = lin(layers[0]["cross_attn_i2t"]["q"], src_pe)

    def lin_nb(p, x):  # kernel-only projection of pe (bias added in-kernel)
        return jnp.dot(x, p["kernel"].astype(dtype),
                       preferred_element_type=jnp.float32).astype(dtype)

    # shared pe-halves of the block-2 / final image-side projections: the
    # kernel computes keys @ W per prompt and adds these, so pe never has
    # to be resident in VMEM and each prompt needs ONE fused matmul
    pewk2 = lin_nb(layers[1]["cross_attn_t2i"]["k"], pe)    # [N, Cd]
    pewq2 = lin_nb(layers[1]["cross_attn_i2t"]["q"], pe)
    pewkf = lin_nb(tw["final_attn_t2i"]["k"], pe)

    toks = jnp.pad(tokens.astype(dtype), ((0, 0), (0, _TP - T), (0, 0)))
    return (src, toks, k1, v1, qi1, pewk2, pewq2, pewkf,
            w256, w128, wfc2, bias, bmlp, Cd)


def fused_two_way_transformer(tw: dict, image_embedding: Array,
                              image_pe: Array, tokens: Array, *,
                              heads: int, mlp_dim: int, eps: float,
                              interpret: bool = False):
    """Per-prompt fused depth-2 TwoWayTransformer (transformer.py:16-184).

    image_embedding: [1, N, C] SHARED flattened image keys (embedding +
    dense prompt); image_pe: [1 or none, N, C]; tokens: [B, T, C]
    (iou/mask/prompt tokens per prompt). Returns (queries [B, T, C],
    keys [B, N, C]) matching two_way_transformer_apply to bf16 tolerance.

    Block-1's image-side projections (t2i keys/values, i2t image queries)
    depend only on the shared embedding — they are computed ONCE in XLA
    and passed in, so the kernel never redoes shared work per prompt.
    """
    B, T, C = tokens.shape
    (src, toks, k1, v1, qi1, pewk2, pewq2, pewkf,
     w256, w128, wfc2, bias, bmlp, Cd) = _twt_prologue(
        tw, image_embedding, image_pe, tokens, mlp_dim)
    N = src.shape[0]
    dtype = src.dtype

    # multiple prompts per program divide the fixed per-program overhead
    # and share the block-1 attention passes. P=1 measured best on v5e
    # once the timing-harness carry bug was fixed (round 3);
    # ULLSAM_TWT_P overrides for experiments.
    want = int(os.environ.get("ULLSAM_TWT_P", "1"))
    P = max(p for p in (1, 2, 4, 8) if p <= max(want, 1) and B % p == 0)
    if P > 1:
        toks = toks.reshape(B // P, P * _TP, C)
    nprog = B // P

    kernel = functools.partial(_twt_kernel, T=T, C=C, Cd=Cd, heads=heads,
                               mlp_dim=mlp_dim, eps=eps, P=P)
    q_out, keys_out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((N, C), lambda b: (0, 0)),
            pl.BlockSpec((1, P * _TP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((N, Cd), lambda b: (0, 0)),
            pl.BlockSpec((N, Cd), lambda b: (0, 0)),
            pl.BlockSpec((N, Cd), lambda b: (0, 0)),
            pl.BlockSpec((N, Cd), lambda b: (0, 0)),
            pl.BlockSpec((N, Cd), lambda b: (0, 0)),
            pl.BlockSpec((N, Cd), lambda b: (0, 0)),
            pl.BlockSpec(w256.shape, lambda b: (0, 0)),
            pl.BlockSpec(w128.shape, lambda b: (0, 0)),
            pl.BlockSpec(wfc2.shape, lambda b: (0, 0)),
            pl.BlockSpec(bias.shape, lambda b: (0, 0)),
            pl.BlockSpec(bmlp.shape, lambda b: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, P * _TP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, P, N, C), lambda b: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nprog, P * _TP, C), dtype),
            jax.ShapeDtypeStruct((nprog, P, N, C), dtype),
        ),
        # resident shared embedding + weight packs + per-prompt transients.
        # Scoped-vmem demand depends on operand layouts (measured 45.3 MB
        # at P=2 when called standalone vs < 34 MB inside the AMG jit), so
        # the cap is generous: it is an allowance, not an allocation, and
        # the v5e has 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 + 24 * max(P - 2, 0)) * 1024 * 1024),
        interpret=interpret,
    )(src, toks, k1, v1, qi1, pewk2, pewq2, pewkf,
      w256, w128, wfc2, bias, bmlp)
    q_out = q_out.reshape(B, _TP, C)
    keys_out = keys_out.reshape(B, N, C)
    return q_out[:, :T], keys_out


# ---------------------------------------------------------------------------
# Fully fused decode megakernel: TWT + hypernet MLPs + upscale + statistics
# ---------------------------------------------------------------------------
#
# The two-kernel decode (fused_two_way_transformer then
# fused_upscale_hypernet_stats) round-trips the refined per-prompt image
# keys through HBM: [256, 4096, 256] bf16 = 512 MB written and read back
# per AMG chunk — the largest single HBM item in the whole decode. Here
# ONE grid program runs the entire per-prompt pipeline
# (transformer.py:16-184 + mask_decoder.py:53-69,112-148) with the keys
# resident in VMEM, writing only the final block-column logits (~100 MB)
# and token outputs. Statistics run ONCE per prompt on the full [N, nm*16]
# logit tile (the per-512-row-block variant paid ~10 tiny placement
# matmuls x 2048 blocks; here it is x256).


def pack_hyper_mlps(mlps, dtype=jnp.bfloat16):
    """Pack M 3-layer hypernetwork MLPs (mask_decoder.py:154-176; dims
    [C, C, C, C//8]) into block-diagonal kernel arrays so one matmul
    chain evaluates every selected head for every token row.

    Returns (wh1 [C, M*C] concat, wh2 [M*C, M*C] block-diag,
    wh3 [M*C, HL] block-diag with HL = ceil(M*C8/128)*128 lanes,
    bh [3, M*C] f32 rows = per-layer biases, row 2 left-aligned to HL).
    """
    M = len(mlps)
    C = mlps[0]["layers"][0]["kernel"].shape[0]
    C8 = mlps[0]["layers"][2]["kernel"].shape[1]
    HL = -(-M * C8 // 128) * 128
    assert M * C >= HL, (M, C, HL)

    wh1 = jnp.concatenate(
        [m["layers"][0]["kernel"].astype(dtype) for m in mlps], axis=1)
    wh2 = jnp.zeros((M * C, M * C), dtype)
    wh3 = jnp.zeros((M * C, HL), dtype)
    for i, m in enumerate(mlps):
        wh2 = jax.lax.dynamic_update_slice(
            wh2, m["layers"][1]["kernel"].astype(dtype), (i * C, i * C))
        wh3 = jax.lax.dynamic_update_slice(
            wh3, m["layers"][2]["kernel"].astype(dtype), (i * C, i * C8))

    def brow(j, width, offs):
        row = jnp.zeros((M * C,), jnp.float32)
        for i, m in enumerate(mlps):
            b = m["layers"][j].get("bias")
            if b is not None:
                row = jax.lax.dynamic_update_slice(
                    row, b.astype(jnp.float32), (i * offs,))
        return row

    bh = jnp.stack([brow(0, C, C), brow(1, C, C), brow(2, C8, C8)])
    return wh1, wh2, wh3, bh


def _decode_kernel(src_ref, tok_ref, k1_ref, v1_ref, qi1_ref,
                   pewk2_ref, pewq2_ref, pewkf_ref,
                   w256_ref, w128_ref, wfc2_ref, bias_ref, bmlp_ref,
                   wh1_ref, wh2_ref, wh3_ref, bh_ref,
                   w1_ref, b1_ref, lns_ref, lnb_ref, w2_ref, b2_ref,
                   q_out_ref, cols_ref, cnt_ref, row_ref, col_ref, *,
                   T: int, C: int, Cd: int, heads: int, mlp_dim: int,
                   eps: float, P: int, c4: int, up_eps: float, W: int,
                   nm: int, thr: float, off: float, m_lo: int):
    f32 = jnp.float32
    bf = src_ref.dtype
    TP = _TP
    PT = P * TP
    C8 = (wh3_ref.shape[0] // nm) // 8      # = C // 8
    HL = wh3_ref.shape[1]
    N = src_ref.shape[0]

    def nn(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def nt(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    q, keys = _twt_compute(
        src_ref, tok_ref, k1_ref, v1_ref, qi1_ref, pewk2_ref, pewq2_ref,
        pewkf_ref, w256_ref, w128_ref, wfc2_ref, bias_ref, bmlp_ref,
        T=T, C=C, Cd=Cd, heads=heads, mlp_dim=mlp_dim, eps=eps, P=P)
    q_out_ref[0] = q

    # hypernetwork MLPs: every selected head on every token row via the
    # block-diagonal packs (the per-row head selection happens below)
    h = jnp.maximum(nn(q, wh1_ref[:]) + bh_ref[0:1], 0.0).astype(bf)
    h = jnp.maximum(nn(h, wh2_ref[:]) + bh_ref[1:2], 0.0).astype(bf)
    h3 = (nn(h, wh3_ref[:])
          + bh_ref[2:3, :HL]).astype(bf)    # [PT, HL], cols (m, c8)

    L = nm * 16
    # constants for the per-prompt hbd^T construction
    keep = (jax.lax.broadcasted_iota(jnp.int32, (L, HL), 0) // 16
            == jax.lax.broadcasted_iota(jnp.int32, (L, HL), 1) // C8
            ).astype(bf)                    # row (m,e') keeps segment m
    etile = (jax.lax.broadcasted_iota(jnp.int32, (HL, 2 * C), 0) % C8
             == jax.lax.broadcasted_iota(jnp.int32, (HL, 2 * C), 1) % C8
             ).astype(bf)                   # lane c8 -> every (e, c8)
    emask = (jax.lax.broadcasted_iota(jnp.int32, (L, 2 * C), 0) % 16
             == jax.lax.broadcasted_iota(jnp.int32, (L, 2 * C), 1) // C8
             ).astype(f32)                  # (m,e') vs (e,c8): e' == e

    for pi in range(P):
        # rows of h3 holding this prompt's selected mask tokens: token
        # row for the m-th selected head is pi*TP + 1 + m_lo + m
        ri = jax.lax.broadcasted_iota(jnp.int32, (L, PT), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (L, PT), 1)
        R = (ci == pi * TP + 1 + m_lo + ri // 16).astype(bf)
        G = nn(R, h3).astype(bf)            # [L, HL] row (m,e') = hyper row
        G = (G * keep).astype(bf)
        hbdT = (nn(G, etile) * emask).astype(bf)   # [L, 2C]

        u2 = _upscale_core(keys[pi], w1_ref, b1_ref, lns_ref, lnb_ref,
                           w2_ref, b2_ref, c4=c4, eps=up_eps)  # [N, 2C]
        logits = nt(u2, hbdT)               # [N, L] f32
        cols_ref[0, pi] = logits.astype(cols_ref.dtype)

        cnt, row_acc, col_acc = _stats_of_block(
            logits, base_row=0, W=W, nm=nm, thr=thr, off=off,
            H4=row_ref.shape[-1], W4=col_ref.shape[-1])
        cnt_ref[0, pi] = cnt
        row_ref[0, pi] = row_acc
        col_ref[0, pi] = col_acc


def decode_shapes_ok(C: int, Cd: int, heads: int, depth: int, T: int,
                     N: int, nm: int) -> bool:
    """Shape-only eligibility for the decode megakernel: the TWT layout
    constraints plus the upscale/stats lane constraints."""
    return (heads * _TP == 128 and depth == 2 and T <= _TP
            and C % 128 == 0 and Cd % 128 == 0 and Cd // heads >= 8
            and C // heads >= 8 and N % 512 == 0 and 1 <= nm <= 8
            # hypernet pack: wh3's padded lane width must fit in nm*C rows
            and nm * C >= -(-nm * (C // 8) // 128) * 128)


def decode_fused_supported(C: int, Cd: int, heads: int, depth: int, T: int,
                           N: int, nm: int) -> bool:
    """The megakernel engages for SAM production shapes on a real TPU."""
    from ullsam_tpu.ops.pallas import backend_ok
    return backend_ok() and decode_shapes_ok(C, Cd, heads, depth, T, N, nm)


def fused_decode_masks(tw: dict, up_views, hyper_packed,
                       image_embedding: Array, image_pe: Array,
                       tokens: Array, *, heads: int, mlp_dim: int,
                       eps: float, W: int, nm: int, thr: float, off: float,
                       m_lo: int, interpret: bool = False):
    """One-dispatch per-prompt SAM decode: TwoWayTransformer + hypernet
    MLPs + 4x upscale + hypernet contraction + mask statistics
    (transformer.py:16-184, mask_decoder.py:53-69,112-148), with the
    refined per-prompt image keys VMEM-resident — they never touch HBM.

    up_views: mask_decoder._upscale_weight_views output;
    hyper_packed: pack_hyper_mlps output for the SELECTED heads (m_lo =
    first selected mask-token index, selection must be contiguous).
    Returns (q [B, T, C], cols [B, N, nm*16] in block-column layout,
    counts [B, 8, 128] f32 hi/lo pixel counts, row_any [B, 8, 4H],
    col_any [B, 8, 4W] occupancy bitmaps).
    """
    B, T, C = tokens.shape
    (src, toks, k1, v1, qi1, pewk2, pewq2, pewkf,
     w256, w128, wfc2, bias, bmlp, Cd) = _twt_prologue(
        tw, image_embedding, image_pe, tokens, mlp_dim)
    N = src.shape[0]
    H = N // W
    dtype = src.dtype
    w1c, b1t, lns, lnb, w2bd, b2t = up_views
    wh1, wh2, wh3, bh = hyper_packed

    want = int(os.environ.get("ULLSAM_DECODE_P", "1"))
    P = max(p for p in (1, 2, 4, 8) if p <= max(want, 1) and B % p == 0)
    if P > 1:
        toks = toks.reshape(B // P, P * _TP, C)
    nprog = B // P

    kernel = functools.partial(
        _decode_kernel, T=T, C=C, Cd=Cd, heads=heads, mlp_dim=mlp_dim,
        eps=eps, P=P, c4=C // 4, up_eps=1e-6, W=W, nm=nm, thr=thr,
        off=off, m_lo=m_lo)
    const = lambda b: (0, 0)  # noqa: E731
    q_out, cols, counts, rowany, colany = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((N, C), const),
            pl.BlockSpec((1, P * _TP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((N, Cd), const),
            pl.BlockSpec((N, Cd), const),
            pl.BlockSpec((N, Cd), const),
            pl.BlockSpec((N, Cd), const),
            pl.BlockSpec((N, Cd), const),
            pl.BlockSpec((N, Cd), const),
            pl.BlockSpec(w256.shape, const),
            pl.BlockSpec(w128.shape, const),
            pl.BlockSpec(wfc2.shape, const),
            pl.BlockSpec(bias.shape, const),
            pl.BlockSpec(bmlp.shape, const),
            pl.BlockSpec(wh1.shape, const),
            pl.BlockSpec(wh2.shape, const),
            pl.BlockSpec(wh3.shape, const),
            pl.BlockSpec(bh.shape, const),
            pl.BlockSpec(w1c.shape, const),
            pl.BlockSpec(b1t.shape, const),
            pl.BlockSpec(lns.shape, const),
            pl.BlockSpec(lnb.shape, const),
            pl.BlockSpec(w2bd.shape, const),
            pl.BlockSpec(b2t.shape, const),
        ],
        out_specs=(
            pl.BlockSpec((1, P * _TP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, P, N, nm * 16), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, P, 8, 128), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, P, 8, 4 * H), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, P, 8, 4 * W), lambda b: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nprog, P * _TP, C), dtype),
            jax.ShapeDtypeStruct((nprog, P, N, nm * 16), dtype),
            jax.ShapeDtypeStruct((nprog, P, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nprog, P, 8, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((nprog, P, 8, 4 * W), jnp.float32),
        ),
        # keys + f32 upscale transients live alongside the TWT residents;
        # the cap is an allowance, not an allocation (v5e: 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(72 + 32 * max(P - 1, 0)) * 1024 * 1024),
        interpret=interpret,
    )(src, toks, k1, v1, qi1, pewk2, pewq2, pewkf,
      w256, w128, wfc2, bias, bmlp, wh1, wh2, wh3, bh,
      w1c.astype(dtype), b1t, lns, lnb, w2bd.astype(dtype), b2t)

    q_out = q_out.reshape(B, _TP, C)[:, :T]
    cols = cols.reshape(B, N, nm * 16)
    counts = counts.reshape(B, 8, 128)
    rowany = rowany.reshape(B, 8, 4 * H)
    colany = colany.reshape(B, 8, 4 * W)
    return q_out, cols, counts, rowany, colany
