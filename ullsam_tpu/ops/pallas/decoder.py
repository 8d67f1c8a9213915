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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gelu(x: Array) -> Array:
    """tanh-form GELU. Mosaic has no erf/erfc lowering; an erf polynomial
    (A&S 7.1.26, exp+div based) costs ~4 ms/chunk more than the VPU tanh
    intrinsic at AMG scale (805M activations/chunk). Deviation from the
    exact erf GELU is <= ~1.5e-3 absolute — inside bf16 rounding noise for
    the mask logits this kernel feeds."""
    f = x.astype(jnp.float32)
    inner = 0.7978845608028654 * (f + 0.044715 * (f * f * f))
    return (0.5 * f * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def _upscale_kernel(keys_ref, hbd_ref, w1_ref, b1_ref, lns_ref, lnb_ref,
                    w2_ref, b2_ref, o_ref, *, c4: int, eps: float):
    x = keys_ref[0]                                        # [TN, C] bf16
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
    u2 = _gelu(u2).astype(x.dtype)

    o_ref[0] = jax.lax.dot_general(
        u2, hbd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def supported(keys_shape, transformer_dim: int) -> bool:
    """Kernel engages for production shapes on a real TPU backend."""
    if jax.default_backend() not in ("tpu", "axon"):
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
