"""Fused W8A16 matmul kernel for weight-bandwidth-bound LLM decode.

Single-chip decode streams every weight once per step; the XLA int8 path
(`jnp.dot(x, qweight.astype(bf16)) * qscale`) leaves it to the compiler
whether the int8->bf16 convert fuses into the dot's operand stream or
materializes a bf16 copy (2x extra traffic when it doesn't, measured as
~1.5-2 ms/step of dequant overhead at b8 — round-4 trace). This kernel
makes the good schedule explicit: the int8 tile is loaded once into
VMEM, converted in-register, dotted against the resident activations,
and the per-output-channel scale applies on the f32 accumulator before
the single [M, bn] write.

Replaces the hot matmuls of the decode loop the reference runs in torch
(/root/reference/modeling/modeling_internlm2.py:383-388 and the
attention/MLP projections it feeds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _w8a16_kernel(x_ref, qw_ref, qs_ref, o_ref):
    w = qw_ref[:].astype(x_ref.dtype)             # int8 -> act dtype, in VMEM
    acc = jax.lax.dot_general(x_ref[:], w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = acc * qs_ref[0].astype(jnp.float32)


def w8a16_matmul(x: Array, qweight: Array, qscale: Array,
                 block_n: int = 512, interpret: bool = False) -> Array:
    """x [M, K] bf16/f32 @ qweight [K, N] int8 * qscale [N] -> [M, N] f32.

    Grid over N tiles only: K stays whole per tile (decode K <= 8192 and
    an int8 [K, block_n] tile is <= 4 MB), so each weight byte is read
    exactly once and there is no K-accumulation state.
    """
    M, K = x.shape
    K2, N = qweight.shape
    assert K == K2 and qscale.shape == (N,)
    assert N % block_n == 0, (N, block_n)
    qs2 = qscale.reshape(1, N).astype(jnp.float32)
    return pl.pallas_call(
        _w8a16_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, qweight, qs2)
