"""MXU/VPU ablation of the ViT global flash kernel on the real TPU.

Copies _vit_kernel with feature flags so each cost component can be
disabled for TIMING (outputs are numerically wrong when a stage is off):
  bias   — the per-tile rel-pos one-hot selection matmul + add
  exp    — the online-softmax exp/max/rescale chain (replaced with a
           cheap linear rescale so data deps survive)
Usage: python benchmarks/ablate_global_flash.py [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ullsam_tpu.utils.cache import enable_compilation_cache
from ullsam_tpu.ops.pallas.flash_attention import _bias_select, NEG_INF

enable_compilation_cache()


def _kernel(q_ref, k_ref, v_ref, rhw_ref, o_ref, m_scr, l_scr, acc_scr,
            *, kh, kw, block_k, use_bias, use_exp, ilp=1, bf16_logits=False):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    block_q = q_ref.shape[1]
    h = block_q // ilp
    for s in range(ilp):
        sl = slice(s * h, (s + 1) * h)
        q = q_ref[0, sl]
        k = k_ref[0]
        ldt = jnp.bfloat16 if bf16_logits else jnp.float32
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=ldt)

        if use_bias:
            rows_per_tile = block_k // kw
            rhw = rhw_ref[0, sl]
            hsel_rows = jax.lax.broadcasted_iota(
                jnp.int32, (kh + kw, block_k), 0)
            kj = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, block_k), 1)
            h_onehot = hsel_rows == (ik * rows_per_tile + kj // kw)
            w_onehot = hsel_rows == (kh + kj % kw)
            logits = (logits.astype(jnp.float32)
                      + _bias_select(rhw, h_onehot | w_onehot, q_ref.dtype))

        if use_exp:
            m_prev = m_scr[sl, 0:1]
            m_cur = jnp.max(logits, axis=-1, keepdims=True).astype(jnp.float32)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits.astype(jnp.float32) - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_scr[sl, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[sl] = acc_scr[sl] * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[sl] = jnp.broadcast_to(m_new, (h, m_scr.shape[1]))
            l_scr[sl] = jnp.broadcast_to(l_new, (h, l_scr.shape[1]))
        else:
            p = logits.astype(jnp.float32) * 1e-4
            l_new = jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[sl] = acc_scr[sl] + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            l_scr[sl] = jnp.broadcast_to(l_new, (h, l_scr.shape[1]))

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, 0:1], 1e-6)
                    ).astype(o_ref.dtype)


def build(q, k, v, rel_hw, kh, kw, block_q, block_k, use_bias, use_exp,
          ilp=1, bf16_logits=False):
    B, N, D = q.shape
    grid = (B, N // block_q, N // block_k)
    kernel = functools.partial(_kernel, kh=kh, kw=kw, block_k=block_k,
                               use_bias=use_bias, use_exp=use_exp,
                               ilp=ilp, bf16_logits=bf16_logits)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, kh + kw),
                         lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )(q, k, v, rel_hw)


def timeit(fn, args, reps, iters=3):
    @jax.jit
    def run(args):
        def body(i, a):
            out = fn(*a)
            bump = out.reshape(-1)[0] * jnp.asarray(1e-8, a[0].dtype)
            return (a[0] + bump,) + a[1:]
        return jax.lax.fori_loop(0, reps, body, args)

    r = run(args)
    np.asarray(jnp.sum(r[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(args)
    np.asarray(jnp.sum(r[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / reps * 1000


def main(reps=8):
    N, KH, KW, bnh, hd = 4096, 64, 64, 16, 80
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.bfloat16)
    q, k, v = mk(bnh, N, hd), mk(bnh, N, hd), mk(bnh, N, hd)
    rhw = jnp.asarray(rng.randn(bnh, N, KH + KW) * 0.1, jnp.float32)

    for bq, bk in ((1024, 1024),):
        for name, kw_ in (("full", {}),
                          ("full-ilp2", dict(ilp=2)),
                          ("full-ilp4", dict(ilp=4)),
                          ("full-bf16log", dict(bf16_logits=True)),
                          ("ilp2-bf16log", dict(ilp=2, bf16_logits=True)),
                          ("mm-ilp2", dict(ilp=2, use_bias=False,
                                           use_exp=False))):
            ub = kw_.pop("use_bias", True)
            ue = kw_.pop("use_exp", True)
            fn = lambda a, b, c, d: build(a, b, c, d, KH, KW, bq, bk, ub,
                                          ue, **kw_)
            try:
                t = timeit(fn, (q, k, v, rhw), reps)
                print(f"bq={bq} bk={bk} {name:13s} {t:6.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bq={bq} bk={bk} {name:13s} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
