"""Structural ablations of the fused upscale kernel: which stage costs the
7.5 ms?  Variant kernels (numerically wrong where stages are stubbed) are
timed only.  Candidates informed by MXU arithmetic:

  * the two f32 LN-stat matmuls run at the MXU's f32 rate (~1/8 bf16) and
    pad 4 lanes -> 128: possibly ~half the kernel.
  * hi/lo bf16 split recovers ~f32 accuracy at bf16 rate (pool is exact).
  * elementwise LN-apply + 2 GELUs: ~5M VPU ops per 512-row block.

Usage: python benchmarks/ablate_upscale.py
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

from ullsam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    leaves = jax.tree.leaves(x)
    return np.asarray(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def time_chained(fn, reps, *args, iters=3, warmup=1):
    @jax.jit
    def run(x0, *rest):
        def body(i, x):
            out = fn(x, *rest)
            lead = jax.tree.leaves(out)[0]
            bump = (lead.reshape(-1)[0] * jnp.asarray(1e-8, x.dtype))
            return x + bump
        return jax.lax.fori_loop(0, reps, body, x0)

    for _ in range(warmup):
        sync(run(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters / reps * 1000


def _gelu(x):
    f = x.astype(jnp.float32)
    inner = 0.7978845608028654 * (f + 0.044715 * (f * f * f))
    return (0.5 * f * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def make_kernel(mode, c4, eps):
    if mode.startswith("ilp"):
        # interleave N independent row-half chains so Mosaic can overlap
        # one half's VPU (LN apply + GELUs) with the other's MXU matmuls
        nsplit = int(mode[3:])

        def kernel(keys_ref, hbd_ref, w1_ref, b1_ref, lns_ref, lnb_ref,
                   w2_ref, b2_ref, o_ref):
            x = keys_ref[0]
            TN = x.shape[0]
            hh = TN // nsplit
            hbd = hbd_ref[0]
            for i in range(nsplit):
                xs = x[i * hh:(i + 1) * hh]
                u1 = jax.lax.dot_general(
                    xs, w1_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + b1_ref[:]
                C = u1.shape[-1]
                gi = jax.lax.broadcasted_iota(jnp.int32, (C, 4), 0) // c4
                gj = jax.lax.broadcasted_iota(jnp.int32, (C, 4), 1)
                pool = (gi == gj).astype(jnp.float32) / c4
                expand = jnp.transpose((gi == gj).astype(jnp.float32))
                d = functools.partial(
                    jax.lax.dot_general,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m1 = d(u1, pool)
                m2 = d(u1 * u1, pool)
                var = jnp.maximum(m2 - m1 * m1, 0.0)
                inv = jax.lax.rsqrt(var + eps)
                u1 = (u1 - d(m1, expand)) * d(inv, expand) * lns_ref[:] \
                    + lnb_ref[:]
                u1 = _gelu(u1).astype(x.dtype)
                u2 = d(u1, w2_ref[:]) + b2_ref[:]
                u2 = _gelu(u2).astype(x.dtype)
                o_ref[0, i * hh:(i + 1) * hh] = d(u2, hbd).astype(o_ref.dtype)
        return kernel

    def kernel(keys_ref, hbd_ref, w1_ref, b1_ref, lns_ref, lnb_ref,
               w2_ref, b2_ref, o_ref):
        x = keys_ref[0]
        u1 = jax.lax.dot_general(
            x, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[:]
        C = u1.shape[-1]
        if mode in ("full", "stats_bf16", "stats_hilo"):
            gi = jax.lax.broadcasted_iota(jnp.int32, (C, 4), 0) // c4
            gj = jax.lax.broadcasted_iota(jnp.int32, (C, 4), 1)
            pool = (gi == gj).astype(jnp.float32) / c4
            expand = jnp.transpose((gi == gj).astype(jnp.float32))

            def stat(v):
                if mode == "full":
                    return jax.lax.dot_general(
                        v, pool, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if mode == "stats_bf16":
                    return jax.lax.dot_general(
                        v.astype(jnp.bfloat16), pool.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                hi = v.astype(jnp.bfloat16)
                lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                pb = pool.astype(jnp.bfloat16)
                d = functools.partial(
                    jax.lax.dot_general,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return d(hi, pb) + d(lo, pb)

            m1 = stat(u1)
            m2 = stat(u1 * u1)
            var = jnp.maximum(m2 - m1 * m1, 0.0)
            inv = jax.lax.rsqrt(var + eps)
            ef = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mean_full = ef(m1, expand)
            inv_full = ef(inv, expand)
            u1 = (u1 - mean_full) * inv_full * lns_ref[:] + lnb_ref[:]
            u1 = _gelu(u1).astype(x.dtype)
        elif mode == "no_ln":
            u1 = _gelu(u1).astype(x.dtype)
        elif mode == "no_elementwise":
            u1 = u1.astype(x.dtype)
        u2 = jax.lax.dot_general(
            u1, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[:]
        if mode != "no_elementwise":
            u2 = _gelu(u2)
        u2 = u2.astype(x.dtype)
        o_ref[0] = jax.lax.dot_general(
            u2, hbd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
    return kernel


def build(mode, block_n=512, eps=1e-6):
    @functools.partial(jax.jit, static_argnames=())
    def fn(keys, hbd, w1c, b1t, lns, lnb, w2bd, b2t):
        B, N, C = keys.shape
        nm16 = hbd.shape[-1]
        kernel = make_kernel(mode, C // 4, eps)
        return pl.pallas_call(
            kernel,
            grid=(B, N // block_n),
            in_specs=[
                pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0)),
                pl.BlockSpec((1, 2 * C, nm16), lambda b, n: (b, 0, 0)),
                pl.BlockSpec((C, C), lambda b, n: (0, 0)),
                pl.BlockSpec((1, C), lambda b, n: (0, 0)),
                pl.BlockSpec((1, C), lambda b, n: (0, 0)),
                pl.BlockSpec((1, C), lambda b, n: (0, 0)),
                pl.BlockSpec((C, 2 * C), lambda b, n: (0, 0)),
                pl.BlockSpec((1, 2 * C), lambda b, n: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, nm16),
                                   lambda b, n: (b, n, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, nm16), keys.dtype),
        )(keys, hbd, w1c, b1t, lns, lnb, w2bd, b2t)
    return fn


def main():
    ppb, reps = 256, 10
    rng = np.random.RandomState(0)
    N, C, nm = 4096, 256, 3
    keys = jnp.asarray(rng.randn(ppb, N, C), jnp.bfloat16)
    hbd = jnp.asarray(rng.randn(ppb, 2 * C, nm * 16), jnp.bfloat16)
    w1c = jnp.asarray(rng.randn(C, C), jnp.bfloat16)
    b1t = jnp.asarray(rng.randn(1, C), jnp.float32)
    lns = jnp.asarray(rng.randn(1, C), jnp.float32)
    lnb = jnp.asarray(rng.randn(1, C), jnp.float32)
    w2bd = jnp.asarray(rng.randn(C, 2 * C), jnp.bfloat16)
    b2t = jnp.asarray(rng.randn(1, 2 * C), jnp.float32)

    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    t = time_chained(lambda x: x @ x, 20, a, iters=3)
    print(f"health: {2 * 4096**3 / (t / 1e3) / 1e12:.0f} TF/s", flush=True)

    args = (keys, hbd, w1c, b1t, lns, lnb, w2bd, b2t)
    for mode in ("full", "ilp2", "ilp4", "no_ln",
                 "no_elementwise"):
        for bn in (512, 1024):
            try:
                t = time_chained(build(mode, bn), reps, *args)
                print(f"  {mode:16s} bn={bn:5d} {t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {mode:16s} bn={bn:5d} FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

    # numeric check: stats_hilo vs full on one prompt
    f = build("full")(*[a[:1] if a.ndim == 3 else a for a in args])
    h = build("stats_hilo")(*[a[:1] if a.ndim == 3 else a for a in args])
    d = np.abs(np.asarray(f, np.float32) - np.asarray(h, np.float32))
    print(f"stats_hilo vs full: max abs dev {d.max():.5f}", flush=True)


if __name__ == "__main__":
    main()
