"""What matmul rate does a Pallas grid actually achieve at the fused-
upscale kernel's shapes, and does the 48-lane output tile cost anything?

Variants (all timing-only):
  xla_chain     the same u1->u2->logits chain as one XLA einsum chain
  dots_only     pallas: 3 chained dots per block, 48-lane out (the floor
                measured by ablate_upscale's no_elementwise)
  dots_pad128   same but output padded to 128 lanes
  one_dot       pallas: only the u2-sized dot ([bn,256]@[256,512])
  two_dot       u1 + u2 dots, write u2 (512 lanes out)

Usage: python benchmarks/ablate_dotrate.py
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


def nn(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def build(mode, block_n, out_lanes):
    def kernel(keys_ref, hbd_ref, w1_ref, w2_ref, o_ref):
        x = keys_ref[0]
        if mode == "one_dot":
            u2 = nn(x, w2_ref[:]).astype(x.dtype)          # [bn, 2C]
            o_ref[0] = nn(u2, hbd_ref[0]).astype(o_ref.dtype)
            return
        u1 = nn(x, w1_ref[:]).astype(x.dtype)
        u2 = nn(u1, w2_ref[:]).astype(x.dtype)
        if mode == "two_dot":
            o_ref[0] = u2[:, :o_ref.shape[-1]].astype(o_ref.dtype) \
                if o_ref.shape[-1] == u2.shape[-1] else \
                nn(u2, hbd_ref[0]).astype(o_ref.dtype)
            return
        o_ref[0] = nn(u2, hbd_ref[0]).astype(o_ref.dtype)

    @jax.jit
    def fn(keys, hbd, w1, w2):
        B, N, C = keys.shape
        return pl.pallas_call(
            kernel,
            grid=(B, N // block_n),
            in_specs=[
                pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0)),
                pl.BlockSpec((1, 2 * C, out_lanes), lambda b, n: (b, 0, 0)),
                pl.BlockSpec((C, C), lambda b, n: (0, 0)),
                pl.BlockSpec((C, 2 * C), lambda b, n: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, out_lanes),
                                   lambda b, n: (b, n, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, out_lanes), keys.dtype),
        )(keys, hbd, w1, w2)
    return fn


def main():
    ppb, reps = 256, 10
    rng = np.random.RandomState(0)
    N, C = 4096, 256
    keys = jnp.asarray(rng.randn(ppb, N, C), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(C, C), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(C, 2 * C), jnp.bfloat16)

    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    t = time_chained(lambda x: x @ x, 20, a, iters=3)
    print(f"health: {2 * 4096**3 / (t / 1e3) / 1e12:.0f} TF/s", flush=True)

    # XLA equivalent of the full chain (u1, u2 shared-weight; logits
    # batched per prompt)
    hbd_b = jnp.asarray(rng.randn(ppb, 2 * C, 48), jnp.bfloat16)

    @jax.jit
    def xla_chain(keys, hbd, w1, w2):
        u1 = jnp.einsum("bnc,cd->bnd", keys, w1,
                        preferred_element_type=jnp.float32).astype(keys.dtype)
        u2 = jnp.einsum("bnc,cd->bnd", u1, w2,
                        preferred_element_type=jnp.float32).astype(keys.dtype)
        return jnp.einsum("bnc,bcd->bnd", u2, hbd,
                          preferred_element_type=jnp.float32
                          ).astype(keys.dtype)

    t = time_chained(xla_chain, reps, keys, hbd_b, w1, w2)
    print(f"  xla_chain            {t:7.2f} ms", flush=True)

    for mode, lanes in (("dots_only", 48), ("dots_pad128", 128),
                        ("one_dot", 48), ("one_dot", 128)):
        for bn in (512, 1024, 2048):
            hbd = jnp.asarray(rng.randn(ppb, 2 * C, lanes), jnp.bfloat16)
            try:
                t = time_chained(build(mode, bn, lanes), reps,
                                 keys, hbd, w1, w2)
                print(f"  {mode:12s} lanes={lanes:3d} bn={bn:5d} "
                      f"{t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {mode:12s} lanes={lanes:3d} bn={bn:5d} FAILED "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
