"""Decode-shape int8 weight-streaming dot: convert-then-dot vs mixed dot.

The serving decode is weight-bandwidth bound; the question is whether
XLA reads int8 weights at 1 byte/weight with the convert fused into the
dot's operand stream (`w.astype(bf16)` before the dot), or whether a
native mixed-precision dot (bf16 lhs x s8 rhs) streams less. Times a
24-iteration weight-streaming scan at the flagship decode shapes.

Usage: python benchmarks/microbench_int8_dot.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L, K, N = 24, 2048, 8192  # w1-shaped: the largest decode weight slab
    rng = np.random.RandomState(0)
    w8 = jnp.asarray(rng.randint(-127, 128, (L, K, N)), jnp.int8)
    scale = jnp.asarray(rng.rand(L, N).astype(np.float32) / 127.0)
    x = jnp.asarray(rng.randn(B, K), jnp.bfloat16)

    def run_convert(x, w8, scale):
        def body(c, xs):
            w, s = xs
            y = jnp.dot(c, w.astype(c.dtype),
                        preferred_element_type=jnp.float32) * s
            return (c + y[:, :K].astype(c.dtype) * 1e-6), None

        c, _ = jax.lax.scan(body, x, (w8, scale))
        return c

    def run_mixed(x, w8, scale):
        def body(c, xs):
            w, s = xs
            y = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s
            return (c + y[:, :K].astype(c.dtype) * 1e-6), None

        c, _ = jax.lax.scan(body, x, (w8, scale))
        return c

    gb = L * K * N / 1e9
    for name, fn in [("convert-then-dot", run_convert),
                     ("mixed s8 dot", run_mixed)]:
        try:
            f = jax.jit(fn)
            r = f(x, w8, scale)
            np.asarray(jnp.sum(r.astype(jnp.float32)))
            t0 = time.perf_counter()
            it = 20
            for _ in range(it):
                r = f(x, w8, scale)
            np.asarray(jnp.sum(r.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / it
            print(f"{name:18s}: {dt*1000:7.2f} ms  "
                  f"({gb/dt:.0f} GB/s int8-weight stream)")
        except Exception as e:
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
