"""A/B the Pallas W8A16 decode matmul vs the XLA int8 path on real decode
shapes (InternLM2-1.8B, b8 single-token step).

Usage: python benchmarks/microbench_int8_matmul.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache
from ullsam_tpu.ops.pallas.int8_matmul import w8a16_matmul

enable_compilation_cache()


def timeit(fn, *args, iters=50):
    r = fn(*args)
    np.asarray(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main(iters=50):
    rng = np.random.RandomState(0)
    # decode-path shapes (hidden 2048, ffn 8192, qkv 4096, vocab head)
    shapes = [("wqkv", 8, 2048, 4096), ("wo", 8, 2048, 2048),
              ("w13", 8, 2048, 8192), ("w2", 8, 8192, 2048),
              ("head", 8, 2048, 92544)]
    for name, M, K, N in shapes:
        x = jnp.asarray(rng.randn(M, K) * 0.1, jnp.bfloat16)
        qw = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
        qs = jnp.asarray(rng.rand(N) * 0.01 + 1e-3, jnp.float32)

        xla = jax.jit(lambda a, w, s: (jnp.dot(
            a, w.astype(a.dtype), preferred_element_type=jnp.float32) * s
        ).astype(a.dtype))
        bn = next(b for b in (512, 256, 128) if N % b == 0)
        pal = jax.jit(lambda a, w, s: w8a16_matmul(
            a, w, s, block_n=bn).astype(a.dtype))

        t_x = timeit(xla, x, qw, qs, iters=iters)
        t_p = timeit(pal, x, qw, qs, iters=iters)
        # roofline: int8 weight bytes / ~700 GB/s usable v5e HBM
        roof = K * N / 700e9 * 1e3
        print(f"{name:5s} [{M}x{K}x{N}]  xla {t_x:7.3f} ms  "
              f"pallas {t_p:7.3f} ms  int8-roofline {roof:6.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
