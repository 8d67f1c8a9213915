"""Per-op VPU throughput on the real chip: how much do exp/tanh/div cost
relative to a mult, in f32 vs bf16?  Informs kernel transcendental budgets
(the fused decoder kernels are suspected VPU-bound on softmax/GELU).

Chained inside one jit like profile_twt_kernel (relay dispatch ~1.6 ms).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def time_op(fn, x, reps=50, iters=3):
    @jax.jit
    def run(x0):
        def body(i, x):
            y = fn(x)
            return y * jnp.asarray(1.0, y.dtype)  # keep dtype stable
        return jax.lax.fori_loop(0, reps, body, x0)

    sync(run(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(x)
    sync(r)
    return (time.perf_counter() - t0) / iters / reps * 1e3


def main():
    n = 4096
    rng = np.random.RandomState(0)
    base = rng.rand(n, n).astype(np.float32) * 0.1 + 0.5

    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(base, dt)
        elems = n * n
        print(f"--- dtype {dt.__name__} ({elems/1e6:.0f}M elems) ---")
        for name, fn in [
            ("mult", lambda v: v * v),
            ("add3", lambda v: v + v + v),
            ("exp", jnp.exp),
            ("exp2", jax.lax.exp2),
            ("tanh", jnp.tanh),
            ("rsqrt", jax.lax.rsqrt),
            ("div", lambda v: 1.0 / v),
            ("logistic", jax.nn.sigmoid),
            ("max0", lambda v: jnp.maximum(v, 0)),
            ("gelu_tanh", lambda v: 0.5 * v * (1 + jnp.tanh(
                0.797884 * (v + 0.044715 * v * v * v)))),
            ("to_f32_back", lambda v: (v.astype(jnp.float32) * 2.0
                                       ).astype(dt)),
        ]:
            t = time_op(fn, x)
            print(f"  {name:12s} {t:7.3f} ms  "
                  f"{elems / (t/1e3) / 1e9:8.1f} Gelem/s", flush=True)


if __name__ == "__main__":
    main()
