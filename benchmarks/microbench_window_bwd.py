"""A/B the Pallas window-attention backward vs the XLA-math vjp at the
flagship train shapes (ViT-B 1024^2: 25 windows of 14x14, nh=12).

Usage: python benchmarks/microbench_window_bwd.py [vit_b|vit_h] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache
from ullsam_tpu.ops.pallas import flash_attention as FA

enable_compilation_cache()


def timeit(fn, *args, iters=20):
    r = fn(*args)
    np.asarray(sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(r)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(r)))
    return (time.perf_counter() - t0) / iters * 1000


def main(variant="vit_b", iters=20):
    if variant == "vit_b":
        nh, hd, k = 12, 64, 14
        B = 25  # windows per image
    else:
        nh, hd, k = 16, 80, 14
        B = 25
    N = k * k
    HP = FA._HP
    rng = np.random.RandomState(0)
    qkvp = jnp.asarray(rng.randn(B, N, 3 * nh * HP) * 0.1, jnp.bfloat16)
    rhf = jnp.asarray(rng.randn(HP, k * k) * 0.1, jnp.float32)
    rwf = jnp.asarray(rng.randn(HP, k * k) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(B, N, nh * HP) * 0.1, jnp.bfloat16)

    pal = jax.jit(lambda a, b, c, gg: FA._vit_window_packed_bwd_impl(
        a, b, c, gg, nh, hd, k, k))

    def xla(a, b, c, gg):
        _, vjp = jax.vjp(
            lambda p, q, r: FA._window_packed_xla(p, q, r, nh, hd, k, k),
            a, b, c)
        return vjp(gg)
    xla = jax.jit(xla)

    fwd = jax.jit(lambda a, b, c: FA.vit_window_attention_packed(
        a, b, c, nh, hd, k, k))

    t_f = timeit(fwd, qkvp, rhf, rwf, iters=iters)
    t_p = timeit(pal, qkvp, rhf, rwf, g, iters=iters)
    t_x = timeit(xla, qkvp, rhf, rwf, g, iters=iters)
    print(f"{variant}: {B} windows N={N} nh={nh}")
    print(f"  fwd kernel        {t_f:7.3f} ms")
    print(f"  bwd pallas        {t_p:7.3f} ms")
    print(f"  bwd xla vjp       {t_x:7.3f} ms")
    # numerics cross-check on-device
    got = pal(qkvp, rhf, rwf, g)
    ref = xla(qkvp, rhf, rwf, g)
    for name, a, b in zip(("dqkvp", "drhf", "drwf"), got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        print(f"  {name} rel err {err:.2e}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "vit_b",
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)
