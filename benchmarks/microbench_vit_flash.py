"""Standalone fwd / fwd+bwd timing of vit_flash_attention on the real TPU.

ViT-B and ViT-H global-attention shapes (the only training consumers of
this kernel: windowed blocks take the packed-window kernel). Chained reps
inside one jit so relay round trips amortize.

Usage: python benchmarks/microbench_vit_flash.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache
from ullsam_tpu.ops.pallas.flash_attention import vit_flash_attention

enable_compilation_cache()


def timeit(fn, args, reps, iters=3):
    @jax.jit
    def run(args):
        def body(i, a):
            out = fn(*a)
            bump = out.reshape(-1)[0] * jnp.asarray(1e-8, a[0].dtype)
            return (a[0] + bump,) + a[1:]
        return jax.lax.fori_loop(0, reps, body, args)

    r = run(args)
    np.asarray(jnp.sum(r[0].astype(jnp.float32)))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(args)
    np.asarray(jnp.sum(r[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / reps * 1000


def main(reps=8):
    for name, bnh, hd in (("vit_b-global", 12, 64), ("vit_h-global", 16, 80)):
        N, KH, KW = 4096, 64, 64
        rng = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.bfloat16)
        q, k, v = mk(bnh, N, hd), mk(bnh, N, hd), mk(bnh, N, hd)
        rh, rw = mk(bnh, N, KH), mk(bnh, N, KW)

        fwd = lambda *a: vit_flash_attention(*a)
        t_f = timeit(fwd, (q, k, v, rh, rw), reps)

        def loss(*a):
            return jnp.sum(vit_flash_attention(*a).astype(jnp.float32))

        grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        fb = lambda *a: grad(*a)[0]
        t_fb = timeit(fb, (q, k, v, rh, rw), reps)
        print(f"{name}: fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
