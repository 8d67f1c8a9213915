"""MXU rate vs dot shape in a Pallas grid.

Times ONE dot of shape [M,K]@[K,N] per program over a grid, reporting
achieved TF/s on UNPADDED flops.  The rep-to-rep dependence is chained
through the SMALL weight operand — chaining through the big input (as the
first version did) added a full input-tensor copy per rep (~1.25 ms for
512 MB) and swamped the kernel.

Usage: python benchmarks/ablate_mxu_shapes.py
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
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def time_wchained(fn, reps, x, w, iters=5, warmup=2):
    """fn(x, w) -> out; dependence chained through w (small)."""

    @jax.jit
    def run(x, w0):
        def body(i, w):
            out = fn(x, w)
            bump = (out.reshape(-1)[0] * jnp.asarray(1e-8, w.dtype))
            return w + bump
        return jax.lax.fori_loop(0, reps, body, w0)

    for _ in range(warmup):
        sync(run(x, w))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(x, w)
    sync(r)
    return (time.perf_counter() - t0) / iters / reps * 1000


def build(M, K, N, nprog):
    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @jax.jit
    def fn(x, w):
        return pl.pallas_call(
            kernel,
            grid=(nprog,),
            in_specs=[
                pl.BlockSpec((1, M, K), lambda i: (i, 0, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nprog, M, N), x.dtype),
        )(x, w)
    return fn


def main():
    rng = np.random.RandomState(0)
    nprog = 512

    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    t = time_wchained(lambda x, w: x @ w, 20, a, a)
    print(f"health: {2 * 4096**3 / (t / 1e3) / 1e12:.0f} TF/s", flush=True)

    cases = [
        # logits dot family: K=512, vary N
        (512, 512, 48), (512, 512, 128), (512, 512, 256), (512, 512, 512),
        # transposed logits: narrow M instead
        (48, 512, 512), (128, 512, 512),
        # u1/u2 dots and transposes
        (512, 256, 256), (256, 256, 512),
        (512, 256, 512), (512, 512, 256),
        # K sensitivity
        (512, 128, 128), (512, 128, 256), (4096, 128, 128),
        (2048, 256, 128), (2048, 256, 256),
    ]
    for (M, K, N) in cases:
        x = jnp.asarray(rng.randn(nprog, M, K), jnp.bfloat16)
        w = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
        try:
            t = time_wchained(build(M, K, N, nprog), 20, x, w)
            tf = 2 * M * K * N * nprog / (t / 1e3) / 1e12
            print(f"  [{M:5d},{K:4d}]@[{K:4d},{N:4d}]  {t:7.3f} ms "
                  f"{tf:7.1f} TF/s  ({t/nprog*1e3:6.2f} us/prog)",
                  flush=True)
        except Exception as e:
            print(f"  [{M},{K}]@[{K},{N}] FAILED {str(e)[:80]}", flush=True)

    t = time_wchained(lambda x, w: x @ w, 20, a, a)
    print(f"health (end): {2 * 4096**3 / (t / 1e3) / 1e12:.0f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
