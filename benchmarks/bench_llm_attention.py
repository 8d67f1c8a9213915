"""XLA gqa_attention vs Pallas llm_flash_attention at training shapes.

The S >= 2048 dispatch gate in internlm2_forward came from a round-2
sweep; re-measure whenever either path changes. Forward AND forward+grad
(the training path runs both under the attention-inner checkpoint).

Usage: python benchmarks/bench_llm_attention.py [S ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache
from ullsam_tpu.core.config import internlm2_1_8b
from ullsam_tpu.models.internlm2.model import gqa_attention, causal_mask
from ullsam_tpu.ops.pallas.flash_attention import llm_flash_attention

enable_compilation_cache()


def timeit(fn, args, reps=8, iters=3):
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


def main(lengths):
    cfg = internlm2_1_8b()
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    rng = np.random.RandomState(0)
    for S in lengths:
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.bfloat16)
        q, k, v = mk(1, S, nh, hd), mk(1, S, nkv, hd), mk(1, S, nkv, hd)
        am = jnp.ones((1, S), jnp.int32)
        mask = causal_mask(am, S, S)
        seg = am

        xla_f = lambda q, k, v: gqa_attention(q, k, v, mask, cfg)
        fl_f = lambda q, k, v: llm_flash_attention(
            q, k, v, seg, seg, num_kv_heads=nkv, causal=True)

        def gx(q, k, v):
            return jax.grad(lambda a: jnp.sum(xla_f(a, k, v)
                                              .astype(jnp.float32)))(q)

        def gf(q, k, v):
            return jax.grad(lambda a: jnp.sum(fl_f(a, k, v)
                                              .astype(jnp.float32)))(q)

        tx = timeit(xla_f, (q, k, v))
        tf = timeit(fl_f, (q, k, v))
        txg = timeit(gx, (q, k, v))
        tfg = timeit(gf, (q, k, v))
        print(f"S={S:5d}: fwd xla {tx:6.2f}  flash {tf:6.2f} ms | "
              f"fwd+dq xla {txg:6.2f}  flash {tfg:6.2f} ms", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1088, 1536, 2048])
