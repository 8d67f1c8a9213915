"""Direct A/B of the fused TWT Pallas kernel across P (prompts/program)
and the fused upscale kernel.

Every measurement chains K reps INSIDE one jit (data-dependent carry) —
the relay adds ~1.6 ms per dispatch on a bad day, so multi-dispatch
timing loops are dispatch-bound, not device-bound.

Usage: python benchmarks/profile_twt_kernel.py [ppb] [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    leaves = jax.tree.leaves(x)
    return np.asarray(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def time_chained(fn, reps, *args, iters=3, warmup=1, chain=0):
    """fn(*args) -> pytree; chained reps inside one jit via a tiny
    data-dependent perturbation of args[chain].  Chain through a SMALL
    argument: the perturbation copies that whole tensor every rep (a
    512 MB keys carry costs ~1.25 ms/rep and swamps the kernel)."""

    @jax.jit
    def run(*a):
        def body(i, x):
            out = fn(*a[:chain], x, *a[chain + 1:])
            lead = jax.tree.leaves(out)[0]
            bump = (lead.reshape(-1)[0] * jnp.asarray(1e-8, x.dtype))
            return x + bump  # invisible in bf16, defeats DCE/overlap
        return jax.lax.fori_loop(0, reps, body, a[chain])

    for _ in range(warmup):
        sync(run(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters / reps * 1000


def main():
    ppb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from ullsam_tpu.core.config import SamConfig
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.sam import mask_decoder as MD
    from ullsam_tpu.ops.pallas import decoder as PD

    cfg = SamConfig()  # decoder dims are shared by all ViT variants
    mcfg = cfg.mask_decoder
    key = jax.random.PRNGKey(0)
    dec = cast_floating(MD.mask_decoder_init(key, mcfg), jnp.bfloat16)

    rng = np.random.RandomState(0)
    N, C = 4096, 256
    src = jnp.asarray(rng.randn(1, N, C), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, N, C), jnp.bfloat16)
    toks = jnp.asarray(rng.randn(ppb, 7, C), jnp.bfloat16)

    # relay/chip health: chained matmul at known roofline
    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    t = time_chained(lambda x: x @ x, 20, a, iters=3)
    tflops = 2 * 4096**3 / (t / 1e3) / 1e12
    print(f"health: chained 4096^3 matmul {t:.3f} ms = {tflops:.0f} TF/s "
          f"({'OK' if tflops > 150 else 'RELAY SUSPECT'})", flush=True)

    for P in (1, 2, 4, 8):
        os.environ["ULLSAM_TWT_P"] = str(P)

        def run(toks, tw, src, pe):
            return PD.fused_two_way_transformer(
                tw, src, pe, toks, heads=mcfg.transformer_num_heads,
                mlp_dim=mcfg.transformer_mlp_dim, eps=mcfg.ln_eps)

        try:
            t = time_chained(run, reps, toks, dec["transformer"], src, pe)
            print(f"TWT kernel P={P}: {t:8.2f} ms  ({ppb} prompts)",
                  flush=True)
        except Exception as e:
            print(f"TWT kernel P={P}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    keys = jnp.asarray(rng.randn(ppb, N, C), jnp.bfloat16)
    hyper = jnp.asarray(rng.randn(ppb, 3, C // 8), jnp.bfloat16)
    w1c, b1t, lns, lnb, w2bd, b2t = MD._upscale_weight_views(dec["upscale"])

    def up(keys, hyper):
        return PD.fused_upscale_hypernet(keys, hyper, w1c, b1t, lns, lnb,
                                         w2bd, b2t)

    print(f"upscale kernel: "
          f"{time_chained(up, reps, keys, hyper, chain=1):8.2f} ms",
          flush=True)

    def upstats(keys, hyper):
        return PD.fused_upscale_hypernet_stats(
            keys, hyper, w1c, b1t, lns, lnb, w2bd, b2t,
            thr=0.0, off=1.0, W=64, nm=3)

    print(f"upscale+stats:  "
          f"{time_chained(upstats, reps, keys, hyper, chain=1):8.2f} ms",
          flush=True)


def bench_decode_megakernel(ppb=256, reps=10):
    """Time fused_decode_masks at AMG production shapes."""
    from ullsam_tpu.core.config import SamConfig
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.sam import mask_decoder as MD
    from ullsam_tpu.ops.pallas import decoder as PD

    cfg = SamConfig()
    mcfg = cfg.mask_decoder
    dec = cast_floating(MD.mask_decoder_init(jax.random.PRNGKey(0), mcfg),
                        jnp.bfloat16)
    rng = np.random.RandomState(0)
    N, C = 4096, 256
    src = jnp.asarray(rng.randn(1, N, C), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, N, C), jnp.bfloat16)
    toks = jnp.asarray(rng.randn(ppb, 7, C), jnp.bfloat16)
    views = MD._upscale_weight_views(dec["upscale"])
    packed = PD.pack_hyper_mlps([dec["hyper_mlps"][i] for i in (1, 2, 3)],
                                dtype=jnp.bfloat16)

    def run(toks, tw, src, pe):
        return PD.fused_decode_masks(
            tw, views, packed, src, pe, toks,
            heads=mcfg.transformer_num_heads,
            mlp_dim=mcfg.transformer_mlp_dim, eps=mcfg.ln_eps,
            W=64, nm=3, thr=0.0, off=1.0, m_lo=1)

    for P in (1, 2, 4):
        os.environ["ULLSAM_DECODE_P"] = str(P)
        try:
            t = time_chained(run, reps, toks, dec["transformer"], src, pe)
            print(f"decode megakernel P={P}: {t:8.2f} ms ({ppb} prompts)",
                  flush=True)
        except Exception as e:
            print(f"decode megakernel P={P}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    if "--mega" in sys.argv:
        bench_decode_megakernel()
    else:
        main()
