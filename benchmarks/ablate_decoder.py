"""Ablate suspected VPU hot spots in the fused decoder kernels by
monkeypatching transcendentals before trace time, then timing the (now
numerically wrong) kernels.  Timing-only experiment — never run this in a
process that produces real outputs.

Usage: python benchmarks/ablate_decoder.py
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


def main():
    ppb, reps = 256, 10
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
    keys = jnp.asarray(rng.randn(ppb, N, C), jnp.bfloat16)
    hyper = jnp.asarray(rng.randn(ppb, 3, C // 8), jnp.bfloat16)
    w1c, b1t, lns, lnb, w2bd, b2t = MD._upscale_weight_views(dec["upscale"])

    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    t = time_chained(lambda x: x @ x, 20, a, iters=3)
    print(f"health: {2 * 4096**3 / (t / 1e3) / 1e12:.0f} TF/s", flush=True)

    real_gelu = PD._gelu
    real_exp = jnp.exp
    real_tanh = jnp.tanh

    def up(keys, hyper):
        return PD.fused_upscale_hypernet(keys, hyper, w1c, b1t, lns, lnb,
                                         w2bd, b2t)

    def twt(toks, tw, src, pe):
        return PD.fused_two_way_transformer(
            tw, src, pe, toks, heads=mcfg.transformer_num_heads,
            mlp_dim=mcfg.transformer_mlp_dim, eps=mcfg.ln_eps)

    def run_case(name, fn, *args, patches=()):
        try:
            for obj, attr, val in patches:
                setattr(obj, attr, val)
            t = time_chained(fn, reps, *args)
            print(f"  {name:28s} {t:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name:28s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        finally:
            PD._gelu = real_gelu
            jnp.exp = real_exp
            jnp.tanh = real_tanh
            for obj, attr, val in restores:
                setattr(obj, attr, val)

    cheap_exp = lambda x: x * 0.5 + 1.0          # noqa: E731
    relu = lambda x: jnp.maximum(x, 0)           # noqa: E731
    # baseline values for every attr any case patches (restored after
    # each case so a patch never leaks into the next one)
    restores = [(PD, "_stats_of_block", PD._stats_of_block),
                (PD, "_upscale_core", PD._upscale_core)]

    print("upscale kernel:", flush=True)
    run_case("full", up, keys, hyper)
    run_case("gelu->relu", up, keys, hyper,
             patches=[(PD, "_gelu", relu)])
    run_case("gelu->identity", up, keys, hyper,
             patches=[(PD, "_gelu", lambda x: x)])

    print("TWT kernel (P=2):", flush=True)
    os.environ["ULLSAM_TWT_P"] = "2"
    run_case("full", twt, toks, dec["transformer"], src, pe)
    run_case("exp->poly", twt, toks, dec["transformer"], src, pe,
             patches=[(jnp, "exp", cheap_exp)])

    # upscale bf16 LN/GELU chain: keep matmuls, do the mid chain in bf16?
    # (approximated by running gelu in bf16 via a cast-free gelu)
    def gelu_bf16(x):
        inner = 0.797884 * (x + 0.044715 * (x * x * x))
        return 0.5 * x * (1.0 + jnp.tanh(inner))

    print("upscale bf16-native gelu:", flush=True)
    run_case("gelu bf16 (no f32 cast)", up, keys, hyper,
             patches=[(PD, "_gelu", gelu_bf16)])

    # ---- decode megakernel (TWT + hypernet + upscale + stats) ----
    views = MD._upscale_weight_views(dec["upscale"])
    packed = PD.pack_hyper_mlps([dec["hyper_mlps"][i] for i in (1, 2, 3)],
                                dtype=jnp.bfloat16)

    def mega(toks, tw, src, pe):
        return PD.fused_decode_masks(
            tw, views, packed, src, pe, toks,
            heads=mcfg.transformer_num_heads,
            mlp_dim=mcfg.transformer_mlp_dim, eps=mcfg.ln_eps,
            W=64, nm=3, thr=0.0, off=1.0, m_lo=1)

    real_stats = PD._stats_of_block
    real_upcore = PD._upscale_core

    def no_stats(logits, **kw):
        z = jnp.zeros((8, 128), jnp.float32)
        return z, jnp.zeros((8, kw["H4"]), jnp.float32), \
            jnp.zeros((8, kw["W4"]), jnp.float32)

    def cheap_upcore(x, w1_ref, b1_ref, lns_ref, lnb_ref, w2_ref, b2_ref,
                     *, c4, eps):
        # ONE [N, C]x[C, 2C] matmul stand-in: isolates the real upscale
        # chain's extra matmuls + LN/GELU from the logits contraction
        return jax.lax.dot_general(
            x, w2_ref[:x.shape[-1], :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    for P in (1, 2):
        os.environ["ULLSAM_DECODE_P"] = str(P)
        print(f"decode megakernel (P={P}):", flush=True)
        run_case("full", mega, toks, dec["transformer"], src, pe)
        run_case("exp->poly (all softmax)", mega, toks, dec["transformer"],
                 src, pe, patches=[(jnp, "exp", cheap_exp)])
        run_case("stats->zeros", mega, toks, dec["transformer"], src, pe,
                 patches=[(PD, "_stats_of_block", no_stats)])
        run_case("upscale->1matmul", mega, toks, dec["transformer"], src,
                 pe, patches=[(PD, "_upscale_core", cheap_upcore)])
        run_case("gelu->relu", mega, toks, dec["transformer"], src, pe,
                 patches=[(PD, "_gelu", relu)])
        PD._stats_of_block = real_stats
        PD._upscale_core = real_upcore


if __name__ == "__main__":
    main()
