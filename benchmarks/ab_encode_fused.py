"""Same-process A/B of the fused ViT block kernels on the full encode.

The kernel gates (ULLSAM_FUSED_VIT_MLP / ULLSAM_FUSED_VIT_ATTN) are read
at trace time, so each variant gets its own jit wrapper traced under its
own env setting. Chained reps inside one jit avoid relay round-trips;
variants are interleaved A/B/A/B to cancel slow relay drift.

Usage: python benchmarks/ab_encode_fused.py [vit_h] [reps] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.tree import cast_floating
from ullsam_tpu.models.sam import build_sam
from ullsam_tpu.models.sam import image_encoder as IE


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg, params = build_sam(variant)
    vcfg = cfg.vit
    params = cast_floating(params["image_encoder"], jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, vcfg.img_size, vcfg.img_size, 3),
        jnp.bfloat16)

    variants = {
        "both":      ("1", "1"),
        "mlp_only":  ("1", "0"),
        "attn_only": ("0", "1"),
        "neither":   ("0", "0"),
    }
    fns = {}
    for name, (mlp, attn) in variants.items():
        os.environ["ULLSAM_FUSED_VIT_MLP"] = mlp
        os.environ["ULLSAM_FUSED_VIT_ATTN"] = attn

        def run(img, p, _cfg=vcfg, _reps=reps):
            def body(i, c):
                y = IE.image_encoder_apply(p, c, _cfg)
                return c * 0.0 + jnp.sum(y.astype(c.dtype)) * 1e-9 + c
            return jax.lax.fori_loop(0, _reps, body, img)

        fns[name] = jax.jit(run)
        sync(fns[name](x, params))  # compile under this env
        print(f"compiled {name}", flush=True)

    results = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            sync(fn(x, params))
            dt = (time.perf_counter() - t0) / reps * 1000
            results[name].append(dt)
            print(f"  round {r} {name:10s} {dt:7.2f} ms/encode", flush=True)
    print()
    for name, ts in results.items():
        print(f"{name:10s} median {np.median(ts):7.2f} ms  min {min(ts):7.2f}")


if __name__ == "__main__":
    main()
