"""Minimal full-encode timer: median of N timed passes, one number out.

Usage: python benchmarks/time_encode.py [vit_h] [iters]
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


def main(variant="vit_h", iters=7):
    cfg, params = build_sam(variant, seed=0)
    vcfg = cfg.vit
    enc = cast_floating(params, jnp.bfloat16)["image_encoder"]
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 1024, 1024, 3), jnp.bfloat16)

    @jax.jit
    def full_encode(p, im):
        return IE.image_encoder_apply(p, im, vcfg)

    # warmup (compile + one steady pass). NOTE: per-pass host syncs pay a
    # full relay round trip (~25+ ms) — time K back-to-back dispatches and
    # sync ONCE, like profile_encode.timeit.
    def run_block(k):
        for _ in range(k):
            r = full_encode(enc, img)
        np.asarray(jnp.sum(r.astype(jnp.float32)))

    run_block(2)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_block(iters)
        meds.append((time.perf_counter() - t0) / iters * 1000)
    meds.sort()
    print(f"{variant} full encode median {meds[1]:.2f} ms/pass  "
          f"(blocks: {', '.join(f'{m:.2f}' for m in meds)}, "
          f"iters/block={iters})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "vit_h",
         int(sys.argv[2]) if len(sys.argv) > 2 else 7)
