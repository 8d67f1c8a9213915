"""Device-time breakdown of the full single-image AMG sweep dispatch.

Dispatches the jitted _amg_device_sweep K times back-to-back (queue depth
hides relay latency) and syncs once: wall/K ~ device ms/image. Also times
encode alone the same way; sweep - encode - 4x chunk = selection/upscale
tail.

Usage: python benchmarks/profile_sweep.py [vit_h] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from ullsam_tpu.inference import amg as AM
    from ullsam_tpu.models.sam import build_sam
    from ullsam_tpu.models.sam import sam as S

    cfg, params = build_sam(variant)
    from ullsam_tpu.core.tree import cast_floating
    params = cast_floating(params, jnp.bfloat16)
    rng = np.random.RandomState(0)
    image = jnp.asarray((rng.rand(1, 1024, 1024, 3) * 255).astype(np.uint8))
    pts = AM.build_point_grid(32) * 1024
    from ullsam_tpu.inference.transforms import ResizeLongestSide
    in_pts = jnp.asarray(ResizeLongestSide(cfg.vit.img_size).apply_coords(
        pts, (1024, 1024)), jnp.float32)

    def sweep():
        return AM._amg_device_sweep(
            params, cfg, image, in_pts, points_per_batch=256, max_out=256,
            pred_iou_thresh=0.0, stability_thresh=0.0, stability_offset=1.0,
            box_nms_thresh=1.0, input_hw=(1024, 1024), out_hw=(1024, 1024),
            n_real=1024, compute_dtype=jnp.bfloat16)

    out = sweep()
    np.asarray(out["areas"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(k):
        out = sweep()
    np.asarray(out["areas"])
    dt = (time.perf_counter() - t0) / k * 1000
    print(f"full sweep dispatch:  {dt:8.2f} ms/image")

    from ullsam_tpu.ops.resize import bilinear_resize_nhwc

    @jax.jit
    def enc(params, image):
        # matmul resize (ops/resize.py): jax.image.resize lowers to slow
        # gathers on TPU and antialiases differently (CLAUDE.md gotcha).
        # params MUST be an explicit jit argument: closing over the 2.4 GB
        # bf16 tree embeds it as HLO constants (pathological compile).
        x = bilinear_resize_nhwc(image.astype(jnp.float32), 1024, 1024)
        return S.encode_image(params, cfg,
                              S.preprocess(x, cfg).astype(jnp.bfloat16))
    e = enc(params, image)
    np.asarray(jnp.sum(e.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(k):
        e = enc(params, image)
    np.asarray(jnp.sum(e.astype(jnp.float32)))
    print(f"encode alone:         {(time.perf_counter()-t0)/k*1000:8.2f} ms")


if __name__ == "__main__":
    main()
