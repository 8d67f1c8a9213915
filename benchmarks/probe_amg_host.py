"""Decompose the AMG steady-state gap: device bound vs pipelined headline.

Phases timed (host wall clock):
  upload-only   : jnp.asarray of 12 distinct uint8 images + tiny sync
  prep-only     : the host-side numpy work of _process_crop (no dispatch)
  dispatch loop : generate_dense_batch's dispatch phase (defer=True)
  collect loop  : per-image stats sync + numpy postprocess + mask take
  total         : end-to-end, = bench_amg_stats's measured number

Usage: python benchmarks/probe_amg_host.py [vit_h] [n_images]
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    from ullsam_tpu.inference import amg as AM
    from ullsam_tpu.models.sam import build_sam

    cfg, params = build_sam(variant)
    gen = AM.AutomaticMaskGenerator(
        cfg, params, points_per_side=32, pred_iou_thresh=0.0,
        stability_score_thresh=0.0, box_nms_thresh=1.0, max_masks=256,
        compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    images = [(rng.rand(1024, 1024, 3) * 255).astype(np.uint8)
              for _ in range(n)]

    # warmup/compile
    masks, _ = gen.generate_dense(images[0])
    np.asarray(jnp.sum(masks, axis=(1, 2)))

    # 1) upload-only: n distinct images, sync a scalar derived from each
    t0 = time.perf_counter()
    handles = [jnp.asarray(im) for im in images]
    vals = [jnp.sum(h[::256, ::256, 0]) for h in handles]
    for v in vals:
        np.asarray(v)
    t_upload = time.perf_counter() - t0
    del handles, vals

    # 2) prep-only: the numpy side of _process_crop (no jnp calls)
    from ullsam_tpu.inference.transforms import get_preprocess_shape
    t0 = time.perf_counter()
    for im in images:
        crop = im[0:1024, 0:1024]
        get_preprocess_shape(1024, 1024, cfg.vit.img_size)
        pts = gen.point_grids[0] * np.array([1024, 1024])[None]
        gen.transform.apply_coords(pts, (1024, 1024))
    t_prep = time.perf_counter() - t0

    # 3) full pipelined run with phase timers
    t0 = time.perf_counter()
    handles2 = []
    for image in images:
        orig = image.shape[:2]
        box = [0, 0, orig[1], orig[0]]
        handles2.append((gen._process_crop(image, box, 0, orig, defer=True),
                         orig))
    t_dispatch = time.perf_counter() - t0

    t_sync0 = time.perf_counter()
    total = 0
    t_stats = t_post = 0.0
    waits = []
    for (handle, orig) in handles2:
        out, crop_box, crop_size, input_hw, max_out, pts_img, n_real = handle
        ts = time.perf_counter()
        sp = np.asarray(out["stats_packed"])  # blocks until sweep done
        te = time.perf_counter()
        waits.append(te - ts)
        t_stats += te - ts
        # numpy post (what _collect_crop does after the transfer)
        valid = sp[:, 1].astype(bool)
        slots = np.arange(max_out)[valid]
        m = jnp.take(out["masks"], jnp.asarray(slots), axis=0)
        total += int(valid.sum())
        t_post += time.perf_counter() - te
    t_collect = time.perf_counter() - t_sync0
    t_total = time.perf_counter() - t0
    first_wait = waits[0]
    print("per-image stats waits (ms):",
          " ".join(f"{w*1000:.0f}" for w in waits))

    print(f"images                 : {n}")
    print(f"upload-only            : {t_upload*1000:8.1f} ms "
          f"({t_upload/n*1000:.1f}/img)")
    print(f"prep-only (numpy)      : {t_prep*1000:8.1f} ms "
          f"({t_prep/n*1000:.1f}/img)")
    print(f"dispatch loop          : {t_dispatch*1000:8.1f} ms "
          f"({t_dispatch/n*1000:.1f}/img)")
    print(f"collect loop           : {t_collect*1000:8.1f} ms "
          f"(first wait {first_wait*1000:.1f}, stats {t_stats*1000:.1f}, "
          f"post {t_post*1000:.1f})")
    print(f"TOTAL                  : {t_total*1000:8.1f} ms "
          f"({t_total/n*1000:.2f} ms/img, "
          f"{total/t_total:.1f} masks/s)")


if __name__ == "__main__":
    main()
