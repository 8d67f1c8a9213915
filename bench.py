"""Benchmark entrypoint: prints ONE JSON line for the driver.

Primary metric (BASELINE.json north star): AMG masks/sec/chip. Until the
AMG sweep lands, falls back to batched point-prompt mask decoding
throughput on SAM ViT-B (encoder amortized + decode per prompt), bf16.

vs_baseline: ratio vs the reference GPU path. The reference publishes no
numbers (BASELINE.md) and no GPU is reachable here, so the denominator is
the documented estimate REF_BASELINE_MASKS_PER_SEC (see README); treat it
as provisional until a measured reference number exists.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    """Phase progress to STDERR (stdout stays the one JSON line): when a
    run wedges on the relay, the last phase line says where."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

# Reference-path denominator for the BASELINE.json metric (ViT-H AMG
# masks/sec on the reference GPU path). Derived — not guessed — from
# reference op counts x A100 specs in docs/BASELINE_DERIVATION.md:
# the as-written fp32 path costs ~2.5-5 s/image on an A100 (encode 6.5 TF
# + decode 3.0 TF at fp32 peak, plus a 1-3 s host-side MaskData/RLE tail),
# i.e. 50-100 masks/s at our 256-committed-mask convention; 50 is the
# strongest reading of that range. Replace with a measurement if a GPU
# ever becomes reachable.
REF_BASELINE_MASKS_PER_SEC = 50.0


def bench_point_masks(n_prompts: int = 64, iters: int = 5):
    import jax
    import jax.numpy as jnp

    from ullsam_tpu.core.config import sam_vit_b
    from ullsam_tpu.models.sam import build_sam, decode_masks, encode_image
    from ullsam_tpu.models.sam import sam as S

    cfg, params = build_sam("vit_b")
    img = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 1024, 3) * 255,
                      jnp.bfloat16)

    @jax.jit
    def encode(params, img):
        return encode_image(params, cfg, S.preprocess(img, cfg))

    @jax.jit
    def decode(params, emb, coords, labels):
        masks, iou = decode_masks(params, cfg, emb,
                                  points=(coords, labels),
                                  multimask_output=True)
        return masks, iou

    coords = jnp.asarray(
        np.random.RandomState(1).rand(n_prompts, 1, 2) * 1024, jnp.float32)
    labels = jnp.ones((n_prompts, 1), jnp.int32)

    emb = encode(params, img)
    masks, iou = decode(params, emb, coords, labels)
    np.asarray(iou)  # force full execution + transfer

    t0 = time.perf_counter()
    for _ in range(iters):
        emb = encode(params, img)
        masks, iou = decode(params, emb, coords, labels)
    np.asarray(iou)
    np.asarray(masks[0, 0, :2, :2])
    dt = (time.perf_counter() - t0) / iters
    return n_prompts / dt


def _settle_relay(max_wait_s: float = 300.0):
    """Wait for the TPU relay to leave its post-process-churn degraded
    state before timing anything: a killed TPU process wedges the relay
    for 5-20 min, and numbers taken inside that window run 2-4x slow
    (measured round 3/4; the 833 masks/s r4 outlier traced to this).
    Probes a tiny op until it completes in ~interactive time."""
    import jax
    import jax.numpy as jnp

    t_start = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        np.asarray(jnp.sum(jnp.ones((256, 256))))
        dt = time.perf_counter() - t0
        if dt < 5.0:
            _log(f"relay healthy (probe {dt * 1000:.0f} ms)")
            return
        waited = time.perf_counter() - t_start
        if waited > max_wait_s:
            _log(f"relay still slow after {waited:.0f}s (probe {dt:.1f}s) "
                 "— benching anyway; treat results as suspect")
            return
        _log(f"relay degraded (probe {dt:.1f}s); settling...")
        time.sleep(20.0)


def main():
    from ullsam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    _settle_relay()
    extra = {}
    try:
        from ullsam_tpu.inference.amg import bench_amg_stats  # noqa: F401
        # median of 3 independent 12-image runs: relay-state variance on
        # single runs was ~15%; the median of three runs holds consecutive
        # driver runs within ~5% (round-2 verdict item 5). 12 images per
        # run measures STEADY-STATE pipeline throughput: the fixed cost
        # (first upload + trailing collect, ~60-120 ms) amortizes — 6-image
        # runs under-report by ~8% (measured 139.8 vs 129.5 ms/image)
        runs = []
        for i in range(3):
            _log(f"headline run {i + 1}/3 (12-image ViT-H sweep)...")
            runs.append(bench_amg_stats(variant="vit_h",
                                        iters=12)["masks_per_sec"])
            _log(f"headline run {i + 1}/3 done: {runs[-1]:.1f} masks/s")
        runs.sort()
        value = runs[1]
        metric, unit = "amg_masks_per_sec_vith", "masks/s/chip"
        # realistic production config (upstream defaults, SURVEY §2.13):
        # thresholds 0.88/0.95 + device NMS 0.7, run on closed-form
        # CALIBRATED synthetic weights (inference/calibrate.py) so the
        # IoU/stability filters and the NMS-survivor gather + selective
        # upscale path operate on a realistic mask population instead of
        # passing nothing (round-2 verdict item 4)
        _log("realistic-config run (calibrated weights, 0.88/0.95/NMS0.7)...")
        real = bench_amg_stats(variant="vit_h", pred_iou_thresh=0.88,
                               stability_score_thresh=0.95,
                               box_nms_thresh=0.7, calibrated=True)
        _log(f"realistic done: {real['masks_per_sec']:.1f} masks/s, "
             f"{real['images_per_sec']:.2f} img/s")
        extra = {
            "headline_spread_pct": round(
                100.0 * (runs[-1] - runs[0]) / max(runs[1], 1e-9), 1),
            "realistic_config_images_per_sec":
                round(real["images_per_sec"], 3),
            "realistic_config_masks_per_sec":
                round(real["masks_per_sec"], 3),
            "realistic_config_committed_masks": real["committed_masks"],
            "vs_baseline_denominator":
                "derived estimate (docs/BASELINE_DERIVATION.md)",
        }
    except ImportError:
        value = bench_point_masks()
        metric, unit = "point_prompt_masks_per_sec_vitb", "masks/s/chip"

    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 3),
        "unit": unit,
        "vs_baseline": round(float(value) / REF_BASELINE_MASKS_PER_SEC, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
