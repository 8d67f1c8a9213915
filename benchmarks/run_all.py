"""Full benchmark suite (beyond the driver's one-line bench.py):

  python benchmarks/run_all.py [--quick]

Covers the BASELINE.json metrics: AMG masks/s (ViT-B/H), p50 prompt->mask
latency, InternLM2-1.8B decode tok/s, fused-forward latency, train step
time. All timings sync via host transfer (block_until_ready is a no-op on
the axon relay).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_scalar(x):
    import jax.numpy as jnp
    return np.asarray(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def bench_amg_variants(results, quick=False):
    from ullsam_tpu.inference.amg import bench_amg_stats

    iters = 2 if quick else 3
    for variant in (["vit_b"] if quick else ["vit_b", "vit_h"]):
        v = bench_amg_stats(variant=variant, iters=iters)["masks_per_sec"]
        results[f"amg_masks_per_sec_{variant}"] = round(v, 2)
        # production config (upstream defaults + device NMS, SURVEY §2.13);
        # committed masks are weight-dependent so report images/s
        real = bench_amg_stats(variant=variant, iters=iters,
                               pred_iou_thresh=0.88,
                               stability_score_thresh=0.95,
                               box_nms_thresh=0.7)
        results[f"amg_realistic_images_per_sec_{variant}"] = round(
            real["images_per_sec"], 3)


def bench_point_latency(results, n=20):
    """p50/p90 single prompt->mask latency, encoder amortized."""
    import jax
    import jax.numpy as jnp

    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.sam import build_sam, decode_masks, encode_image
    from ullsam_tpu.models.sam import sam as S

    cfg, params = build_sam("vit_b")
    params = cast_floating(params, jnp.bfloat16)
    img = jnp.asarray(np.random.rand(1, 1024, 1024, 3) * 255, jnp.bfloat16)

    @jax.jit
    def encode(p, x):
        return encode_image(p, cfg, S.preprocess(x, cfg))

    @jax.jit
    def decode(p, e, c, l):
        return decode_masks(p, cfg, e, points=(c, l), multimask_output=True)

    emb = encode(params, img)
    sync_scalar(emb)
    c = jnp.asarray([[[512.0, 512.0]]])
    l = jnp.asarray([[1]])
    m, i = decode(params, emb, c, l)
    sync_scalar(i)
    lat = []
    for k in range(n):
        c2 = jnp.asarray([[[100.0 + 40 * k, 300.0]]])
        t0 = time.perf_counter()
        m, i = decode(params, emb, c2, l)
        sync_scalar(i)
        lat.append(time.perf_counter() - t0)
    lat = sorted(lat)
    results["prompt_to_mask_p50_ms"] = round(1000 * lat[len(lat) // 2], 1)
    results["prompt_to_mask_p90_ms"] = round(1000 * lat[int(len(lat) * 0.9)], 1)


def bench_llm_decode(results, steps=64):
    """InternLM2-1.8B decode tok/s (batch 1 and 4)."""
    import jax
    import jax.numpy as jnp

    from ullsam_tpu.core.config import internlm2_1_8b
    from ullsam_tpu.models.internlm2 import model as M

    cfg = internlm2_1_8b()
    params = M.internlm2_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    for B in (1, 4):
        cache = M.init_cache(cfg, B, 1536, dtype=jnp.bfloat16)
        ids = jnp.asarray(np.random.randint(10, 90000, (B, 1100)))
        emb = M.embed_tokens(params, ids)
        out, cache = M.internlm2_prefill(params, cfg, emb,
                                         jnp.ones((B, 1100), jnp.int32),
                                         cache)
        sync_scalar(out["logits"][:, -1, :2])

        step = jax.jit(lambda p, e, c: M.internlm2_decode_step(p, cfg, e, c))
        tok = jnp.zeros((B, 1, cfg.hidden_size), jnp.bfloat16)
        logits, cache = step(params, tok, cache)
        sync_scalar(logits[:, :2])
        t0 = time.perf_counter()
        for _ in range(steps):
            logits, cache = step(params, tok, cache)
        sync_scalar(logits[:, :2])
        dt = time.perf_counter() - t0
        results[f"llm_decode_tok_per_sec_b{B}"] = round(B * steps / dt, 1)


def bench_fused_forward(results):
    """Full uLLSAM fused forward latency (t_mllm analog, app.py:583)."""
    import time

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    fn, args = g.entry()
    from ullsam_tpu.core.tree import cast_floating
    params = cast_floating(args[0], jnp.bfloat16)
    jfn = jax.jit(fn)
    out = jfn(params, args[1].astype(jnp.bfloat16), args[2])
    sync_scalar(out[0][:, -1, :2])
    t0 = time.perf_counter()
    for _ in range(3):
        out = jfn(params, args[1].astype(jnp.bfloat16), args[2])
    sync_scalar(out[0][:, -1, :2])
    results["fused_forward_ms"] = round(1000 * (time.perf_counter() - t0) / 3, 1)


def main():
    from ullsam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip", default="", help="comma list of sections")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    results = {}
    for name, fn in [("amg", bench_amg_variants),
                     ("latency", bench_point_latency),
                     ("decode", bench_llm_decode),
                     ("fused", bench_fused_forward)]:
        if name in skip:
            continue
        t0 = time.time()
        if name == "amg":
            fn(results, quick=args.quick)
        else:
            fn(results)
        print(f"[{name} done in {time.time()-t0:.0f}s]", flush=True)
        print(json.dumps(results, indent=2))

    # merge so partial runs (--skip/--quick) never clobber other sections
    merged = {}
    try:
        with open("benchmarks/results.json") as f:
            merged = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    merged.update(results)
    with open("benchmarks/results.json", "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
