"""Flagship fused-segmentation train-step timing on the real TPU.

Times one optimizer step (SAM ViT-B + frozen InternLM2-1.8B, b=1, the
train_joint_v2.py segment-mode workload) — the 283 ms number in
docs/BENCHMARKS.md. `--fused-bwd` enables the Pallas flash backward
(ops/pallas/flash_attention.USE_FUSED_BWD) to compare; `--trace DIR`
captures a profiler trace of the timed steps.

Usage: python benchmarks/bench_train_step.py [--fused-bwd] [--trace DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused-bwd", action="store_true")
    ap.add_argument("--trace", default="")
    ap.add_argument("--steps", type=int, default=5)
    # b=1 flagship fits comfortably without remat and runs ~9 ms/step
    # faster (158.7 vs 167.7 ms measured round 3), so no-remat is the
    # default; --remat times the memory-saving configuration.
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--remat", dest="remat", action="store_true")
    ap.set_defaults(remat=False)
    args = ap.parse_args()

    from ullsam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.fused_bwd:
        from ullsam_tpu.ops.pallas import flash_attention as FA
        FA.USE_FUSED_BWD = True

    import __graft_entry__ as g
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.ullsam import fusion as F
    from ullsam_tpu.train import step as TS

    cfg = g._flagship_config()
    tcfg = TS.TrainConfig(total_steps=100, remat=args.remat)
    params = F.fusion_init(jax.random.PRNGKey(0), cfg)
    params = cast_floating(params, jnp.bfloat16)

    tx, trainable, frozen = TS.make_trainable_optimizer(params, tcfg)
    opt_state = tx.init(trainable)
    step = TS.make_train_step(cfg, tcfg, tx)

    n_img = cfg.num_image_token
    text_len = 64
    N = n_img + text_len
    ids = np.full((1, N), 11, np.int32)
    ids[0, 2:2 + n_img] = cfg.img_context_token_id
    rng = np.random.RandomState(0)
    I, P = 4, 2
    batch = {
        "pixel_values": jnp.asarray(rng.rand(1, 1024, 1024, 3) * 255,
                                    jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((1, N), jnp.int32),
        "point_coords": jnp.asarray(rng.rand(1, I, P, 2) * 1024,
                                    jnp.float32),
        "point_labels": jnp.ones((1, I, P), jnp.int32),
        "masks": jnp.asarray(rng.rand(1, I, 1024, 1024) > 0.7),
        "instance_valid": jnp.ones((1, I), jnp.bool_),
    }

    def sync(tree):
        return np.asarray(sum(jnp.sum(l.astype(jnp.float32))
                              for l in jax.tree.leaves(tree)))

    t0 = time.perf_counter()
    trainable, opt_state, metrics = step(trainable, frozen, opt_state, batch)
    sync(metrics)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}")

    trainable, opt_state, metrics = step(trainable, frozen, opt_state, batch)
    sync(metrics)

    ctx = (jax.profiler.trace(args.trace) if args.trace
           else open(os.devnull))  # no-op context
    with ctx:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            trainable, opt_state, metrics = step(trainable, frozen,
                                                 opt_state, batch)
        sync(metrics)
        dt = (time.perf_counter() - t0) / args.steps
    print(f"train step: {dt*1000:.1f} ms "
          f"(fused_bwd={args.fused_bwd}, remat={args.remat})")


if __name__ == "__main__":
    main()
