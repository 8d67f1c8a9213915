"""Evaluation CLI (the reference's missing eval_uLLSAM_seg.py /
eval_language.py).

Modes:
  seg       point-prompted per-GT-instance segmentation (the app/training
            protocol: one positive click per instance, LLM-guided dense
            prompt) -> per-image AP/IoU/Dice
  seg_amg   automatic mask generation -> AP vs GT instances
  lm        caption perplexity over a jsonl chat dataset

Usage:
  python -m ullsam_tpu.eval.cli --mode seg --data_path data.jsonl \
      --checkpoint ullsam.pt --tokenizer_path DIR
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="uLLSAM-TPU evaluation")
    p.add_argument("--mode", choices=["seg", "seg_amg", "lm"], default="seg")
    p.add_argument("--data_path", required=True)
    p.add_argument("--images_root", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--sam_variant", default="vit_b")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--baseline", action="store_true",
                   help="no LLM dense prompt (ablation)")
    p.add_argument("--output", default=None, help="write metrics json here")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from ullsam_tpu.data.datasets import DatasetConfig, SegDataset
    from ullsam_tpu.data.tokenizer import load_tokenizer
    from ullsam_tpu.eval.seg_metrics import (aggregate, average_precision,
                                             instances_to_masks,
                                             pixel_metrics)
    from ullsam_tpu.models.ullsam import fusion as F
    from ullsam_tpu.train.cli import make_configs

    cfg = make_configs(args)
    tokenizer = load_tokenizer(args.tokenizer_path)
    params = F.fusion_init(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        from ullsam_tpu.convert.torch_fusion import convert_fusion_state_dict
        from ullsam_tpu.convert.torch_sam import load_torch_state_dict
        params = convert_fusion_state_dict(
            load_torch_state_dict(args.checkpoint), cfg)

    dcfg = DatasetConfig(data_path=args.data_path,
                         images_root=args.images_root,
                         img_size=cfg.sam.vit.img_size,
                         num_image_token=cfg.num_image_token,
                         max_length=1280 if not args.tiny else 192)
    ds = SegDataset(dcfg, tokenizer)
    n = min(len(ds), args.limit) if args.limit else len(ds)

    results = []
    if args.mode in ("seg", "seg_amg"):
        import jax.numpy as jnp
        from PIL import Image

        from ullsam_tpu.models.ullsam.chat import (point_segment,
                                                   segment_forward)

        for i in range(n):
            row = ds.rows[i]
            pixel = np.asarray(Image.open(row["image_path"]).convert("RGB")
                               .resize((cfg.sam.vit.img_size,) * 2))
            model_in = jnp.asarray(pixel, jnp.float32)[None] / 255.0
            mask_path = (row.get("mask_path")
                         or row["image_path"].replace("images", "masks"))
            gt_map = np.asarray(Image.open(mask_path).convert("I").resize(
                (cfg.sam.vit.img_size,) * 2, Image.NEAREST))
            gt = instances_to_masks(gt_map)

            if args.mode == "seg_amg":
                from ullsam_tpu.inference.amg import AutomaticMaskGenerator
                gen = AutomaticMaskGenerator(cfg.sam, params["sam"],
                                             points_per_side=16)
                recs = gen.generate(pixel.astype(np.uint8))
                pred = (np.stack([r["segmentation"] for r in recs])
                        if recs else np.zeros((0,) + gt_map.shape, bool))
            else:
                dense, feats = segment_forward(params, cfg, tokenizer,
                                               model_in)
                if args.baseline:
                    dense = None
                preds = []
                for g in gt:  # one positive click per GT instance centroid
                    ys, xs = np.nonzero(g)
                    cy, cx = float(ys.mean()), float(xs.mean())
                    m, _, _ = point_segment(
                        params, cfg, feats, dense,
                        jnp.asarray([[[cx, cy]]], jnp.float32),
                        jnp.asarray([[1]], jnp.int32))
                    preds.append(np.asarray(m[0, 0]))
                pred = (np.stack(preds) if preds
                        else np.zeros((0,) + gt_map.shape, bool))

            m = average_precision(pred, gt)
            m.update(pixel_metrics(pred.any(0) if len(pred) else
                                   np.zeros_like(gt_map, bool),
                                   gt.any(0) if len(gt) else
                                   np.zeros_like(gt_map, bool)))
            results.append(m)
            print(f"[{i+1}/{n}] map={m['map']:.3f} ap50={m['ap50']:.3f} "
                  f"dice={m['dice']:.3f}")
    else:  # lm perplexity
        import jax.numpy as jnp

        for i in range(n):
            ex = ds.example(i)
            out = F.fusion_forward(
                params, cfg, jnp.asarray(ex["pixel_values"][None]),
                jnp.asarray(ex["input_ids"][None]),
                attention_mask=jnp.asarray(ex["attention_mask"][None]),
                labels=jnp.asarray(ex["labels"][None]))
            nll = float(np.asarray(out["loss"]))
            results.append({"nll": nll, "ppl": float(np.exp(min(nll, 20)))})
            print(f"[{i+1}/{n}] nll={nll:.3f}")

    summary = aggregate(results)
    print(json.dumps(summary, indent=2, sort_keys=True))
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"summary": summary, "per_image": results}, f)
    return summary


if __name__ == "__main__":
    main()
