"""Training CLI: pretrain / sft / segment / segment_baseline modes.

Replaces train.py + train_joint_v2.py + train_joint_v2_baseline.py (the
reference's three near-duplicate 1.9k-line scripts) with one entrypoint.
Reference bugs fixed by design (SURVEY §7): no duplicate argparse flags, no
type=bool footguns (explicit store_true / choices), no on-disk config
mutation, vision tower runs once per step, true optimizer resume.

Usage:
  python -m ullsam_tpu.train.cli --mode segment --data_path data.jsonl \
      --tokenizer_path /path/to/tokenizer_dir --output_dir runs/seg
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="uLLSAM-TPU trainer")
    # run
    p.add_argument("--mode", choices=["pretrain", "sft", "segment",
                                      "segment_baseline"], default="segment")
    p.add_argument("--output_dir", default="runs/default")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    # data
    p.add_argument("--data_path", required=True)
    p.add_argument("--images_root", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--max_length", type=int, default=1280)
    p.add_argument("--pack", action="store_true",
                   help="pretrain/sft only: pack several samples per row "
                        "with segment ids (varlen flash attention) instead "
                        "of one padded sample per row")
    p.add_argument("--img_size", type=int, default=1024)
    p.add_argument("--num_pos_points", type=int, default=1)
    p.add_argument("--num_neg_points", type=int, default=3)
    p.add_argument("--sam_max_point_bs", type=int, default=4)
    # model
    p.add_argument("--sam_variant", default="vit_b")
    p.add_argument("--sam_checkpoint", default=None)
    p.add_argument("--llm_checkpoint_dir", default=None,
                   help="HF safetensors dir for InternLM2")
    p.add_argument("--fusion_checkpoint", default=None,
                   help="uLLSAM .pt checkpoint (full model warm start)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny configs for smoke tests")
    # optimization (reference hyperparams of record,
    # scripts/train_all_joint_v2.sh)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--grad_accum", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--freeze_vision", action="store_true")
    p.add_argument("--instance_matching", choices=["indexed", "hungarian"],
                   default="indexed",
                   help="hungarian = re-match preds to GTs by soft IoU "
                        "(working variable_instance_loss analog)")
    p.add_argument("--param_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="cast all floating params after init/warm-start; "
                        "bfloat16 matches the reference's deepspeed-bf16 "
                        "training (train_joint_v2.py) and runs the vision "
                        "tower fwd+bwd at bf16 MXU rate")
    p.add_argument("--trainable_modules", default=None,
                   help="comma-separated path regexes overriding defaults")
    # parallelism
    p.add_argument("--dp", type=int, default=0, help="0 = all devices")
    p.add_argument("--tp", type=int, default=1)
    # logging / ckpt
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--image_log_every", type=int, default=-1,
                   help="overlay-image logging interval in steps; -1 = "
                        "20*log_every (the reference's cadence, "
                        "train_joint_v2.py:1125), 0 = off")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--max_steps", type=int, default=0, help="0 = by epochs")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--wandb", action="store_true")
    return p


def make_configs(args):
    from ullsam_tpu.core.config import (FusionConfig, InternLM2Config,
                                        MaskDecoderConfig,
                                        PromptEncoderConfig, SamConfig,
                                        ViTConfig, SAM_REGISTRY,
                                        internlm2_1_8b)

    if args.tiny:
        cfg = FusionConfig(
            sam=SamConfig(
                vit=ViTConfig(img_size=64, patch_size=8, embed_dim=16,
                              depth=2, num_heads=2, mlp_ratio=2.0,
                              out_chans=16, window_size=2,
                              global_attn_indexes=(1,)),
                prompt_encoder=PromptEncoderConfig(
                    embed_dim=16, image_embedding_size=(8, 8),
                    input_image_size=(64, 64), mask_in_chans=8),
                mask_decoder=MaskDecoderConfig(
                    transformer_dim=16, transformer_mlp_dim=32,
                    transformer_num_heads=2, iou_head_hidden_dim=8)),
            llm=InternLM2Config(vocab_size=92553, hidden_size=32,
                                intermediate_size=64, num_hidden_layers=2,
                                num_attention_heads=4, num_key_value_heads=2),
            vit_feature_dim=16)
    else:
        cfg = FusionConfig(sam=SAM_REGISTRY[args.sam_variant](),
                           llm=internlm2_1_8b())
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ullsam_tpu.data.datasets import (DatasetConfig, PrefetchIterator,
                                          PretrainDataset, SegDataset,
                                          SFTDataset, batch_iterator_sharded)
    from ullsam_tpu.data.tokenizer import load_tokenizer
    from ullsam_tpu.models.ullsam import fusion as F
    from ullsam_tpu.parallel.partitioning import (create_mesh, shard_batch,
                                                  shard_params)
    from ullsam_tpu.train.checkpoint import CheckpointManager
    from ullsam_tpu.train.metrics import (MetricWriter, StepTimer,
                                          segmentation_overlay)
    from ullsam_tpu.train.step import (TrainConfig, combine_params,
                                       make_pred_masks_fn, make_train_step,
                                       make_trainable_optimizer)

    cfg = make_configs(args)
    tokenizer = load_tokenizer(args.tokenizer_path)

    dcfg = DatasetConfig(
        data_path=args.data_path, images_root=args.images_root,
        max_length=args.max_length, img_size=cfg.sam.vit.img_size,
        num_image_token=cfg.num_image_token,
        num_pos_points=args.num_pos_points,
        num_neg_points=args.num_neg_points,
        sam_max_point_bs=args.sam_max_point_bs)
    if args.mode == "pretrain":
        dataset = PretrainDataset(dcfg, tokenizer)
    elif args.mode == "sft":
        dataset = SFTDataset(dcfg, tokenizer)
    else:
        dataset = SegDataset(dcfg, tokenizer)

    # model init + warm starts
    params = F.fusion_init(jax.random.PRNGKey(args.seed), cfg)
    if args.sam_checkpoint:
        from ullsam_tpu.convert.torch_sam import load_sam_checkpoint
        params["sam"] = load_sam_checkpoint(args.sam_checkpoint, cfg.sam,
                                            params["sam"])
    if args.llm_checkpoint_dir:
        from ullsam_tpu.convert.torch_internlm2 import (
            load_internlm2_safetensors)
        params["llm"] = load_internlm2_safetensors(
            args.llm_checkpoint_dir, cfg.llm, prefix="language_model.")
    if args.fusion_checkpoint:
        from ullsam_tpu.convert.torch_fusion import convert_fusion_state_dict
        from ullsam_tpu.convert.torch_sam import load_torch_state_dict
        sd = load_torch_state_dict(args.fusion_checkpoint)
        params = convert_fusion_state_dict(sd, cfg)

    steps_per_epoch = max(1, len(dataset) //
                          (args.batch_size * max(1, args.grad_accum)))
    total_steps = args.max_steps or steps_per_epoch * args.epochs

    seg_modes = ("segment", "segment_baseline")
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        total_steps=total_steps, warmup_ratio=args.warmup_ratio,
        max_grad_norm=args.max_grad_norm,
        seg_weight=1.0 if args.mode in seg_modes else 0.0,
        llm_weight=0.0 if args.mode in seg_modes else 1.0,
        use_llm_hidden_states=(args.mode == "segment"),
        freeze_vision=args.freeze_vision,
        instance_matching=args.instance_matching,
        trainable_patterns=(
            tuple(args.trainable_modules.split(","))
            if args.trainable_modules else
            ((r"sam\..*", r"mlp1\..*", r"mlp2\..*") if args.mode in seg_modes
             else (r"llm\..*", r"mlp1\..*", r"mlp2\..*"))))

    if args.param_dtype == "bfloat16":
        from ullsam_tpu.core.tree import cast_floating
        params = cast_floating(params, jnp.bfloat16)

    n_dev = len(jax.devices())
    dp = args.dp or (n_dev // args.tp)
    mesh = create_mesh(dp=dp, tp=args.tp)
    params = shard_params(params, mesh)
    tx, trainable, frozen = make_trainable_optimizer(
        params, tcfg, grad_accum=max(1, args.grad_accum))
    opt_state = tx.init(trainable)
    step_fn = make_train_step(cfg, tcfg, tx)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "ckpt"))
    writer = MetricWriter(os.path.join(args.output_dir, "logs"),
                          use_tensorboard=args.tensorboard,
                          use_wandb=args.wandb)

    img_every = (20 * args.log_every if args.image_log_every < 0
                 else args.image_log_every)
    pred_fn = (make_pred_masks_fn(cfg, tcfg)
               if img_every and args.mode in seg_modes else None)

    start_step, start_epoch = 0, 0
    if args.resume and ckpt.latest_step() is not None:
        trainable, opt_state, extra = ckpt.restore(trainable, opt_state)
        start_step = int(extra.get("step", ckpt.latest_step()))
        start_epoch = int(extra.get("epoch", 0))
        print(f"resumed from step {start_step} (epoch {start_epoch})")

    timer = StepTimer()
    step = start_step
    with jax.sharding.set_mesh(mesh):
        if args.pack and args.mode in ("pretrain", "sft"):
            from ullsam_tpu.data.datasets import packed_batch_iterator_sharded

            def make_iter(epoch):
                return packed_batch_iterator_sharded(
                    dataset, args.batch_size, args.max_length,
                    tokenizer.pad_token_id, seed=args.seed,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(), epoch=epoch)
        else:
            def make_iter(epoch):
                return batch_iterator_sharded(
                    dataset, args.batch_size, seed=args.seed,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(), epoch=epoch)
        for epoch in range(start_epoch, args.epochs):
            for batch in PrefetchIterator(make_iter(epoch)):
                if args.max_steps and step >= args.max_steps:
                    break
                timer.start()
                b = shard_batch(batch, mesh)
                trainable, opt_state, metrics = step_fn(trainable, frozen,
                                                        opt_state, b)
                loss = float(np.asarray(metrics["loss"]))  # sync
                step += 1
                if step % args.log_every == 0:
                    m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                    m.update(timer.stop(args.batch_size))
                    writer.write(step, m)
                    print(f"epoch {epoch} step {step}: " +
                          " ".join(f"{k}={v:.4f}" for k, v in m.items()))
                if pred_fn is not None and step % img_every == 0:
                    # pred-vs-GT boundary overlay (train_joint_v2.py:1125-1167)
                    pred = pred_fn(combine_params(trainable, frozen), b)
                    pred0 = np.asarray(pred[0, 0]) > 0.0  # == sigmoid > 0.5
                    gt0 = np.asarray(b["masks"][0, 0]) > 0.5
                    img0 = np.asarray(b["pixel_values"][0], np.float32)
                    if img0.shape[:2] != pred0.shape:
                        from ullsam_tpu.ops.resize import bilinear_resize_nhwc
                        img0 = np.asarray(bilinear_resize_nhwc(
                            jnp.asarray(img0)[None], *pred0.shape)[0])
                    iou_val = float(np.asarray(metrics.get("iou", 0.0)))
                    writer.log_image(
                        step, "segmentation_example",
                        segmentation_overlay(img0, pred0, gt0),
                        caption=(f"Epoch {epoch}, Step {step}, "
                                 f"IoU: {iou_val:.4f}"))
                if step % args.ckpt_every == 0:
                    ckpt.save(step, trainable, opt_state,
                              extra={"step": step, "epoch": epoch})
            ckpt.save(step, trainable, opt_state,
                      extra={"step": step, "epoch": epoch + 1}, wait=True)
    writer.close()
    ckpt.close()
    print(f"done at step {step}; checkpoints in {args.output_dir}/ckpt")


if __name__ == "__main__":
    main()
