"""Data pipeline + checkpointing + end-to-end tiny training CLI run."""

import json
import os

import numpy as np
import pytest

TOKENIZER_DIR = "/root/reference/modeling/tokenizer"

needs_tokenizer = pytest.mark.skipif(
    not os.path.exists(os.path.join(TOKENIZER_DIR, "tokenizer.model")),
    reason="tokenizer asset not available")


def _write_synthetic_dataset(root, n=4, img_size=64, n_inst=3):
    from PIL import Image

    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(img_dir), os.makedirs(mask_dir)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        img = (rng.rand(img_size, img_size, 3) * 255).astype(np.uint8)
        mask = np.zeros((img_size, img_size), np.uint8)
        for j in range(n_inst):
            cx, cy = rng.randint(10, img_size - 10, 2)
            r = rng.randint(4, 8)
            yy, xx = np.mgrid[:img_size, :img_size]
            mask[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = j + 1
        ipath = os.path.join(img_dir, f"{i}.png")
        Image.fromarray(img).save(ipath)
        Image.fromarray(mask).save(os.path.join(mask_dir, f"{i}.png"))
        rows.append({
            "image_path": ipath,
            "conversation": [
                {"role": "user", "content": "Describe the image.\n<image>"},
                {"role": "assistant", "content": "Some cells."},
            ],
        })
    jsonl = os.path.join(root, "data.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return jsonl


def test_point_sampling_properties():
    from ullsam_tpu.data.point_sampling import sample_instance_points

    mask = np.zeros((128, 128), bool)
    mask[30:90, 40:100] = True
    rng = np.random.default_rng(0)
    pts, labels = sample_instance_points(mask, rng, num_pos=2, num_neg=3)
    assert pts.shape == (5, 2) and labels.tolist() == [1, 1, 0, 0, 0]
    for (x, y), lab in zip(pts.astype(int), labels):
        if lab == 1:
            assert mask[y, x], "positive point must be inside"
        else:
            assert not mask[y, x], "negative point must be outside"

    # degenerate: tiny instance (no interior after 10 erosions)
    tiny = np.zeros((64, 64), bool)
    tiny[30:33, 30:33] = True
    pts, labels = sample_instance_points(tiny, rng)
    assert tiny[int(pts[0][1]), int(pts[0][0])]


@needs_tokenizer
def test_seg_dataset_shapes(tmp_path):
    from ullsam_tpu.data.datasets import DatasetConfig, SegDataset
    from ullsam_tpu.data.tokenizer import load_tokenizer

    jsonl = _write_synthetic_dataset(str(tmp_path))
    tk = load_tokenizer(TOKENIZER_DIR)
    cfg = DatasetConfig(data_path=jsonl, max_length=96, img_size=64,
                        num_image_token=16, sam_max_point_bs=2)
    ds = SegDataset(cfg, tk)
    assert len(ds) == 4
    ex = ds.example(0)
    assert ex["input_ids"].shape == (96,)
    assert ex["pixel_values"].shape == (64, 64, 3)
    assert ex["masks"].shape == (2, 64, 64)
    assert ex["point_coords"].shape == (2, 4, 2)
    assert ex["instance_valid"].sum() >= 1
    # labels masked before assistant turn and on image tokens
    assert (ex["labels"] == -100).sum() > 0
    valid_labels = ex["labels"][ex["labels"] != -100]
    assert len(valid_labels) > 0


@needs_tokenizer
def test_batch_iterator_sharding(tmp_path):
    from ullsam_tpu.data.datasets import (DatasetConfig, SegDataset,
                                          batch_iterator_sharded)
    from ullsam_tpu.data.tokenizer import load_tokenizer

    jsonl = _write_synthetic_dataset(str(tmp_path))
    tk = load_tokenizer(TOKENIZER_DIR)
    cfg = DatasetConfig(data_path=jsonl, max_length=64, img_size=64,
                        num_image_token=16, sam_max_point_bs=2)
    ds = SegDataset(cfg, tk)
    batches = list(batch_iterator_sharded(ds, 2, process_index=0,
                                          process_count=2, shuffle=False))
    assert len(batches) == 1  # 4 rows / 2 processes / batch 2
    assert batches[0]["input_ids"].shape == (2, 64)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from ullsam_tpu.train.checkpoint import CheckpointManager

    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, params, opt_state, extra={"step": 5, "epoch": 1}, wait=True)
    assert mgr.latest_step() == 5

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    zos = tx.init(zeros)
    p2, o2, extra = mgr.restore(zeros, zos)
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.arange(4.0))
    assert extra["step"] == 5 and extra["epoch"] == 1
    mgr.close()


@needs_tokenizer
def test_train_cli_smoke(tmp_path):
    """Two optimizer steps of the full CLI in tiny mode on CPU."""
    from ullsam_tpu.train.cli import main

    jsonl = _write_synthetic_dataset(str(tmp_path), img_size=64)
    out = str(tmp_path / "run")
    main([
        "--mode", "segment", "--tiny",
        "--data_path", jsonl,
        "--tokenizer_path", TOKENIZER_DIR,
        "--output_dir", out,
        "--max_length", "192",
        "--batch_size", "2", "--epochs", "1", "--max_steps", "2",
        "--log_every", "1", "--ckpt_every", "2",
        "--image_log_every", "2",
        "--sam_max_point_bs", "2", "--dp", "2", "--tp", "2",
    ])
    assert os.path.exists(os.path.join(out, "logs", "metrics.jsonl"))
    lines = open(os.path.join(out, "logs", "metrics.jsonl")).read().strip()
    assert lines, "no metrics logged"
    rec = [json.loads(l) for l in lines.splitlines() if '"loss"' in l][-1]
    assert np.isfinite(rec["loss"])
    assert os.path.isdir(os.path.join(out, "ckpt"))
    # overlay-image logging fired at step 2 (train_joint_v2.py:1125-1167)
    imgs = os.listdir(os.path.join(out, "logs", "images"))
    assert any(f.startswith("segmentation_example") for f in imgs), imgs


def test_segmentation_overlay_and_log_image(tmp_path):
    from ullsam_tpu.train.metrics import MetricWriter, segmentation_overlay

    img = np.zeros((16, 16, 3), np.float32)
    pred = np.zeros((16, 16), bool)
    pred[4:10, 4:10] = True
    gt = np.zeros((16, 16), bool)
    gt[5:11, 5:11] = True
    vis = segmentation_overlay(img, pred, gt)
    assert vis.shape == (16, 16, 3)
    # pred boundary red where not overwritten by gt boundary
    assert tuple(vis[4, 4]) == (1.0, 0.0, 0.0)
    # gt boundary green (painted after pred)
    assert tuple(vis[10, 10]) == (0.0, 1.0, 0.0)
    # interior pixels untouched
    assert tuple(vis[7, 7]) == (0.0, 0.0, 0.0)

    w = MetricWriter(str(tmp_path / "logs"), use_tensorboard=False)
    w.log_image(3, "segmentation_example", vis, caption="step 3")
    w.close()
    files = os.listdir(str(tmp_path / "logs" / "images"))
    assert files and files[0].endswith((".png", ".npy"))


def test_prefetch_iterator():
    from ullsam_tpu.data.datasets import PrefetchIterator

    items = list(PrefetchIterator(iter(range(7)), prefetch=3))
    assert items == list(range(7))

    def boom():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        for _ in it:
            pass


@needs_tokenizer
def test_train_cli_resume(tmp_path):
    """True resume: a second invocation with --resume continues from the
    checkpointed step (the reference never restored optimizer state)."""
    from ullsam_tpu.train.cli import main

    jsonl = _write_synthetic_dataset(str(tmp_path), img_size=64)
    out = str(tmp_path / "run")
    common = ["--mode", "segment", "--tiny", "--data_path", jsonl,
              "--tokenizer_path", TOKENIZER_DIR, "--output_dir", out,
              "--max_length", "192", "--batch_size", "2", "--epochs", "2",
              "--log_every", "1", "--ckpt_every", "1",
              "--sam_max_point_bs", "2", "--dp", "1", "--tp", "1"]
    main(common + ["--max_steps", "1"])
    main(common + ["--max_steps", "2", "--resume"])
    lines = [json.loads(l) for l in
             open(os.path.join(out, "logs", "metrics.jsonl"))]
    steps = [r["step"] for r in lines]
    assert 2 in steps, steps  # the resumed run logged step 2
    assert np.isfinite(lines[-1]["loss"])


@needs_tokenizer
def test_train_cli_pretrain_mode(tmp_path):
    """Pretrain mode: CE loss path, LLM trainable, no seg loss."""
    from ullsam_tpu.train.cli import main

    jsonl = _write_synthetic_dataset(str(tmp_path), img_size=64)
    # pretrain dataset uses {image, conversations}; rewrite keys
    rows = [json.loads(l) for l in open(jsonl)]
    p2 = os.path.join(str(tmp_path), "pretrain.jsonl")
    with open(p2, "w") as f:
        for r in rows:
            f.write(json.dumps({"image": r["image_path"],
                                "conversations": r["conversation"]}) + "\n")
    out = str(tmp_path / "run_pt")
    main(["--mode", "pretrain", "--tiny", "--data_path", p2,
          "--tokenizer_path", TOKENIZER_DIR, "--output_dir", out,
          "--max_length", "192", "--batch_size", "2", "--epochs", "1",
          "--max_steps", "1", "--log_every", "1", "--ckpt_every", "100",
          "--dp", "1", "--tp", "1"])
    rec = json.loads(open(os.path.join(out, "logs", "metrics.jsonl")
                          ).read().strip().splitlines()[-1])
    assert np.isfinite(rec["loss"]) and rec["loss"] > 0
