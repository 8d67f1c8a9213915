"""Segmentation metric tests."""

import numpy as np

from ullsam_tpu.eval.seg_metrics import (average_precision, greedy_match,
                                         instances_to_masks,
                                         mask_iou_matrix, pixel_metrics)


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 < r * r


def test_perfect_prediction():
    gt = np.zeros((64, 64), np.uint16)
    gt[_blob(64, 64, 20, 20, 8)] = 1
    gt[_blob(64, 64, 45, 45, 6)] = 2
    masks = instances_to_masks(gt)
    m = average_precision(masks, masks)
    assert m["map"] == 1.0 and m["ap50"] == 1.0
    assert m["mean_matched_iou"] == 1.0


def test_partial_and_missing():
    gt = instances_to_masks(
        (_blob(64, 64, 20, 20, 8).astype(np.uint16) * 1
         + _blob(64, 64, 45, 45, 6).astype(np.uint16) * 2))
    pred = np.stack([_blob(64, 64, 21, 21, 8)])  # one shifted, one missing
    m = average_precision(pred, gt)
    assert 0.0 < m["ap50"] <= 0.5
    assert m["n_pred"] == 1 and m["n_gt"] == 2

    px = pixel_metrics(pred.any(0), gt.any(0))
    assert 0.0 < px["pixel_iou"] < 1.0
    assert px["recall"] < 1.0


def test_greedy_match_thresholds():
    iou = np.asarray([[0.9, 0.1], [0.2, 0.55]], np.float32)
    tp, fp, fn, matched = greedy_match(iou, 0.5)
    assert tp == 2 and fp == 0 and fn == 0
    tp, fp, fn, _ = greedy_match(iou, 0.8)
    assert tp == 1 and fp == 1 and fn == 1


def test_iou_matrix_matches_numpy():
    a = np.random.RandomState(0).rand(3, 32, 32) > 0.5
    b = np.random.RandomState(1).rand(2, 32, 32) > 0.5
    iou = mask_iou_matrix(a, b)
    af = a.reshape(3, -1).astype(float)
    bf = b.reshape(2, -1).astype(float)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    np.testing.assert_allclose(iou, inter / union, atol=1e-6)


def test_eval_cli_smoke(tmp_path):
    """Full eval CLI over a synthetic dataset with the tiny model."""
    import os

    import pytest

    if not os.path.exists("/root/reference/modeling/tokenizer/tokenizer.model"):
        pytest.skip("tokenizer asset not available")
    from tests.test_data_and_train_cli import _write_synthetic_dataset
    from ullsam_tpu.eval.cli import main

    jsonl = _write_synthetic_dataset(str(tmp_path), img_size=64)
    out = str(tmp_path / "metrics.json")
    summary = main(["--mode", "seg", "--tiny", "--data_path", jsonl,
                    "--tokenizer_path", "/root/reference/modeling/tokenizer",
                    "--limit", "2", "--output", out])
    assert "map" in summary and "dice" in summary
    assert os.path.exists(out)

    summary_lm = main(["--mode", "lm", "--tiny", "--data_path", jsonl,
                       "--tokenizer_path",
                       "/root/reference/modeling/tokenizer",
                       "--limit", "1"])
    assert "nll" in summary_lm


def test_hungarian_match_beats_greedy_when_greedy_suboptimal():
    """Crafted case: greedy assigns pred0 its best GT and starves pred1;
    Hungarian finds the assignment with two TPs."""
    import numpy as np
    from ullsam_tpu.eval.seg_metrics import greedy_match, hungarian_match

    iou = np.asarray([[0.9, 0.8],
                      [0.85, 0.0]], np.float32)
    # greedy: pred0 -> gt0 (0.9), pred1 -> gt0 taken, gt1 iou 0.0 -> 1 TP
    tp_g, _, _, _ = greedy_match(iou, 0.5)
    tp_h, fp_h, fn_h, matched = hungarian_match(iou, 0.5)
    assert tp_g == 1
    assert (tp_h, fp_h, fn_h) == (2, 0, 0)
    assert sorted(round(m, 2) for m in matched) == [0.8, 0.85]

    from ullsam_tpu.eval.seg_metrics import average_precision
    pred = np.zeros((2, 8, 8), bool)
    gt = np.zeros((2, 8, 8), bool)
    pred[0, :4], pred[1, 4:] = True, True
    gt[0, :4], gt[1, 4:] = True, True
    r = average_precision(pred, gt, matcher="hungarian")
    assert r["ap50"] == 1.0
