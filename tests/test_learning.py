"""End-to-end learning sanity: the tiny fusion model learns to segment
synthetic blobs (IoU rises substantially from random init)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_train import CFG
from ullsam_tpu.models.ullsam import fusion as F
from ullsam_tpu.train.step import (TrainConfig, make_train_step,
                                   make_trainable_optimizer)


def _blob_batch(seed, batch=4):
    rng = np.random.RandomState(seed)
    n_img_tok = CFG.num_image_token
    N = n_img_tok + 8
    ids = np.full((batch, N), 5, np.int32)
    ids[:, 2:2 + n_img_tok] = CFG.img_context_token_id
    S = 64
    imgs = np.zeros((batch, S, S, 3), np.float32)
    masks = np.zeros((batch, 1, S, S), np.float32)
    coords = np.zeros((batch, 1, 1, 2), np.float32)
    for b in range(batch):
        cy, cx = rng.randint(16, 48, 2)
        r = rng.randint(8, 14)
        yy, xx = np.mgrid[:S, :S]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        imgs[b, :, :, 0] = blob * 0.9 + 0.05      # bright blob on channel 0
        imgs[b] += rng.rand(S, S, 3) * 0.05
        masks[b, 0] = blob
        coords[b, 0, 0] = (cx, cy)
    return {
        "pixel_values": imgs,
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
        "point_coords": coords,
        "point_labels": np.ones((batch, 1, 1), np.int32),
        "masks": masks,
        "instance_valid": np.ones((batch, 1), np.float32),
    }


def test_learns_blob_segmentation():
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    # long total_steps keeps the cosine schedule ~flat over the test
    tcfg = TrainConfig(learning_rate=5e-3, total_steps=2000,
                       warmup_ratio=0.005, weight_decay=0.0)
    tx, trainable, frozen = make_trainable_optimizer(params, tcfg)
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, tcfg, tx, donate=False)

    ious = []
    for i in range(110):
        batch = jax.tree_util.tree_map(jnp.asarray, _blob_batch(i % 8))
        trainable, opt_state, m = step(trainable, frozen, opt_state, batch)
        ious.append(float(np.asarray(m["iou"])))
    first = np.mean(ious[:5])
    last = np.mean(ious[-10:])
    assert last > first + 0.15, (first, last, ious[::10])
    assert last > 0.3, (first, last)
