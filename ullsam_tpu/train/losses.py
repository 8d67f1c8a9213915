"""Segmentation losses: BCE-with-logits, Dice, binary IoU.

Behavioral reference: train_joint_v2.py:605-812 (per-instance BCE + Dice,
equal weights; IoU at sigmoid>0.5, smooth 1e-7). Extended with a validity
mask so variable instance counts are padded, not Python-batched
(train_joint_v2.py:322-327 pads per-item; we mask in the loss instead).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Per-instance mean BCE. logits/targets [..., H, W] -> [...]."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|))
    per_px = (jnp.maximum(logits, 0.0) - logits * targets
              + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return per_px.mean(axis=(-2, -1))


def dice_loss(logits: Array, targets: Array, smooth: float = 1e-7) -> Array:
    """Per-instance Dice loss on sigmoided logits. [..., H, W] -> [...]."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    targets = targets.astype(jnp.float32)
    num = 2.0 * jnp.sum(probs * targets, axis=(-2, -1))
    den = jnp.sum(probs, axis=(-2, -1)) + jnp.sum(targets, axis=(-2, -1))
    return 1.0 - (num + smooth) / (den + smooth)


def binary_iou(logits: Array, targets: Array, smooth: float = 1e-7) -> Array:
    """Per-instance IoU at sigmoid>0.5 (no gradient). [..., H, W] -> [...]."""
    preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5).astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    inter = jnp.sum(preds * targets, axis=(-2, -1))
    union = jnp.sum(preds, axis=(-2, -1)) + jnp.sum(targets, axis=(-2, -1)) - inter
    return (inter + smooth) / (union + smooth)


def instance_seg_loss(pred_logits: Array, gt_masks: Array,
                      valid: Optional[Array] = None
                      ) -> Tuple[Array, dict]:
    """Masked-mean BCE+Dice over instances (calc_instance_loss semantics).

    pred_logits/gt_masks: [B, I, H, W]; valid: [B, I] (1 = real instance).
    Returns (total_loss, metrics dict with bce/dice/iou).
    """
    bce = bce_with_logits(pred_logits, gt_masks)   # [B, I]
    dice = dice_loss(pred_logits, gt_masks)        # [B, I]
    iou = jax.lax.stop_gradient(binary_iou(pred_logits, gt_masks))

    if valid is None:
        valid = jnp.ones(bce.shape, jnp.float32)
    valid = valid.astype(jnp.float32)
    denom = jnp.maximum(valid.sum(), 1.0)

    def masked_mean(x):
        return jnp.sum(x * valid) / denom

    bce_m, dice_m, iou_m = masked_mean(bce), masked_mean(dice), masked_mean(iou)
    total = bce_m + dice_m  # equal weights (train_joint_v2.py:799)
    return total, {"bce": bce_m, "dice": dice_m, "iou": iou_m,
                   "seg_loss": total}
