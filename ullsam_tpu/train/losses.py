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


def hungarian_instance_loss(pred_logits: Array, gt_masks: Array,
                            gt_valid: Optional[Array] = None
                            ) -> Tuple[Array, dict]:
    """Hungarian-matched instance loss (variable_instance_loss analog).

    Behavioral reference: train_joint_v2.py:698-940 (`hungarian_matching`
    + `variable_instance_loss` — dead code upstream, defined but never
    called). Semantics preserved: soft-IoU cost 1 - IoU(sigmoid(pred),
    gt) with padding cost 1.0 for invalid columns (:726-749), optimal
    assignment, then per-pair BCE + Dice averaged over valid pairs
    (:894-931). Deviations (this is the *working* version):
      * gradients actually flow — upstream accumulates `.item()`s
        (:920-925) so its loss tensor is constant; here the assignment is
        a `stop_gradient` DETR-style match and BCE/Dice differentiate
        through the gathered predictions.
      * fully jittable: variable instance counts come in PADDED with a
        `gt_valid` mask instead of per-item Python loops, and the
        assignment runs on-device (`optax.assignment.hungarian_algorithm`,
        Jonker-Volgenant) instead of scipy on host — no host round trip
        per step.

    pred_logits [B, P, H, W]; gt_masks [B, G, H, W]; gt_valid [B, G]
    (1 = real instance; None = all real). Requires P >= G so every real
    GT can be matched (the padded-cost columns absorb extra preds).
    Returns (total_loss, metrics) like instance_seg_loss.
    """
    import optax

    B, P = pred_logits.shape[:2]
    G = gt_masks.shape[1]
    if P < G:
        raise ValueError(f"need preds >= gt slots, got P={P} < G={G}")
    if gt_valid is None:
        gt_valid = jnp.ones((B, G), jnp.float32)
    gt_valid = gt_valid.astype(jnp.float32)

    probs = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    pf = probs.reshape(B, P, -1)
    gf = gt_masks.astype(jnp.float32).reshape(B, G, -1)
    inter = jnp.einsum("bph,bgh->bpg", pf, gf)
    union = (pf.sum(-1)[:, :, None] + gf.sum(-1)[:, None, :] - inter)
    iou = inter / (union + 1e-7)                    # (:735-738)
    cost = 1.0 - iou
    # invalid gt columns cost exactly 1.0, like the reference's padding
    # columns (:743-749); ties then resolve away from real columns
    cost = jnp.where(gt_valid[:, None, :] > 0, cost, 1.0)
    cost = jax.lax.stop_gradient(cost)

    # one pred per gt column (P >= G): i[b], j[b] each [G]
    i_idx, j_idx = jax.vmap(optax.assignment.hungarian_algorithm)(cost)

    matched_pred = jnp.take_along_axis(
        pred_logits, i_idx[:, :, None, None], axis=1)     # [B, G, H, W]
    matched_gt = jnp.take_along_axis(
        gt_masks, j_idx[:, :, None, None], axis=1)
    pair_valid = jnp.take_along_axis(gt_valid, j_idx, axis=1)

    return instance_seg_loss(matched_pred, matched_gt, pair_valid)


@jax.custom_vjp
def _upsampled_seg_sums(low: Array, gt: Array, mh: Array, mw: Array
                        ) -> Tuple[Array, ...]:
    """Per-instance reduced loss sums of bilinear-upsampled logits.

    Computes every reduction BCE/Dice/IoU need over ``up = mh @ low @ mwᵀ``
    WITHOUT keeping full-resolution residuals for the backward: the custom
    VJP saves only ``low``/``gt`` and recomputes ``up`` tile-free in one
    fused pass. The linear BCE term is pulled to low resolution exactly
    (``sum(up*gt) = sum(low * (mhᵀ gt mw))``), so its gradient is a
    constant low-res tensor. Replaces the reference's materialized
    F.interpolate→BCE/Dice chain (train_joint_v2.py:605-812,1072-1078),
    which XLA otherwise turns into ~30 ms of full-res elementwise fusions
    per step (docs/BENCHMARKS.md round-3 audit).

    low [..., h, w] float; gt [..., H, W] in {0,1}; mh [H, h]; mw [W, w].
    Returns per-instance ``[...]``-shaped sums:
      (softplus(up), up*gt, sigmoid(up), sigmoid(up)*gt, gt,
       1[up>0]*gt, 1[up>0])
    """
    return _upsampled_seg_sums_fwd(low, gt, mh, mw)[0]


def _upsampled_seg_sums_fwd(low, gt, mh, mw):
    low = low.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    up = jnp.einsum("jw,...hw->...hj", mw, low,
                    preferred_element_type=jnp.float32)
    up = jnp.einsum("ih,...hj->...ij", mh, up,
                    preferred_element_type=jnp.float32)
    gt_low = jnp.einsum("ih,...ij->...hj", mh, gt,
                        preferred_element_type=jnp.float32)
    gt_low = jnp.einsum("jw,...hj->...hw", mw, gt_low,
                        preferred_element_type=jnp.float32)
    red = (-2, -1)
    softplus = jnp.maximum(up, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(up)))
    sig = jax.nn.sigmoid(up)
    hard = (up > 0.0).astype(jnp.float32)
    sums = (jnp.sum(softplus, red),
            jnp.sum(low * gt_low, red),
            jnp.sum(sig, red),
            jnp.sum(sig * gt, red),
            jnp.sum(gt, red),
            jnp.sum(hard * gt, red),
            jnp.sum(hard, red))
    return sums, (low, gt, gt_low, mh, mw)


def _upsampled_seg_sums_bwd(res, cts):
    low, gt, gt_low, mh, mw = res
    a_sp, a_upgt, a_sig, a_siggt, _, _, _ = cts  # hard/gt sums: no grad
    up = jnp.einsum("jw,...hw->...hj", mw, low,
                    preferred_element_type=jnp.float32)
    up = jnp.einsum("ih,...hj->...ij", mh, up,
                    preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(up)
    dsig = sig * (1.0 - sig)
    # d(sum)/d(up), all terms in ONE full-res pass
    g = (a_sp[..., None, None] * sig
         + a_sig[..., None, None] * dsig
         + a_siggt[..., None, None] * (dsig * gt))
    d_low = jnp.einsum("ih,...ij->...hj", mh, g,
                       preferred_element_type=jnp.float32)
    d_low = jnp.einsum("jw,...hj->...hw", mw, d_low,
                       preferred_element_type=jnp.float32)
    d_low = d_low + a_upgt[..., None, None] * gt_low
    return (d_low, jnp.zeros_like(gt), jnp.zeros_like(mh),
            jnp.zeros_like(mw))


_upsampled_seg_sums.defvjp(_upsampled_seg_sums_fwd, _upsampled_seg_sums_bwd)


def upsampled_instance_seg_loss(low_logits: Array, gt_masks: Array,
                                valid: Optional[Array] = None,
                                smooth: float = 1e-7
                                ) -> Tuple[Array, dict]:
    """instance_seg_loss(bilinear_resize(low, H, W), gt) — fused.

    Exactly the BCE+Dice+IoU of the upsampled logits (same math,
    reassociated reductions) with no [.., H, W] residuals saved for the
    backward. low_logits [B, I, h, w]; gt_masks [B, I, H, W].
    """
    from ullsam_tpu.ops.resize import _bilinear_matrix

    H, W = gt_masks.shape[-2:]
    h, w = low_logits.shape[-2:]
    mh = jnp.asarray(_bilinear_matrix(H, h))
    mw = jnp.asarray(_bilinear_matrix(W, w))
    gt = jax.lax.stop_gradient(gt_masks.astype(jnp.float32))
    (s_softplus, s_upgt, s_sig, s_siggt, s_gt, s_hardgt,
     s_hard) = _upsampled_seg_sums(low_logits, gt, mh, mw)

    npx = float(H * W)
    bce = (s_softplus - s_upgt) / npx                       # [B, I]
    dice = 1.0 - (2.0 * s_siggt + smooth) / (s_sig + s_gt + smooth)
    iou = jax.lax.stop_gradient(
        (s_hardgt + smooth) / (s_hard + s_gt - s_hardgt + smooth))

    if valid is None:
        valid = jnp.ones(bce.shape, jnp.float32)
    valid = valid.astype(jnp.float32)
    denom = jnp.maximum(valid.sum(), 1.0)

    def masked_mean(x):
        return jnp.sum(x * valid) / denom

    bce_m, dice_m, iou_m = masked_mean(bce), masked_mean(dice), masked_mean(iou)
    total = bce_m + dice_m
    return total, {"bce": bce_m, "dice": dice_m, "iou": iou_m,
                   "seg_loss": total}


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
