"""Training step: fused forward -> instance segmentation loss -> optax update.

Behavioral reference: train_joint_v2.py train_epoch (:943-1242) — fused
forward with hidden states, LLM-conditioned dense prompt, per-instance point
prompts into the mask decoder, BCE+Dice at 1024^2, cosine schedule with
warmup, global-norm clip, AdamW with no-decay for bias/norm params, module
freezing. Differences by design:
  * vision tower runs ONCE per step (reference runs it twice, :1014-1021)
  * variable instance counts are padded + masked, not Python-looped
  * freezing via optax.multi_transform labels, not requires_grad mutation
  * the whole step is one jit-able pure function, data-parallel over a mesh
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ullsam_tpu.core.config import FusionConfig
from ullsam_tpu.core.tree import map_with_paths
from ullsam_tpu.models.ullsam import fusion as F
from ullsam_tpu.train.losses import instance_seg_loss

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    total_steps: int = 10000
    warmup_ratio: float = 0.03          # train_joint_v2.py:1742-1748
    max_grad_norm: float = 1.0
    seg_weight: float = 1.0
    llm_weight: float = 0.0             # reference zeroes the CE term (:1100)
    # regexes of trainable param paths; reference segment mode trains the
    # SAM tower + projectors and freezes the LLM (:1282-1310)
    trainable_patterns: Tuple[str, ...] = (r"sam\..*", r"mlp1\..*", r"mlp2\..*")
    # no weight decay for bias/norm/scale params (:1725-1739)
    no_decay_patterns: Tuple[str, ...] = (
        r".*\.bias", r".*norm.*", r".*\.scale", r".*ln.*", r".*pos_embed.*",
        r".*rel_pos.*", r".*embed.*")
    use_llm_hidden_states: bool = True  # False = baseline ablation
    freeze_vision: bool = False         # True = train.py semantics
    remat: bool = True                  # checkpoint ViT layers
    # checkpoint the LLM scan too; None follows `remat`. The segment mode
    # trains THROUGH a frozen LLM (activation grads only): at small batch
    # its saved activations fit easily and remat wastes a full 24-layer
    # recompute (~30 ms/step measured), so seg_loss_fn passes False unless
    # overridden.
    remat_llm: "Optional[bool]" = None
    # "indexed" pairs pred i with gt i (the reference's live path: one
    # prompt per GT instance); "hungarian" re-matches predictions to GTs
    # by soft IoU first (working variable_instance_loss analog,
    # train_joint_v2.py:698-940 — dead code upstream)
    instance_matching: str = "indexed"


def _match_any(path: str, patterns) -> bool:
    return any(re.fullmatch(p, path) for p in patterns)


def trainable_mask(params, tcfg: TrainConfig):
    pats = list(tcfg.trainable_patterns)
    if tcfg.freeze_vision:
        pats = [p for p in pats if not p.startswith(r"sam\.")]
    return map_with_paths(lambda p, x: _match_any(p, pats), params)


def partition_params(params, tcfg: TrainConfig):
    """Split into (trainable, frozen) trees with None holes.

    Differentiating only the trainable partition keeps the frozen 1.9B-param
    LLM out of the cotangent/optimizer path entirely (a full-tree grad
    materializes 7.7 GB of zeros per step).
    """
    mask = trainable_mask(params, tcfg)
    trainable = jax.tree_util.tree_map(
        lambda p, t: p if t else None, params, mask)
    frozen = jax.tree_util.tree_map(
        lambda p, t: None if t else p, params, mask)
    return trainable, frozen


def combine_params(trainable, frozen):
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b, trainable, frozen,
        is_leaf=lambda x: x is None)


def make_optimizer(params, tcfg: TrainConfig) -> optax.GradientTransformation:
    warmup = max(1, int(tcfg.total_steps * tcfg.warmup_ratio))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=tcfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(tcfg.total_steps, warmup + 1), end_value=0.0)
    decay_mask = map_with_paths(
        lambda p, x: not _match_any(p, tcfg.no_decay_patterns), params)
    return optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay,
                    mask=decay_mask),
    )


def make_trainable_optimizer(params, tcfg: TrainConfig,
                             grad_accum: int = 1):
    """(tx, trainable, frozen): optimizer over the trainable partition only.

    grad_accum > 1 wraps the transform in optax.MultiSteps (the reference
    trains with accumulation 8, train_joint_v2.py:1584,1169-1188)."""
    trainable, frozen = partition_params(params, tcfg)
    tx = make_optimizer(trainable, tcfg)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx, trainable, frozen


def seg_loss_fn(params, cfg: FusionConfig, tcfg: TrainConfig, batch: dict
                ) -> Tuple[Array, dict]:
    """Loss for one batch.

    batch keys:
      pixel_values   [B, S, S, 3]
      input_ids      [B, N]
      attention_mask [B, N]
      labels         [B, N] (CE labels, -100 masked; optional)
      point_coords   [B, I, P, 2]
      point_labels   [B, I, P]
      masks          [B, I, Hm, Wm] (ground-truth instance masks)
      instance_valid [B, I]
    """
    out = F.fusion_forward(
        params, cfg, batch["pixel_values"], batch["input_ids"],
        attention_mask=batch.get("attention_mask"),
        labels=batch.get("labels"),
        segment_ids=batch.get("segment_ids"),
        output_dense_prompt=(tcfg.use_llm_hidden_states
                             and tcfg.seg_weight != 0.0),
        stop_vision_gradient=False, remat=tcfg.remat,
        remat_llm=(tcfg.remat_llm if tcfg.remat_llm is not None
                   else (tcfg.remat if tcfg.seg_weight == 0.0 else False)))

    if tcfg.seg_weight == 0.0:
        # pretrain/sft modes: pure language CE, no mask decode
        metrics = {"llm_loss": out["loss"], "loss": out["loss"]}
        return out["loss"] * tcfg.llm_weight, metrics

    dense = out.get("dense_prompt")

    def per_image(feats_i, dense_i, coords_i, labels_i):
        low_res, _ = F.segment_with_prompts(
            params, cfg, feats_i[None],
            None if dense_i is None else dense_i[None],
            coords_i, labels_i, multimask_output=False)
        return low_res[:, 0]  # [I, 256, 256]

    if dense is None:
        low = jax.vmap(lambda f, c, l: per_image(f, None, c, l))(
            out["image_embeddings"], batch["point_coords"],
            batch["point_labels"])
    else:
        low = jax.vmap(per_image)(out["image_embeddings"], dense,
                                  batch["point_coords"],
                                  batch["point_labels"])

    Hm, Wm = batch["masks"].shape[-2:]
    if tcfg.instance_matching == "hungarian":
        from ullsam_tpu.ops.resize import bilinear_resize
        from ullsam_tpu.train.losses import hungarian_instance_loss
        up = bilinear_resize(low.astype(jnp.float32), Hm, Wm)  # (:1072-1078)
        seg_loss, metrics = hungarian_instance_loss(
            up, batch["masks"], batch.get("instance_valid"))
    else:
        # fused upsample(:1072-1078)+BCE+Dice: identical math, no full-res
        # residuals (see losses.upsampled_instance_seg_loss)
        from ullsam_tpu.train.losses import upsampled_instance_seg_loss
        seg_loss, metrics = upsampled_instance_seg_loss(
            low, batch["masks"], batch.get("instance_valid"))
    total = tcfg.seg_weight * seg_loss
    if tcfg.llm_weight and "loss" in out:
        total = total + tcfg.llm_weight * out["loss"]
    if "loss" in out:
        metrics["llm_loss"] = out["loss"]
    metrics["loss"] = total
    return total, metrics


def make_pred_masks_fn(cfg: FusionConfig, tcfg: TrainConfig):
    """jitted forward producing predicted instance-mask logits at GT
    resolution for visualization (the reference overlays pred-vs-GT
    boundaries to wandb every N steps, train_joint_v2.py:1125-1167).

    Signature: fn(params, batch) -> [B, I, Hm, Wm] float logits.
    Runs the same seg path as seg_loss_fn without the loss; call it only
    every image-log interval (it is one extra forward).
    """

    def fn(params, batch):
        out = F.fusion_forward(
            params, cfg, batch["pixel_values"], batch["input_ids"],
            attention_mask=batch.get("attention_mask"),
            output_dense_prompt=tcfg.use_llm_hidden_states,
            stop_vision_gradient=True, remat=False)
        dense = out.get("dense_prompt")

        def per_image(feats_i, dense_i, coords_i, labels_i):
            low_res, _ = F.segment_with_prompts(
                params, cfg, feats_i[None],
                None if dense_i is None else dense_i[None],
                coords_i, labels_i, multimask_output=False)
            return low_res[:, 0]

        if dense is None:
            low = jax.vmap(lambda f, c, l: per_image(f, None, c, l))(
                out["image_embeddings"], batch["point_coords"],
                batch["point_labels"])
        else:
            low = jax.vmap(per_image)(out["image_embeddings"], dense,
                                      batch["point_coords"],
                                      batch["point_labels"])
        Hm, Wm = batch["masks"].shape[-2:]
        from ullsam_tpu.ops.resize import bilinear_resize
        return bilinear_resize(low.astype(jnp.float32), Hm, Wm)

    return jax.jit(fn)


def train_step(trainable, frozen, opt_state, batch, cfg: FusionConfig,
               tcfg: TrainConfig, tx: optax.GradientTransformation):
    """One optimizer step over the trainable partition only."""

    def loss_fn(t):
        return seg_loss_fn(combine_params(t, frozen), cfg, tcfg, batch)

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(trainable)
    updates, opt_state = tx.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return trainable, opt_state, metrics


def make_train_step(cfg: FusionConfig, tcfg: TrainConfig,
                    tx: optax.GradientTransformation, donate: bool = True):
    """jit-compiled train step closure.

    Signature: step(trainable, frozen, opt_state, batch) ->
    (trainable, opt_state, metrics).

    donate defaults to True (round 5): donating trainable+opt_state lets
    XLA update parameters in place (flagship step 123.4 -> 121.5 ms
    measured through the relay; the round-2 "283 ms -> 14 s" relay
    donation pathology no longer reproduces — the same flip on the
    serving KV cache removed two full-cache copies per chunk). Callers
    MUST thread the returned (trainable, opt_state) and never reuse the
    donated-in trees (the CLI loop does); pass donate=False to compare
    repeated calls on one state (tests do).
    """

    def step(trainable, frozen, opt_state, batch):
        return train_step(trainable, frozen, opt_state, batch, cfg, tcfg, tx)

    return jax.jit(step, donate_argnums=(0, 2) if donate else ())
