"""Training-step tests: loss decreases, freezing works, data-parallel
sharding matches single-device results on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import (FusionConfig, InternLM2Config,
                                    MaskDecoderConfig, PromptEncoderConfig,
                                    SamConfig, ViTConfig)
from ullsam_tpu.core.tree import flatten_with_paths
from ullsam_tpu.models.ullsam import fusion as F
from ullsam_tpu.parallel.partitioning import (create_mesh, shard_batch,
                                              shard_params)
from ullsam_tpu.train.step import (TrainConfig, combine_params,
                                   make_train_step,
                                   make_trainable_optimizer, seg_loss_fn,
                                   trainable_mask)

CFG = FusionConfig(
    sam=SamConfig(
        vit=ViTConfig(img_size=64, patch_size=8, embed_dim=16, depth=2,
                      num_heads=2, mlp_ratio=2.0, out_chans=16,
                      window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoderConfig(
            embed_dim=16, image_embedding_size=(8, 8),
            input_image_size=(64, 64), mask_in_chans=8),
        mask_decoder=MaskDecoderConfig(transformer_dim=16,
                                       transformer_mlp_dim=32,
                                       transformer_num_heads=2,
                                       iou_head_hidden_dim=8)),
    llm=InternLM2Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2),
    vit_feature_dim=16,
    img_context_token_id=50)

TCFG = TrainConfig(learning_rate=1e-3, total_steps=100)


def make_batch(batch_size=2, n_inst=3, n_pts=2, seed=0):
    rng = np.random.RandomState(seed)
    n_img_tok = CFG.num_image_token  # 16
    N = n_img_tok + 8
    ids = np.full((batch_size, N), 5, np.int32)
    ids[:, 2:2 + n_img_tok] = CFG.img_context_token_id
    labels = np.where(ids == CFG.img_context_token_id, -100, ids)
    return {
        "pixel_values": rng.rand(batch_size, 64, 64, 3).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
        "labels": labels.astype(np.int32),
        "point_coords": (rng.rand(batch_size, n_inst, n_pts, 2) * 64
                         ).astype(np.float32),
        "point_labels": rng.randint(0, 2, (batch_size, n_inst, n_pts)
                                    ).astype(np.int32),
        "masks": (rng.rand(batch_size, n_inst, 64, 64) > 0.7
                  ).astype(np.float32),
        "instance_valid": (np.arange(n_inst)[None, :]
                           <= rng.randint(0, n_inst, (batch_size, 1))
                           ).astype(np.float32),
    }


def test_hungarian_instance_loss():
    """variable_instance_loss analog (train_joint_v2.py:698-940): the
    on-device assignment is optimal (vs scipy), the loss is invariant to
    GT permutation, and gradients flow through matched predictions."""
    from scipy.optimize import linear_sum_assignment
    from ullsam_tpu.train.losses import (hungarian_instance_loss,
                                         instance_seg_loss)

    rng = np.random.RandomState(1)
    B, P, G, H, W = 2, 5, 4, 16, 16
    pred = jnp.asarray(rng.randn(B, P, H, W) * 3, jnp.float32)
    gt = jnp.asarray((rng.rand(B, G, H, W) > 0.7).astype(np.float32))
    valid = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)

    total, metrics = jax.jit(hungarian_instance_loss)(pred, gt, valid)
    assert np.isfinite(float(total))

    # the on-device match attains scipy's optimal cost
    probs = jax.nn.sigmoid(pred)
    pf = np.asarray(probs.reshape(B, P, -1))
    gf = np.asarray(gt.reshape(B, G, -1))
    v = np.asarray(valid)
    import optax
    for b in range(B):
        inter = pf[b] @ gf[b].T
        union = pf[b].sum(-1)[:, None] + gf[b].sum(-1)[None] - inter
        cost = 1 - inter / (union + 1e-7)
        cost = np.where(v[b][None] > 0, cost, 1.0)
        ri, ci = linear_sum_assignment(cost)
        oi, oj = optax.assignment.hungarian_algorithm(jnp.asarray(cost))
        np.testing.assert_allclose(
            float(cost[np.asarray(oi), np.asarray(oj)].sum()),
            float(cost[ri, ci].sum()), rtol=1e-6)

    # invariant to permuting the GT instances (with their validity)
    perm = np.asarray([2, 0, 3, 1])
    total_p, _ = jax.jit(hungarian_instance_loss)(
        pred, gt[:, perm], valid[:, perm])
    np.testing.assert_allclose(float(total), float(total_p), rtol=1e-5)

    # perfectly-aligned preds: matching recovers the identity pairing,
    # so the loss equals the indexed loss on the first G preds
    big = jnp.asarray(np.where(np.asarray(gt) > 0, 20.0, -20.0))
    big_pad = jnp.concatenate(
        [big, jnp.full((B, P - G, H, W), -20.0)], axis=1)
    t_h, _ = hungarian_instance_loss(big_pad, gt, valid)
    t_i, _ = instance_seg_loss(big, gt, valid)
    np.testing.assert_allclose(float(t_h), float(t_i), rtol=1e-5)

    g = jax.grad(lambda p: hungarian_instance_loss(p, gt, valid)[0])(pred)
    assert float(jnp.abs(g).max()) > 0 and np.isfinite(np.asarray(g)).all()


def test_fused_upsampled_loss_matches_materialized():
    """upsampled_instance_seg_loss == instance_seg_loss(bilinear_resize(.))
    in values, metrics, AND gradient wrt the low-res logits (the fused
    path is the train-step default; same math, reassociated sums)."""
    from ullsam_tpu.ops.resize import bilinear_resize
    from ullsam_tpu.train.losses import (instance_seg_loss,
                                         upsampled_instance_seg_loss)

    rng = np.random.RandomState(3)
    B, I, h, H = 2, 3, 16, 64
    low = jnp.asarray(rng.randn(B, I, h, h) * 2, jnp.float32)
    gt = jnp.asarray((rng.rand(B, I, H, H) > 0.6).astype(np.float32))
    valid = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)

    def ref(lo):
        return instance_seg_loss(bilinear_resize(lo, H, H), gt, valid)

    def fused(lo):
        return upsampled_instance_seg_loss(lo, gt, valid)

    (t_r, m_r), g_r = jax.value_and_grad(ref, has_aux=True)(low)
    (t_f, m_f), g_f = jax.value_and_grad(fused, has_aux=True)(low)
    np.testing.assert_allclose(float(t_r), float(t_f), rtol=2e-5)
    for k in ("bce", "dice", "iou"):
        np.testing.assert_allclose(float(m_r[k]), float(m_f[k]), rtol=2e-5,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_f),
                               rtol=1e-4, atol=1e-6)


def test_train_step_runs_and_loss_decreases():
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    tx, trainable, frozen = make_trainable_optimizer(params, TCFG)
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, TCFG, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch())
    losses = []
    for _ in range(5):
        trainable, opt_state, metrics = step(trainable, frozen, opt_state,
                                             batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(metrics["iou"]) <= 1.0


def test_train_step_hungarian_matching():
    import dataclasses
    tcfg = dataclasses.replace(TCFG, instance_matching="hungarian")
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    tx, trainable, frozen = make_trainable_optimizer(params, tcfg)
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, tcfg, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch())
    for _ in range(2):
        trainable, opt_state, metrics = step(trainable, frozen, opt_state,
                                             batch)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["iou"]) <= 1.0


def test_frozen_params_unchanged():
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    tx, trainable, frozen = make_trainable_optimizer(params, TCFG)
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, TCFG, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch())
    before = flatten_with_paths(jax.tree_util.tree_map(np.asarray, params))
    # two steps: the warmup schedule makes the very first update lr=0
    t2, opt_state, _ = step(trainable, frozen, opt_state, batch)
    t2, _, _ = step(t2, frozen, opt_state, batch)
    after = flatten_with_paths(jax.tree_util.tree_map(
        np.asarray, combine_params(t2, frozen)))
    mask = flatten_with_paths(trainable_mask(params, TCFG))
    changed_frozen = [p for p, m in mask.items()
                      if not m and not np.array_equal(before[p], after[p])]
    assert not changed_frozen, changed_frozen
    # at least some trainable params moved
    moved = [p for p, m in mask.items()
             if m and not np.array_equal(before[p], after[p])]
    assert moved


def test_data_parallel_matches_single_device():
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(batch_size=2))

    # single device
    loss_single, _ = seg_loss_fn(params, CFG, tcfg, batch)

    # 2-way data parallel x 4-way model parallel over the fake mesh
    mesh = create_mesh(dp=2, tp=4)
    p_sharded = shard_params(params, mesh)
    b_sharded = shard_batch(batch, mesh)
    with jax.sharding.set_mesh(mesh):
        loss_dp, _ = jax.jit(
            lambda p, b: seg_loss_fn(p, CFG, tcfg, b))(p_sharded, b_sharded)
    np.testing.assert_allclose(float(loss_dp), float(loss_single),
                               rtol=2e-5, atol=2e-5)


def test_full_train_step_on_mesh():
    """One full sharded train step compiles and executes on the 8-CPU mesh."""
    params = F.fusion_init(jax.random.PRNGKey(1), CFG)
    mesh = create_mesh(dp=4, tp=2)
    p = shard_params(params, mesh)
    tx, trainable, frozen = make_trainable_optimizer(p, TCFG)
    opt_state = tx.init(trainable)
    batch = shard_batch(jax.tree_util.tree_map(
        jnp.asarray, make_batch(batch_size=4)), mesh)
    step = make_train_step(CFG, TCFG, tx, donate=False)
    with jax.sharding.set_mesh(mesh):
        t2, opt2, metrics = step(trainable, frozen, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accumulation():
    """MultiSteps: params move only every k-th microbatch."""
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    tx, trainable, frozen = make_trainable_optimizer(params, TCFG,
                                                     grad_accum=2)
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, TCFG, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch())
    t0 = trainable
    t1, opt_state, _ = step(t0, frozen, opt_state, batch)   # accumulate
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()), t0, t1))
    assert same, "params must not move on the accumulation microstep"
    t2, opt_state, _ = step(t1, frozen, opt_state, batch)   # update (lr=0 warmup)
    t3, opt_state, _ = step(t2, frozen, opt_state, batch)
    t4, opt_state, _ = step(t3, frozen, opt_state, batch)   # 2nd update
    moved = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()), t0, t4))
    assert moved, "params should move after enough accumulation steps"


def test_train_step_bf16_params():
    """bf16 training path (the reference's deepspeed-bf16 configuration):
    the whole step runs with bf16 params — this covers the conv-vjp dtype
    pairing (f32 cotangent vs bf16 kernel) that broke when the vision
    tower first ran at bf16, and the prompt-encoder f32 -> decoder
    promotion. Loss must be finite and close to the f32 loss."""
    from ullsam_tpu.core.tree import cast_floating
    params = F.fusion_init(jax.random.PRNGKey(0), CFG)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch())

    tx32, t32, f32 = make_trainable_optimizer(params, TCFG)
    _, _, m32 = make_train_step(CFG, TCFG, tx32, donate=False)(
        t32, f32, tx32.init(t32), batch)

    bp = cast_floating(params, jnp.bfloat16)
    tx, trainable, frozen = make_trainable_optimizer(bp, TCFG)
    opt_state = tx.init(trainable)
    step = make_train_step(CFG, TCFG, tx, donate=False)
    losses = []
    for _ in range(3):
        trainable, opt_state, metrics = step(trainable, frozen, opt_state,
                                             batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    # bf16 loss tracks the f32 loss (tiny shapes: rounding stays small)
    assert abs(losses[0] - float(m32["loss"])) < 0.05, (
        losses[0], float(m32["loss"]))
    assert losses[-1] <= losses[0] + 0.05, losses
    # params stayed bf16 through the update
    dts = {l.dtype for l in jax.tree.leaves(trainable)
           if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)}
    assert dts == {jnp.dtype(jnp.bfloat16)}, dts
