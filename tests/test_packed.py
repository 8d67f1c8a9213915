"""Packed-sequence (segment-id) training path: packing several documents
into one row must reproduce the per-document forward exactly (attention
confined to segments, RoPE restarting, CE shift masked at boundaries)."""

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config
from ullsam_tpu.models.internlm2 import model as M

CFG = InternLM2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=2048,
                      bias=False, rope_theta=10000.0,
                      pad_token_id=0, bos_token_id=1, eos_token_id=2)


def _params():
    from ullsam_tpu.models.internlm2.model import internlm2_init
    return internlm2_init(jax.random.PRNGKey(0), CFG)


def test_packed_forward_matches_separate_rows():
    params = _params()
    rng = np.random.RandomState(0)
    d1 = rng.randint(3, 128, size=11).astype(np.int32)
    d2 = rng.randint(3, 128, size=7).astype(np.int32)

    # packed: one row [d1 | d2 | pad]
    S = 24
    ids = np.zeros((1, S), np.int32)
    seg = np.zeros((1, S), np.int32)
    ids[0, :11] = d1
    seg[0, :11] = 1
    ids[0, 11:18] = d2
    seg[0, 11:18] = 2
    out_p = M.internlm2_forward(params, CFG, input_ids=jnp.asarray(ids),
                                segment_ids=jnp.asarray(seg))

    out_1 = M.internlm2_forward(params, CFG, input_ids=jnp.asarray(d1[None]))
    out_2 = M.internlm2_forward(params, CFG, input_ids=jnp.asarray(d2[None]))

    lp = np.asarray(out_p["logits"], np.float32)
    np.testing.assert_allclose(lp[0, :11], np.asarray(out_1["logits"])[0],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(lp[0, 11:18], np.asarray(out_2["logits"])[0],
                               atol=1e-4, rtol=1e-4)


def test_pack_examples_and_iterator():
    from ullsam_tpu.data.datasets import pack_examples

    def ex(n, tok, img=None):
        e = {"input_ids": np.full(16, tok, np.int32),
             "attention_mask": np.asarray([1] * n + [0] * (16 - n),
                                          np.int32),
             "labels": np.full(16, tok, np.int32)}
        if img is not None:
            e["pixel_values"] = np.full((4, 4, 3), img, np.float32)
        return e

    packed = pack_examples([ex(5, 7, img=1.0), ex(3, 9, img=2.0)], 12, 0)
    ids = packed["input_ids"][0]
    seg = packed["segment_ids"][0]
    assert list(ids[:5]) == [7] * 5 and list(ids[5:8]) == [9] * 3
    assert list(seg) == [1] * 5 + [2] * 3 + [0] * 4
    assert list(packed["labels"][0][8:]) == [-100] * 4
    assert packed["pixel_values"].shape == (2, 4, 4, 3)
    assert packed["pixel_values"][0, 0, 0, 0] == 1.0


def test_fusion_packed_loss_masks_boundaries():
    """The packed CE must not score the cross-document prediction."""
    from ullsam_tpu.core.config import (FusionConfig, MaskDecoderConfig,
                                        PromptEncoderConfig, SamConfig,
                                        ViTConfig)
    from ullsam_tpu.models.ullsam import fusion as F

    cfg = FusionConfig(
        sam=SamConfig(
            vit=ViTConfig(img_size=64, patch_size=8, embed_dim=16, depth=1,
                          num_heads=2, mlp_ratio=1.0, out_chans=256,
                          window_size=2, global_attn_indexes=()),
            prompt_encoder=PromptEncoderConfig(),
            mask_decoder=MaskDecoderConfig(transformer_mlp_dim=32,
                                           transformer_num_heads=4,
                                           iou_head_hidden_dim=8)),
        llm=CFG, img_context_token_id=100)
    params = F.fusion_init(jax.random.PRNGKey(0), cfg)

    n_img = cfg.num_image_token
    S = 2 * (n_img + 4)
    ids = np.full((1, S), 11, np.int32)
    seg = np.zeros((1, S), np.int32)
    for d in range(2):
        off = d * (n_img + 4)
        ids[0, off + 1:off + 1 + n_img] = cfg.img_context_token_id
        seg[0, off:off + n_img + 4] = d + 1
    labels = ids.copy()
    labels[ids == cfg.img_context_token_id] = -100
    pixels = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)

    out = F.fusion_forward(params, cfg, jnp.asarray(pixels),
                           jnp.asarray(ids), labels=jnp.asarray(labels),
                           segment_ids=jnp.asarray(seg))
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (1, S, CFG.vocab_size)


import pytest


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_tp_sharded_decode_matches_replicated(tp):
    """Multi-chip SERVING: the continuous-batching decode step under a
    ('data','model') mesh with Megatron-TP sharded LLM params + the KV
    cache sharded over kv heads reproduces the single-device step (XLA
    inserts all collectives). tp=2/4/8 — the flagship's 8 kv heads divide
    all three; here the tiny config carries 8 kv heads for the same
    reason."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ullsam_tpu.parallel.partitioning import create_mesh, shard_params

    # 8 kv heads so every tp degree divides evenly (flagship layout)
    cfg = InternLM2Config(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=8, num_key_value_heads=8,
                          max_position_embeddings=2048, bias=False,
                          rope_theta=10000.0, pad_token_id=0,
                          bos_token_id=1, eos_token_id=2)
    from ullsam_tpu.models.internlm2.model import internlm2_init
    params = internlm2_init(jax.random.PRNGKey(0), cfg)
    B, max_len = 2, 64
    cache = M.init_cache(cfg, B, max_len)
    rng = np.random.RandomState(0)
    # fake a 10-token prefill state
    k0 = rng.randn(*cache.k.shape).astype(np.float32) * 0.1
    v0 = rng.randn(*cache.v.shape).astype(np.float32) * 0.1
    mask = np.zeros((B, max_len), np.int32)
    mask[:, :10] = 1
    cache = M.KVCache(k=jnp.asarray(k0, cache.k.dtype),
                      v=jnp.asarray(v0, cache.v.dtype),
                      mask=jnp.asarray(mask), index=cache.index)
    emb = jnp.asarray(rng.randn(B, 1, cfg.hidden_size) * 0.1, jnp.float32)
    active = jnp.ones((B,), bool)

    ref_logits, ref_cache = M.internlm2_decode_step_multi(
        params, cfg, emb, cache, active)

    mesh = create_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
    p = shard_params({"llm": params}, mesh)["llm"]
    kv_spec = NamedSharding(mesh, P(None, None, None, "model", None))
    sc = M.KVCache(k=jax.device_put(cache.k, kv_spec),
                   v=jax.device_put(cache.v, kv_spec),
                   mask=jax.device_put(cache.mask, NamedSharding(mesh, P())),
                   index=jax.device_put(cache.index,
                                        NamedSharding(mesh, P())))
    with jax.sharding.set_mesh(mesh):
        step = jax.jit(lambda pp, e, c, a: M.internlm2_decode_step_multi(
            pp, cfg, e, c, a))
        logits, _ = step(p, emb, sc, active)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-5, rtol=2e-5)
