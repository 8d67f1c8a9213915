"""InternLM2 parity vs torch reference goldens: padded forward, hidden
states, KV-cache prefill/decode, greedy generation, RoPE scaling."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config
from ullsam_tpu.convert.torch_internlm2 import convert_internlm2_state_dict
from ullsam_tpu.models.internlm2 import model as M
from ullsam_tpu.models.internlm2.generate import (GenerationConfig, generate,
                                                  last_valid_index)

TINY = InternLM2Config(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=32, bias=False, rope_theta=10000.0,
    pad_token_id=0, bos_token_id=1, eos_token_id=2)


def get_params(goldens):
    g = goldens("internlm2_tiny")
    return g, convert_internlm2_state_dict(g, TINY)


def test_forward_padded_parity(goldens):
    g, params = get_params(goldens)
    out = M.internlm2_forward(params, TINY,
                              input_ids=jnp.asarray(g["input_ids"]),
                              attention_mask=jnp.asarray(g["attention_mask"]),
                              output_hidden_states=True)
    valid = g["attention_mask"].astype(bool)  # only compare valid positions
    np.testing.assert_allclose(np.asarray(out["logits"])[valid],
                               g["logits"][valid], atol=2e-4, rtol=2e-4)
    # hidden_states: golden [L+1, B, S, H]; ours: per-layer inputs [L, B, S, H]
    # + post-norm last_hidden == golden[-1] after final norm? HF stores the
    # final entry post-norm; entries 0..L-1 are layer inputs.
    ours_inputs = np.asarray(out["hidden_states"])
    np.testing.assert_allclose(ours_inputs[:, valid],
                               g["hidden_states"][:-1][:, valid],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out["last_hidden"])[valid],
                               g["hidden_states"][-1][valid],
                               atol=2e-4, rtol=2e-4)


def test_prefill_matches_forward(goldens):
    g, params = get_params(goldens)
    ids = jnp.asarray(g["input_ids"])
    mask = jnp.asarray(g["attention_mask"])
    embeds = M.embed_tokens(params, ids)
    cache = M.init_cache(TINY, ids.shape[0], 16, dtype=jnp.float32)
    out, cache = M.internlm2_prefill(params, TINY, embeds, mask, cache)
    valid = g["attention_mask"].astype(bool)
    np.testing.assert_allclose(np.asarray(out["logits"])[valid],
                               g["logits"][valid], atol=2e-4, rtol=2e-4)
    assert int(cache.index) == ids.shape[1]


def test_greedy_generate_parity(goldens):
    g, params = get_params(goldens)
    ids = jnp.asarray(g["left_ids"])
    mask = jnp.asarray(g["left_attn"])
    embeds = M.embed_tokens(params, ids)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=2, pad_token_id=0)
    tokens, lengths = generate(params, TINY, gen, embeds, mask)
    expected = g["gen_new"]
    got = np.asarray(tokens)
    # compare up to each row's EOS (reference loop does not early-stop)
    for b in range(expected.shape[0]):
        n = int(lengths[b])
        np.testing.assert_array_equal(got[b, :n], expected[b, :n],
                                      err_msg=f"row {b}")


def test_decode_step_matches_full_forward(goldens):
    """Cache-based incremental decode must equal a fresh full forward."""
    g, params = get_params(goldens)
    ids = np.asarray(g["ids2"])  # [1, 8]
    embeds = M.embed_tokens(params, jnp.asarray(ids[:, :5]))
    cache = M.init_cache(TINY, 1, 12, dtype=jnp.float32)
    out, cache = M.internlm2_prefill(params, TINY, embeds,
                                     jnp.ones((1, 5), jnp.int32), cache)
    logits_steps = []
    for t in range(5, 8):
        emb = M.embed_tokens(params, jnp.asarray(ids[:, t:t + 1]))
        logits, cache = M.internlm2_decode_step(params, TINY, emb, cache)
        logits_steps.append(np.asarray(logits))
    full = M.internlm2_forward(params, TINY, input_ids=jnp.asarray(ids))
    full_logits = np.asarray(full["logits"])[0]
    for i, t in enumerate(range(5, 8)):
        np.testing.assert_allclose(logits_steps[i][0], full_logits[t],
                                   atol=2e-4, rtol=2e-4, err_msg=f"step {t}")


def test_rope_scaling_parity(goldens):
    g, _ = get_params(goldens)
    params = convert_internlm2_state_dict(g, TINY)
    ids = jnp.asarray(g["ids2"])

    lin_cfg = dataclasses.replace(TINY, rope_scaling_type="linear",
                                  rope_scaling_factor=2.0)
    out = M.internlm2_forward(params, lin_cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits_linear"],
                               atol=2e-4, rtol=2e-4)

    # dynamic NTK with max_position_embeddings forced to 4 (golden did same)
    dyn_cfg = dataclasses.replace(TINY, rope_scaling_type="dynamic",
                                  rope_scaling_factor=2.0,
                                  max_position_embeddings=4)
    out = M.internlm2_forward(params, dyn_cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits_dynamic"],
                               atol=2e-4, rtol=2e-4)


def test_last_valid_index():
    mask = jnp.asarray([[1, 1, 1, 0, 0], [0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])
    np.testing.assert_array_equal(np.asarray(last_valid_index(mask)),
                                  [2, 4, 4])


def test_gqa_fused_mask_matches_materialized():
    """gqa_attention's fused iota-causal + segment + [B,1,T] key-validity
    masking must equal the materialized causal_mask formulation it
    replaced (round 4: the [S,S] f32 additive mask never hits HBM)."""
    rng = np.random.RandomState(0)
    B, S, nh, nkv, hd = 2, 16, 4, 2, 8
    cfg = dataclasses.replace(TINY, num_attention_heads=nh,
                              num_key_value_heads=nkv)
    q = jnp.asarray(rng.randn(B, S, nh, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, nkv, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, nkv, hd), jnp.float32)
    att = np.ones((B, S), np.int32)
    att[0, 12:] = 0  # right padding on row 0

    dense = M.causal_mask(jnp.asarray(att), S, S)  # [B, S, S]
    ref = M.gqa_attention(q, k, v, dense, cfg)

    kmask = jnp.where(jnp.asarray(att).astype(bool), 0.0,
                      M.NEG_INF).astype(jnp.float32)[:, None, :]
    fused = M.gqa_attention(q, k, v, kmask, cfg, causal=True)
    # padded-query rows see the same keys either way; compare valid rows
    valid = att.astype(bool)
    np.testing.assert_allclose(np.asarray(fused)[valid],
                               np.asarray(ref)[valid], atol=1e-5)

    # packed segments: two docs per row must match the block-diag mask
    seg = np.ones((B, S), np.int32)
    seg[:, 8:] = 2
    segj = jnp.asarray(seg)
    cross = jnp.where(segj[:, :, None] == segj[:, None, :], 0.0, M.NEG_INF)
    ref_seg = M.gqa_attention(q, k, v, dense + cross, cfg)
    fused_seg = M.gqa_attention(q, k, v, kmask, cfg, causal=True,
                                seg=(segj, segj))
    np.testing.assert_allclose(np.asarray(fused_seg)[valid],
                               np.asarray(ref_seg)[valid], atol=1e-5)
