"""Weight-only int8 (W8A16) serving quantization."""

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config
from ullsam_tpu.models.internlm2 import model as M
from ullsam_tpu.models.internlm2.quant import quantize_linear, quantize_llm_int8
from ullsam_tpu.ops import layers as L

CFG = InternLM2Config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=2048,
                      bias=False, rope_theta=10000.0,
                      pad_token_id=0, bos_token_id=1, eos_token_id=2)


def test_quantized_linear_matches_dequantized_kernel():
    k = jax.random.normal(jax.random.PRNGKey(0), (32, 48)) * 0.2
    p = {"kernel": k, "bias": jnp.ones((48,)) * 0.1}
    qp = quantize_linear(p)
    assert qp["qweight"].dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32))
    y_q = L.linear(qp, x)
    deq = qp["qweight"].astype(jnp.float32) * qp["qscale"][None, :]
    y_ref = L.linear({"kernel": deq, "bias": p["bias"]}, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_quantized_llm_decode_close_to_full_precision():
    params = M.internlm2_init(jax.random.PRNGKey(0), CFG)
    qparams = quantize_llm_int8(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 3, 256)
    out_f = M.internlm2_forward(params, CFG, input_ids=ids)
    out_q = M.internlm2_forward(qparams, CFG, input_ids=ids)
    a = np.asarray(out_f["logits"], np.float32).ravel()
    b = np.asarray(out_q["logits"], np.float32).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.999, cos
    # decode path runs too (cache write uses post-linear activations)
    cache = M.init_cache(CFG, 1, 32)
    _, cache = M.internlm2_prefill(
        qparams, CFG, M.embed_tokens(qparams, ids),
        jnp.ones_like(ids), cache)
    emb = M.embed_tokens(qparams, ids[:, :1])
    logits, cache = M.internlm2_decode_step(qparams, CFG, emb, cache)
    assert np.isfinite(np.asarray(logits)).all()
