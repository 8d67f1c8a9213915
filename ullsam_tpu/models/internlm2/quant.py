"""Weight-only int8 quantization (W8A16) for InternLM2 serving.

Single-chip LLM decode is WEIGHT-BANDWIDTH bound: every step streams all
~1.9B parameters (3.8 GB bf16) through HBM. Per-output-channel symmetric
int8 halves that stream; activations stay bf16 and the scale applies on
the f32 accumulator (ops/layers.linear dispatches on the "qweight" key).

Inference-only: quantized params are not differentiable and must not be
fed to the training step. The reference has no quantized path (SURVEY
§2.5); this is a serving-stack extension, standard for production LLM
deployment.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """{kernel [..., in, out]} -> {qweight int8, qscale [..., out]}.

    Symmetric per-(layer, output-channel) scales: amax over the input
    axis / 127.
    """
    k = p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out = {"qweight": q, "qscale": scale.squeeze(-2)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


_QUANT_LAYER_KEYS = ("wqkv", "wo", "w1", "w2", "w3")


def quantize_llm_int8(llm_params: dict) -> dict:
    """Quantize the decode-path matmul weights of an InternLM2 param tree.

    Covers the stacked per-layer projections (wqkv/wo/w1/w2/w3) and the
    output head — together ~97% of decode HBM traffic. Embedding gathers
    and norm scales stay in their original dtype.
    """
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for key in _QUANT_LAYER_KEYS:
        layers[key] = quantize_linear(layers[key])
    out["layers"] = layers
    out["output"] = quantize_linear(llm_params["output"])
    return out
