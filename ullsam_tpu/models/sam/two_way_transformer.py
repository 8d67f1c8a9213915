"""SAM TwoWayTransformer, TPU-native.

Behavioral reference: /root/reference/modeling/transformer.py (depth-2
decoder alternating token self-attn, token->image cross-attn, MLP, and
image->token cross-attn, with positional encodings re-added at every layer
and skipped on the first self-attn). Attention projections may downsample
the internal dim (downsample_rate=2 for cross-attn, transformer.py:187-208).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import MaskDecoderConfig
from ullsam_tpu.ops import layers as L
from ullsam_tpu.ops import attention as A

Array = jax.Array


def _proj_attn_init(key, dim: int, num_heads: int, downsample_rate: int = 1) -> dict:
    internal = dim // downsample_rate
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": L.linear_init(k1, dim, internal),
        "k": L.linear_init(k2, dim, internal),
        "v": L.linear_init(k3, dim, internal),
        "out": L.linear_init(k4, internal, dim),
    }


def _proj_attn(params: dict, q: Array, k: Array, v: Array, num_heads: int) -> Array:
    """Attention with q/k/v/out projections (transformer.py:220-242).

    Head split via einsum on [B, N, h, d] — no explicit transposes: the
    materialized [B, h, N, d] copies were ~20% of the 256-prompt decode.
    """
    q = L.linear(params["q"], q)
    k = L.linear(params["k"], k)
    v = L.linear(params["v"], v)
    B, Nq, C = q.shape
    Bk, Nk = k.shape[0], k.shape[1]
    hd = C // num_heads
    qh = q.reshape(B, Nq, num_heads, hd)
    kh = k.reshape(Bk, Nk, num_heads, hd)
    vh = v.reshape(Bk, Nk, num_heads, hd)
    if Bk == 1 and B > 1:
        # shared keys/values across the prompt batch (AMG fast path): the
        # k/v projections above ran ONCE on [1, Nk, C]
        logits = jnp.einsum("bqhd,khd->bhqk", qh, kh[0],
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (hd ** -0.5), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,khd->bqhd", probs, vh[0],
                         preferred_element_type=jnp.float32)
        B_out = B
    elif B == 1 and Bk > 1:
        # shared queries, per-prompt keys (block-1 image->token update)
        logits = jnp.einsum("qhd,bkhd->bhqk", qh[0], kh,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=jnp.float32)
        B_out = Bk
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=jnp.float32)
        B_out = B
    out = out.reshape(B_out, Nq, C).astype(q.dtype)
    return L.linear(params["out"], out)


def _block_init(key, cfg: MaskDecoderConfig) -> dict:
    d = cfg.transformer_dim
    keys = jax.random.split(key, 4)
    return {
        "self_attn": _proj_attn_init(keys[0], d, cfg.transformer_num_heads),
        "norm1": L.layer_norm_init(d),
        "cross_attn_t2i": _proj_attn_init(keys[1], d, cfg.transformer_num_heads,
                                          cfg.attention_downsample_rate),
        "norm2": L.layer_norm_init(d),
        "mlp": L.mlp_block_init(keys[2], d, cfg.transformer_mlp_dim),
        "norm3": L.layer_norm_init(d),
        "norm4": L.layer_norm_init(d),
        "cross_attn_i2t": _proj_attn_init(keys[3], d, cfg.transformer_num_heads,
                                          cfg.attention_downsample_rate),
    }


def two_way_transformer_init(key, cfg: MaskDecoderConfig) -> dict:
    keys = jax.random.split(key, cfg.transformer_depth + 1)
    return {
        "layers": [_block_init(keys[i], cfg) for i in range(cfg.transformer_depth)],
        "final_attn_t2i": _proj_attn_init(keys[-1], cfg.transformer_dim,
                                          cfg.transformer_num_heads,
                                          cfg.attention_downsample_rate),
        "norm_final": L.layer_norm_init(cfg.transformer_dim),
    }


def _block_apply(params: dict, cfg: MaskDecoderConfig, queries: Array,
                 keys: Array, query_pe: Array, key_pe: Array,
                 skip_first_layer_pe: bool) -> Tuple[Array, Array]:
    """keys may carry batch 1 while queries carry the prompt batch (shared
    image embedding): key-side projections then run once, and keys
    materialize per prompt only at this block's image->token update."""
    nh = cfg.transformer_num_heads
    eps = cfg.ln_eps
    B = queries.shape[0]
    # token self-attention (transformer.py:156-163)
    if skip_first_layer_pe:
        queries = _proj_attn(params["self_attn"], queries, queries, queries, nh)
    else:
        q = queries + query_pe
        queries = queries + _proj_attn(params["self_attn"], q, q, queries, nh)
    queries = L.layer_norm(params["norm1"], queries, eps=eps)
    # token -> image cross-attention
    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _proj_attn(params["cross_attn_t2i"], q, k, keys, nh)
    queries = L.layer_norm(params["norm2"], queries, eps=eps)
    # MLP (ReLU, transformer.py:23 default activation)
    queries = queries + L.mlp_block(params["mlp"], queries, act=jax.nn.relu)
    queries = L.layer_norm(params["norm3"], queries, eps=eps)
    # image -> token cross-attention
    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _proj_attn(params["cross_attn_i2t"], k, q, queries, nh)
    keys = L.layer_norm(params["norm4"], keys, eps=eps)
    return queries, keys


def two_way_transformer_apply(params: dict, cfg: MaskDecoderConfig,
                              image_embedding: Array, image_pe: Array,
                              point_embedding: Array) -> Tuple[Array, Array]:
    """image_embedding/image_pe: [B, H, W, C] NHWC; point_embedding [B, N, C].

    Returns (queries [B, N, C], keys [B, H*W, C]).
    """
    B, H, W, C = image_embedding.shape
    keys = image_embedding.reshape(B, H * W, C)  # batch may be 1 (shared)
    key_pe = image_pe.reshape(-1, H * W, C).astype(keys.dtype)
    queries = point_embedding
    query_pe = point_embedding

    for i, layer in enumerate(params["layers"]):
        queries, keys = _block_apply(layer, cfg, queries, keys, query_pe,
                                     key_pe, skip_first_layer_pe=(i == 0))

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _proj_attn(params["final_attn_t2i"], q, k, keys,
                                   cfg.transformer_num_heads)
    queries = L.layer_norm(params["norm_final"], queries, eps=cfg.ln_eps)
    return queries, keys
