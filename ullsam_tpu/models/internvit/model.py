"""InternViT vision encoder (InternVL's native tower), TPU-native.

The reference repo carries only this model's CONFIG
(configuration_intern_vit.py) — the deployed uLLSAM replaces the tower
with SAM's ViT. Provided here so InternVL2.5 checkpoints can run their
original caption path (BASELINE config #3) on TPU: standard pre-norm ViT
with class token, learned position embeddings, per-head QK RMSNorm
(qk_normalization), and LayerScale residual gains — the InternViT-300M
architecture family.

Input [B, S, S, 3] NHWC -> tokens [B, 1 + (S/patch)^2, hidden].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternViTConfig
from ullsam_tpu.ops import layers as L
from ullsam_tpu.ops import attention as A

Array = jax.Array


def _block_init(key, cfg: InternViTConfig) -> dict:
    h = cfg.hidden_size
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": L.layer_norm_init(h),
        "attn": {
            "qkv": L.linear_init(k1, h, 3 * h, use_bias=cfg.qkv_bias),
            "proj": L.linear_init(k2, h, h),
        },
        "ls1": jnp.full((h,), cfg.initializer_factor),
        "norm2": L.layer_norm_init(h),
        "mlp": L.mlp_block_init(k3, h, cfg.intermediate_size),
        "ls2": jnp.full((h,), cfg.initializer_factor),
    }
    if cfg.qk_normalization:
        p["attn"]["q_norm"] = L.rms_norm_init(h)
        p["attn"]["k_norm"] = L.rms_norm_init(h)
    return p


def internvit_init(key, cfg: InternViTConfig) -> dict:
    n_pos = 1 + (cfg.image_size // cfg.patch_size) ** 2
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    return {
        "patch_embed": L.conv_init(keys[0], cfg.num_channels,
                                   cfg.hidden_size,
                                   (cfg.patch_size, cfg.patch_size)),
        "cls_token": jnp.zeros((1, 1, cfg.hidden_size)),
        "pos_embed": jax.random.normal(keys[1],
                                       (1, n_pos, cfg.hidden_size)) * 0.02,
        "blocks": [_block_init(keys[2 + i], cfg)
                   for i in range(cfg.num_hidden_layers)],
    }


def _attention(p: dict, x: Array, cfg: InternViTConfig) -> Array:
    B, N, H = x.shape
    nh = cfg.num_attention_heads
    hd = H // nh
    qkv = L.linear(p["qkv"], x).reshape(B, N, 3, H)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if cfg.qk_normalization:
        # InternViT applies RMSNorm over the FULL flattened head dim
        q = L.rms_norm(p["q_norm"], q, eps=cfg.layer_norm_eps)
        k = L.rms_norm(p["k_norm"], k, eps=cfg.layer_norm_eps)
    q = q.reshape(B, N, nh, hd)
    k = k.reshape(B, N, nh, hd)
    v = v.reshape(B, N, nh, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return L.linear(p["proj"], out.reshape(B, N, H).astype(x.dtype))


def internvit_apply(params: dict, x: Array, cfg: InternViTConfig) -> Array:
    """x: [B, image_size, image_size, 3] -> [B, 1 + n_patches, hidden]."""
    p = L.conv2d(params["patch_embed"], x,
                 stride=(cfg.patch_size, cfg.patch_size))
    B, gh, gw, H = p.shape
    tokens = p.reshape(B, gh * gw, H)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (B, 1, H))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embed"].astype(tokens.dtype)
    for blk in params["blocks"]:
        h = L.layer_norm(blk["norm1"], tokens, eps=cfg.layer_norm_eps)
        tokens = tokens + _attention(blk["attn"], h, cfg) * blk["ls1"].astype(
            tokens.dtype)
        h = L.layer_norm(blk["norm2"], tokens, eps=cfg.layer_norm_eps)
        tokens = tokens + L.mlp_block(blk["mlp"], h) * blk["ls2"].astype(
            tokens.dtype)
    return tokens
