"""Rotary position embeddings with linear / dynamic-NTK scaling.

Behavioral reference: /root/reference/modeling/modeling_internlm2.py:144-247
(llama-style half-rotation; linear scaling divides positions; dynamic NTK
rescales the base once the sequence exceeds max_position_embeddings). The
reference grows a cos/sin cache at runtime; under jit sequence lengths are
static, so we compute cos/sin directly from position ids — no cache, no
regrowth, and the NTK base adjustment becomes a trace-time constant.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config

Array = jax.Array


def rope_cos_sin(cfg: InternLM2Config, positions: Array,
                 ntk_seq_len: Optional[int] = None) -> Tuple[Array, Array]:
    """cos/sin tables for given positions.

    positions: int array [...], returns (cos, sin) of shape [..., head_dim]
    (the half-frequencies duplicated, matching emb = cat(freqs, freqs)).
    ntk_seq_len: static total sequence length used for the dynamic-NTK base
    adjustment (modeling_internlm2.py:215-222).
    """
    dim = cfg.head_dim
    base = cfg.rope_theta
    pos = positions.astype(jnp.float32)

    if cfg.rope_scaling_type == "linear":
        pos = pos / cfg.rope_scaling_factor
    elif cfg.rope_scaling_type == "dynamic":
        if ntk_seq_len is not None and ntk_seq_len > cfg.max_position_embeddings:
            base = base * (
                (cfg.rope_scaling_factor * ntk_seq_len / cfg.max_position_embeddings)
                - (cfg.rope_scaling_factor - 1)
            ) ** (dim / (dim - 2))
    elif cfg.rope_scaling_type is not None:
        raise ValueError(f"unsupported rope scaling {cfg.rope_scaling_type!r}")

    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = pos[..., None] * inv_freq  # [..., dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotate_half_matrix(dim: int, dtype) -> Array:
    """[D, D] constant with (x @ P) == rotate_half(x), values exact.

    The split/concat form creates D/2-lane tensors that tile at half
    occupancy on TPU (the rope fusions ran at ~9 GB/s, ~13 ms/step of the
    flagship trace; their 64-lane outputs also bloated the scan's saved
    residuals). One ±1 one-hot matmul keeps every tensor at D lanes and
    copies values exactly (single nonzero per output column)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 1)
    half = dim // 2
    plus = (i + half == j).astype(jnp.float32)   # out[c>=half] = x[c-half]
    minus = (i == j + half).astype(jnp.float32)  # out[c<half] = -x[c+half]
    return (plus - minus).astype(dtype)


def apply_rope(q: Array, k: Array, cos: Array, sin: Array) -> Tuple[Array, Array]:
    """q, k: [B, S, H, D]; cos/sin: [B, S, D] -> broadcast over heads."""
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    P = _rotate_half_matrix(q.shape[-1], q.dtype)
    q_rot = q * cos + (q @ P) * sin
    k_rot = k * cos + (k @ P) * sin
    return q_rot, k_rot
