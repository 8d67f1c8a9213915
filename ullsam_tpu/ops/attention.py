"""Attention primitives (XLA reference path).

The Pallas flash kernels in ullsam_tpu/ops/pallas/ are drop-in replacements
for the hot paths; these XLA versions are the always-correct fallback and the
numerical reference for kernel tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def attention(q: Array, k: Array, v: Array, *, bias: Optional[Array] = None,
              scale: Optional[float] = None) -> Array:
    """Batched multi-head attention.

    q: [..., Nq, D], k: [..., Nk, D], v: [..., Nk, Dv]; bias broadcastable to
    [..., Nq, Nk]. Softmax in fp32 (reference uses fp32 softmax,
    modeling_internlm2.py:409).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


# ---------------------------------------------------------------------------
# ViTDet decomposed relative position bias (image_encoder.py:292-361 behavior)
# ---------------------------------------------------------------------------


def _rel_pos_indices(q_size: int, k_size: int) -> np.ndarray:
    """Static relative-coordinate index table (image_encoder.py:317-322)."""
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel.astype(np.int64)


def get_rel_pos(q_size: int, k_size: int, rel_pos: Array) -> Array:
    """Select (and if needed linearly resize) rel-pos rows for q/k sizes.

    Mirrors image_encoder.py:292-322: the (L, D) table is linearly
    interpolated to length 2*max(q,k)-1 when L differs, then gathered by the
    static relative-coordinate table. Sizes are static so the gather indices
    are trace-time constants.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    L = rel_pos.shape[0]
    if L != max_rel_dist:
        # torch F.interpolate(mode="linear", align_corners=False) on length L
        # -> max_rel_dist. Implement with jnp.interp on the sample positions.
        src_pos = (np.arange(max_rel_dist) + 0.5) * (L / max_rel_dist) - 0.5
        src_pos = np.clip(src_pos, 0.0, L - 1)
        lo = np.floor(src_pos).astype(np.int64)
        hi = np.minimum(lo + 1, L - 1)
        w = jnp.asarray((src_pos - lo)[:, None], rel_pos.dtype)
        rel_pos = rel_pos[lo] * (1 - w) + rel_pos[hi] * w
    idx = _rel_pos_indices(q_size, k_size)
    return rel_pos[jnp.asarray(idx)]  # [q_size, k_size, D]


def decomposed_rel_pos_terms(q: Array, rel_pos_h: Array, rel_pos_w: Array,
                             q_size: Tuple[int, int],
                             k_size: Tuple[int, int]) -> Tuple[Array, Array]:
    """Per-axis rel-pos logit contributions (image_encoder.py:325-361).

    q: [B, qh*qw, D]. Returns (rel_h [B, qh, qw, kh], rel_w [B, qh, qw, kw])
    to be broadcast-added to attention logits — kept factored so the Pallas
    kernel can consume them as two small tensors instead of a full
    [N, N] bias.
    """
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h).astype(q.dtype)  # [qh, kh, D]
    Rw = get_rel_pos(q_w, k_w, rel_pos_w).astype(q.dtype)  # [qw, kw, D]
    if q.shape[-1] > Rh.shape[-1]:
        # packed-layout q: hd channels left-aligned in a wider (128-lane)
        # slot with zero pads — pad the tables to match; the pad lanes
        # contribute exactly zero to the contraction
        pad = q.shape[-1] - Rh.shape[-1]
        Rh = jnp.pad(Rh, ((0, 0), (0, 0), (0, pad)))
        Rw = jnp.pad(Rw, ((0, 0), (0, 0), (0, pad)))
    B = q.shape[0]
    r_q = q.reshape(B, q_h, q_w, -1)
    # einsum('bhwc,hkc->bhwk') as written lowers to B*qh tiny [qw, c] @
    # [c, kh] matmuls (M = 64 on the global grid — MXU-hostile, measured
    # 0.875 ms/layer on ViT-H). Making the table axis the ONLY batch dim
    # folds B into M (64 batches of [B*qw, c] @ [c, kh], M = 1024): same
    # contraction, ~8x faster. The heads all share each grid row's table
    # slice, which is what the regrouping exploits.
    qh_major = r_q.transpose(1, 0, 2, 3).reshape(q_h, B * q_w, -1)
    rel_h = jax.lax.dot_general(
        qh_major, Rh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [qh, B*qw, kh]
    rel_h = rel_h.reshape(q_h, B, q_w, k_h).transpose(1, 0, 2, 3)
    qw_major = r_q.transpose(2, 0, 1, 3).reshape(q_w, B * q_h, -1)
    rel_w = jax.lax.dot_general(
        qw_major, Rw, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [qw, B*qh, kw]
    rel_w = rel_w.reshape(q_w, B, q_h, k_w).transpose(1, 2, 0, 3)
    return rel_h, rel_w


def decomposed_rel_pos_bias(q: Array, rel_pos_h: Array, rel_pos_w: Array,
                            q_size: Tuple[int, int],
                            k_size: Tuple[int, int]) -> Array:
    """Full additive attention bias [B, qh*qw, kh*kw] (XLA fallback path)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rel_h, rel_w = decomposed_rel_pos_terms(q, rel_pos_h, rel_pos_w, q_size, k_size)
    bias = rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return bias.reshape(q.shape[0], q_h * q_w, k_h * k_w)
