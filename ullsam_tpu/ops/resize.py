"""Bilinear resize as MXU matmuls.

jax.image.resize lowers to gathers that run at a fraction of HBM bandwidth
on TPU (measured 2.3s for [256,256,256]->[256,1024,1024] on v5e). Bilinear
resampling is a linear operator, so a resize — or a CHAIN of resizes and
crops (the SAM postprocess: 256 -> img_size, crop pad, -> original size,
sam.py:133-162) — is exactly two small matmuls with precomputed
interpolation matrices. Half-pixel centers, no antialias: identical math to
torch F.interpolate(align_corners=False) / jax.image.resize('bilinear').
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] row-stochastic interpolation matrix (half-pixel centers)."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1.0 - w
    m[np.arange(out_size), hi] += w
    return m


@functools.lru_cache(maxsize=256)
def sam_postprocess_matrix(low: int, model_size: int, input_size: int,
                           out: int) -> np.ndarray:
    """[out, low] matrix for: resize low->model_size, crop :input_size,
    resize input_size->out (one spatial axis of sam.py:133-162)."""
    m1 = _bilinear_matrix(model_size, low)[:input_size, :]  # crop rows
    m2 = _bilinear_matrix(out, input_size)
    return (m2 @ m1).astype(np.float32)


def resize2d(x: Array, mat_h: np.ndarray, mat_w: np.ndarray,
             compute_dtype=jnp.float32) -> Array:
    """x [..., H, W] -> [..., H2, W2] via precomputed matrices."""
    mh = jnp.asarray(mat_h, compute_dtype)
    mw = jnp.asarray(mat_w, compute_dtype)
    y = jnp.einsum("ih,...hw->...iw", mh, x.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("jw,...iw->...ij", mw, y.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    return y


def bilinear_resize(x: Array, out_h: int, out_w: int,
                    compute_dtype=jnp.float32) -> Array:
    """Drop-in for jax.image.resize(..., 'bilinear') on the last two axes."""
    return resize2d(x, _bilinear_matrix(out_h, x.shape[-2]),
                    _bilinear_matrix(out_w, x.shape[-1]),
                    compute_dtype=compute_dtype)


def sam_postprocess_resize(masks: Array, model_size: int,
                           input_hw: Tuple[int, int],
                           out_hw: Tuple[int, int],
                           compute_dtype=jnp.float32) -> Array:
    """Fused SAM postprocess chain on [..., low, low] mask logits."""
    low_h, low_w = masks.shape[-2], masks.shape[-1]
    mh = sam_postprocess_matrix(low_h, model_size, input_hw[0], out_hw[0])
    mw = sam_postprocess_matrix(low_w, model_size, input_hw[1], out_hw[1])
    return resize2d(masks, mh, mw, compute_dtype=compute_dtype)


def _bilinear_matrix_traced(out_dim, in_size: int, crop) -> Array:
    """In-graph [out_dim, in_size] interpolation matrix.

    ``out_dim`` may be a SYMBOLIC dimension (jax.export shape
    polymorphism) and ``crop`` a traced float scalar: samples are drawn
    from the first ``crop`` input rows (the SAM pad-crop), so no
    shape-dependent slicing is needed. The tent-weight form
    max(0, 1 - |r - src|) reproduces the (1-frac, frac) bilinear pair
    exactly, with edge clamping via src clipping."""
    i = jnp.arange(out_dim, dtype=jnp.float32)
    out_val = jnp.asarray(out_dim, jnp.float32)
    src = (i + 0.5) * (crop / out_val) - 0.5
    src = jnp.clip(src, 0.0, crop - 1.0)
    r = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(r[None, :] - src[:, None]))


def sam_postprocess_resize_dynamic(masks: Array, model_size: int,
                                   witness: Array,
                                   compute_dtype=jnp.float32) -> Array:
    """SAM postprocess chain with the ORIGINAL size given at runtime.

    ``witness`` is a [oh, ow] tensor whose SHAPE carries the original
    image size (content ignored) — the jax.export analog of the
    reference's runtime ``orig_im_size`` tensor (onnx.py:76-90). The
    low->model_size resize is the static matrix; the crop-to-prepadded +
    resize-to-original stage is built in-graph so one exported artifact
    serves every size.
    """
    low_h, low_w = masks.shape[-2], masks.shape[-1]
    oh, ow = witness.shape[-2], witness.shape[-1]
    oh_f = jnp.asarray(oh, jnp.float32)
    ow_f = jnp.asarray(ow, jnp.float32)
    long_side = jnp.maximum(oh_f, ow_f)
    # get_preprocess_shape: int(model * dim / long + 0.5) (transforms.py:93-102)
    crop_h = jnp.floor(model_size * oh_f / long_side + 0.5)
    crop_w = jnp.floor(model_size * ow_f / long_side + 0.5)

    m1h = jnp.asarray(_bilinear_matrix(model_size, low_h), compute_dtype)
    m1w = jnp.asarray(_bilinear_matrix(model_size, low_w), compute_dtype)
    m2h = _bilinear_matrix_traced(oh, model_size, crop_h).astype(compute_dtype)
    m2w = _bilinear_matrix_traced(ow, model_size, crop_w).astype(compute_dtype)
    mh = jnp.dot(m2h, m1h, preferred_element_type=jnp.float32)
    mw = jnp.dot(m2w, m1w, preferred_element_type=jnp.float32)
    return resize2d(masks, mh, mw, compute_dtype=compute_dtype)


def bilinear_resize_nhwc(x: Array, out_h: int, out_w: int,
                         compute_dtype=jnp.float32) -> Array:
    """[B, H, W, C] -> [B, out_h, out_w, C] bilinear (torch semantics)."""
    if (out_h, out_w) == (x.shape[1], x.shape[2]):
        return x
    mh = jnp.asarray(_bilinear_matrix(out_h, x.shape[1]), compute_dtype)
    mw = jnp.asarray(_bilinear_matrix(out_w, x.shape[2]), compute_dtype)
    y = jnp.einsum("ih,bhwc->biwc", mh, x.astype(compute_dtype),
                   preferred_element_type=jnp.float32).astype(compute_dtype)
    return jnp.einsum("jw,biwc->bijc", mw, y,
                      preferred_element_type=jnp.float32)
