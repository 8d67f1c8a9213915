"""Image/coordinate geometry for SAM inference.

Behavioral reference: utils/transforms.py (ResizeLongestSide) and the app's
pad-to-square path (app.py:111-161, 213-249). Both geometries are provided;
resizes use jax.image on device or numpy/PIL-free host code.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def get_preprocess_shape(oldh: int, oldw: int, long_side_length: int
                         ) -> Tuple[int, int]:
    """Longest-side resize target with +0.5 rounding (transforms.py:93-102)."""
    scale = long_side_length * 1.0 / max(oldh, oldw)
    newh, neww = oldh * scale, oldw * scale
    return int(newh + 0.5), int(neww + 0.5)


class ResizeLongestSide:
    """Resize to longest-side == target; rescale coords/boxes to match
    (utils/transforms.py semantics)."""

    def __init__(self, target_length: int = 1024):
        self.target_length = target_length

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8/float -> resized (host, bilinear antialias off)."""
        h, w = image.shape[:2]
        nh, nw = get_preprocess_shape(h, w, self.target_length)
        if (nh, nw) == (h, w):
            return image
        from ullsam_tpu.ops.resize import bilinear_resize_nhwc
        out = np.asarray(bilinear_resize_nhwc(
            jnp.asarray(image, jnp.float32)[None], nh, nw)[0])
        if np.issubdtype(image.dtype, np.integer):
            out = np.clip(np.round(out), 0, 255).astype(image.dtype)
        return out

    def apply_coords(self, coords: np.ndarray,
                     original_size: Tuple[int, int]) -> np.ndarray:
        old_h, old_w = original_size
        new_h, new_w = get_preprocess_shape(old_h, old_w, self.target_length)
        coords = np.asarray(coords, np.float32).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords

    def apply_boxes(self, boxes: np.ndarray,
                    original_size: Tuple[int, int]) -> np.ndarray:
        b = self.apply_coords(np.asarray(boxes).reshape(-1, 2, 2),
                              original_size)
        return b.reshape(-1, 4)

    # --- batched on-device variants (utils/transforms.py:55-91) ---

    def apply_image_batch(self, images: Array) -> Array:
        """Batched float images [B, H, W, C] -> longest-side resize on
        device (apply_image_torch, transforms.py:55-65). The reference uses
        antialiased bilinear (antialias=True) here — jax.image.resize
        applies the same downscale-scaled triangle filter — and notes this
        'may not exactly match apply_image' (the model-facing transform)."""
        h, w = images.shape[1], images.shape[2]
        nh, nw = get_preprocess_shape(h, w, self.target_length)
        if (nh, nw) == (h, w):
            return images
        return jax.image.resize(images,
                                (images.shape[0], nh, nw, images.shape[3]),
                                method="bilinear", antialias=True)

    def apply_coords_device(self, coords: Array,
                            original_size: Tuple[int, int]) -> Array:
        """jit-friendly coord rescale [..., 2] (apply_coords_torch,
        transforms.py:67-81); (x, y) order, original_size (H, W) static."""
        old_h, old_w = original_size
        new_h, new_w = get_preprocess_shape(old_h, old_w, self.target_length)
        scale = jnp.asarray([new_w / old_w, new_h / old_h], jnp.float32)
        return coords.astype(jnp.float32) * scale

    def apply_boxes_device(self, boxes: Array,
                           original_size: Tuple[int, int]) -> Array:
        """jit-friendly box rescale [B, 4] (apply_boxes_torch,
        transforms.py:83-91)."""
        b = self.apply_coords_device(boxes.reshape(-1, 2, 2), original_size)
        return b.reshape(-1, 4)


def pad_to_square(image: np.ndarray, fill: int = 0):
    """Center pad to square (app.py:111-143). Returns (padded, pad_info)
    where pad_info = (top, bottom, left, right) for reverse_padding."""
    h, w = image.shape[:2]
    size = max(h, w)
    top = (size - h) // 2
    bottom = size - h - top
    left = (size - w) // 2
    right = size - w - left
    pad_width = [(top, bottom), (left, right)] + [(0, 0)] * (image.ndim - 2)
    return np.pad(image, pad_width, constant_values=fill), (top, bottom,
                                                            left, right)


def reverse_padding(image: np.ndarray, pad_info) -> np.ndarray:
    """Undo pad_to_square (app.py:145-161)."""
    top, bottom, left, right = pad_info
    h, w = image.shape[:2]
    return image[top:h - bottom if bottom else h,
                 left:w - right if right else w]


def normalize01(image: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] -> float32 [0,1] (the uLLSAM serving path feeds [0,1]
    tensors, Normalize(mean=0, std=1) — app.py:242-249)."""
    return np.asarray(image, np.float32) / 255.0
