"""SamPredictor: set an image once, decode many prompts.

The upstream predictor class is absent from the reference repo (SURVEY
§2.13 gap) — this reimplements the standard SAM predictor contract on top
of our jitted decode path, with the ONNX-model-style branchless prompt
handling (utils/onnx.py:51-90 is the reference's trace-friendly template).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig
from ullsam_tpu.models.sam import sam as S
from ullsam_tpu.inference.transforms import ResizeLongestSide

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode(params, cfg: SamConfig, image):
    return S.encode_image(params, cfg, S.preprocess(image, cfg))


@functools.partial(jax.jit, static_argnames=("cfg", "multimask_output"))
def _decode_any(params, cfg: SamConfig, emb, points, boxes, mask_input,
                multimask_output: bool):
    """points/boxes/mask_input may be None — each combination retraces once
    (the prompt-presence switches are static, like the reference's None
    checks, prompt_encoder.py:177-203)."""
    return S.decode_masks(params, cfg, emb, points=points, boxes=boxes,
                          mask_inputs=mask_input,
                          multimask_output=multimask_output)


class SamPredictor:
    def __init__(self, cfg: SamConfig, params):
        self.cfg = cfg
        self.params = params
        self.transform = ResizeLongestSide(cfg.vit.img_size)
        self.reset_image()

    def reset_image(self):
        self.is_image_set = False
        self.features = None
        self.original_size = None
        self.input_size = None

    def set_image(self, image: np.ndarray, image_format: str = "RGB"):
        """image: [H, W, 3] uint8. Resizes longest side, normalizes, pads,
        runs the encoder once."""
        if image_format == "BGR":
            image = image[..., ::-1]
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        x = jnp.asarray(resized, jnp.float32)[None]
        self.features = _encode(self.params, self.cfg, x)
        self.is_image_set = True

    def set_image_embedding(self, features: Array,
                            original_size: Tuple[int, int],
                            input_size: Optional[Tuple[int, int]] = None):
        """Install precomputed [1, 64, 64, 256] features."""
        self.features = features
        self.original_size = original_size
        self.input_size = input_size or (self.cfg.vit.img_size,
                                         self.cfg.vit.img_size)
        self.is_image_set = True

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Prompts in original-image coordinates -> (masks [B, M, H, W],
        iou_predictions [B, M], low_res_logits [B, M, 256, 256])."""
        if not self.is_image_set:
            raise RuntimeError("call set_image first")

        points = None
        if point_coords is not None:
            pc = self.transform.apply_coords(
                np.atleast_2d(point_coords).reshape(-1, 2)[None],
                self.original_size)
            pl = np.asarray(point_labels).reshape(1, -1)
            points = (jnp.asarray(pc, jnp.float32), jnp.asarray(pl, jnp.int32))
        boxes = None
        if box is not None:
            bx = self.transform.apply_boxes(np.asarray(box).reshape(-1, 4),
                                            self.original_size)
            boxes = jnp.asarray(bx, jnp.float32)
        mi = None
        if mask_input is not None:
            mi = jnp.asarray(mask_input, jnp.float32)
            if mi.ndim == 3:
                mi = mi[None]
            mi = jnp.transpose(mi, (0, 2, 3, 1))  # NCHW -> NHWC
        low_res, iou = _decode_any(self.params, self.cfg, self.features,
                                   points, boxes, mi, multimask_output)

        masks = S.postprocess_masks(low_res, self.input_size,
                                    self.original_size, self.cfg)
        masks = np.asarray(masks)
        if not return_logits:
            masks = masks > self.cfg.mask_threshold
        return masks, np.asarray(iou), np.asarray(low_res)

    def get_image_embedding(self) -> Array:
        if not self.is_image_set:
            raise RuntimeError("call set_image first")
        return self.features
