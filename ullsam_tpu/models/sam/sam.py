"""Composed SAM model: init, preprocess, predict, postprocess.

Behavioral reference: /root/reference/modeling/sam.py. The reference's
forward loops over images in Python (sam.py:100-131); here prediction is a
single jit-friendly function over fixed-shape batches, and multi-prompt
sweeps use vmap (the AMG path builds on this).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig
from ullsam_tpu.models.sam import image_encoder as IE
from ullsam_tpu.models.sam import prompt_encoder as PE
from ullsam_tpu.models.sam import mask_decoder as MD
from ullsam_tpu.ops.resize import bilinear_resize, sam_postprocess_resize

Array = jax.Array


def sam_init(key, cfg: SamConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": IE.image_encoder_init(k1, cfg.vit),
        "prompt_encoder": PE.prompt_encoder_init(k2, cfg.prompt_encoder),
        "mask_decoder": MD.mask_decoder_init(k3, cfg.mask_decoder),
    }


def preprocess(images: Array, cfg: SamConfig) -> Array:
    """Normalize (ImageNet mean/std) and pad bottom/right to img_size.

    images: [B, H, W, 3] NHWC float (0-255 scale). Reference: sam.py:164-174.
    """
    mean = jnp.asarray(cfg.pixel_mean, images.dtype)
    std = jnp.asarray(cfg.pixel_std, images.dtype)
    x = (images - mean) / std
    H, W = x.shape[1], x.shape[2]
    size = cfg.vit.img_size
    return jnp.pad(x, ((0, 0), (0, size - H), (0, size - W), (0, 0)))


def encode_image(params: dict, cfg: SamConfig, images: Array,
                 remat: bool = False) -> Array:
    """[B, 1024, 1024, 3] -> [B, 64, 64, 256] NHWC."""
    return IE.image_encoder_apply(params["image_encoder"], images, cfg.vit,
                                  remat=remat)


def decode_masks(
    params: dict,
    cfg: SamConfig,
    image_embedding: Array,
    points: Optional[Tuple[Array, Array]] = None,
    boxes: Optional[Array] = None,
    mask_inputs: Optional[Array] = None,
    llm_hidden: Optional[Array] = None,
    multimask_output: bool = True,
) -> Tuple[Array, Array]:
    """Prompt-encode + mask-decode for one image embedding.

    image_embedding: [1, 64, 64, 256]; prompts batched over the first axis.
    Returns (low-res mask logits [B, M, 256, 256], iou_pred [B, M]).
    """
    sparse, dense = PE.prompt_encoder_apply(
        params["prompt_encoder"], cfg.prompt_encoder,
        points=points, boxes=boxes, masks=mask_inputs, llm_hidden=llm_hidden)
    if mask_inputs is None and llm_hidden is None:
        # no-mask dense prompt is a broadcast of one vector: keep batch 1
        # so the decoder's shared-keys fast path engages (AMG sweep)
        dense = dense[:1]
    image_pe = PE.get_dense_pe(params["prompt_encoder"], cfg.prompt_encoder)
    return MD.mask_decoder_apply(
        params["mask_decoder"], cfg.mask_decoder,
        image_embedding, image_pe, sparse, dense,
        multimask_output=multimask_output)


def decode_masks_cols(
    params: dict,
    cfg: SamConfig,
    image_embedding: Array,
    points: Tuple[Array, Array],
    multimask_output: bool = True,
) -> Tuple[Array, Array]:
    """Point-prompt decode to BLOCK-COLUMN mask layout (AMG fast path).

    Returns (masks_cols [B, H*W, M*16], iou_pred [B, M]) where the low-res
    [B, M, 4H, 4W] logits of decode_masks are laid out as rows = (i, j)
    embedding cells and cols = (m, di, dj, ei, ej) 4x4 sub-pixels
    (mask_decoder._upscale_hypernet_cols). Identical values, no spatial
    transpose; on TPU the upscale+hypernet chain is one Pallas kernel.
    """
    sparse, dense = PE.prompt_encoder_apply(
        params["prompt_encoder"], cfg.prompt_encoder, points=points)
    dense = dense[:1]  # shared no-mask dense prompt (see decode_masks)
    image_pe = PE.get_dense_pe(params["prompt_encoder"], cfg.prompt_encoder)
    return MD.predict_masks_cols(
        params["mask_decoder"], cfg.mask_decoder,
        image_embedding, image_pe, sparse, dense,
        multimask_output=multimask_output)


def decode_masks_cols_stats(
    params: dict,
    cfg: SamConfig,
    image_embedding: Array,
    points: Tuple[Array, Array],
    multimask_output: bool = True,
    stability_offset: float = 1.0,
):
    """decode_masks_cols + in-kernel stability/boxes when the fused
    upscale kernel runs (see mask_decoder.predict_masks_cols_stats).
    Returns (masks_cols, iou_pred, stats_or_None)."""
    sparse, dense = PE.prompt_encoder_apply(
        params["prompt_encoder"], cfg.prompt_encoder, points=points)
    dense = dense[:1]
    image_pe = PE.get_dense_pe(params["prompt_encoder"], cfg.prompt_encoder)
    return MD.predict_masks_cols_stats(
        params["mask_decoder"], cfg.mask_decoder,
        image_embedding, image_pe, sparse, dense,
        multimask_output=multimask_output,
        thr=cfg.mask_threshold, off=stability_offset)


def postprocess_masks(masks: Array, input_size: Tuple[int, int],
                      original_size: Tuple[int, int], cfg: SamConfig) -> Array:
    """Upscale low-res logits to original image size (sam.py:133-162).

    masks: [B, M, 256, 256] -> bilinear to img_size, crop the pad, bilinear
    to original_size. The whole chain is one fused pair of interpolation
    matmuls (ops/resize.py) with exact torch align_corners=False semantics
    (no antialias — jax.image.resize antialiases downscales, torch doesn't).
    """
    return sam_postprocess_resize(masks.astype(jnp.float32), cfg.vit.img_size,
                                  input_size, original_size)


@functools.partial(jax.jit, static_argnames=("cfg", "multimask_output"))
def sam_point_predict(params: dict, cfg: SamConfig, image: Array,
                      point_coords: Array, point_labels: Array,
                      multimask_output: bool = True
                      ) -> Tuple[Array, Array]:
    """End-to-end: preprocessed image [1,S,S,3] + point prompts -> masks.

    point_coords: [B, N, 2] in input-frame pixels; labels [B, N].
    Returns (mask logits at full res [B, M, S, S], iou_pred [B, M]).
    """
    emb = encode_image(params, cfg, image)
    low_res, iou = decode_masks(params, cfg, emb,
                                points=(point_coords, point_labels),
                                multimask_output=multimask_output)
    size = cfg.vit.img_size
    masks = bilinear_resize(low_res.astype(jnp.float32), size, size)
    return masks, iou


def sam_batched_forward(params: dict, cfg: SamConfig, batched_input,
                        multimask_output: bool):
    """Dict-in/dict-out batched inference matching Sam.forward
    (sam.py:53-131): a list of per-image records with 'image' ([H, W, 3]
    NHWC, 0-255), 'original_size', and optional 'point_coords'/
    'point_labels'/'boxes'/'mask_inputs'. Returns a list of dicts with
    'masks' (bool, original size), 'iou_predictions', 'low_res_logits'.

    The reference loops images in Python; images here are encoded as ONE
    batch, then each image's prompts decode against its embedding.
    """
    import numpy as np

    images = jnp.stack([preprocess(jnp.asarray(r["image"],
                                               jnp.float32)[None], cfg)[0]
                        for r in batched_input])
    embeddings = encode_image(params, cfg, images)

    outputs = []
    for i, record in enumerate(batched_input):
        points = None
        if "point_coords" in record:
            points = (jnp.asarray(record["point_coords"], jnp.float32),
                      jnp.asarray(record["point_labels"], jnp.int32))
        boxes = (jnp.asarray(record["boxes"], jnp.float32)
                 if "boxes" in record else None)
        mask_inputs = None
        if "mask_inputs" in record:
            mi = jnp.asarray(record["mask_inputs"], jnp.float32)
            mask_inputs = jnp.transpose(mi, (0, 2, 3, 1))  # NCHW -> NHWC
        low_res, iou = decode_masks(params, cfg, embeddings[i:i + 1],
                                    points=points, boxes=boxes,
                                    mask_inputs=mask_inputs,
                                    multimask_output=multimask_output)
        input_size = record["image"].shape[:2]
        masks = postprocess_masks(low_res, tuple(input_size),
                                  tuple(record["original_size"]), cfg)
        outputs.append({
            "masks": np.asarray(masks) > cfg.mask_threshold,
            "iou_predictions": np.asarray(iou),
            "low_res_logits": np.asarray(low_res),
        })
    return outputs
