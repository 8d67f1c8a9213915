"""Serialized-model export: the TPU-era analog of utils/onnx.py.

The reference exports a trace-friendly prompt-decode module to ONNX
(SamOnnxModel, /root/reference/utils/onnx.py:17-144) so the decoder can run
outside PyTorch. Here the decode path is already a pure jitted function;
this module provides:

- ``make_onnx_decoder_fn``: a functional equivalent of ``SamOnnxModel.forward``
  (branchless point embedding, ``has_mask_input`` lerp, optional stability
  scores, score-reweighted best-mask selection, in-artifact original-size
  postprocess), and
- ``export_decoder``: serialization with ``jax.export`` (StableHLO) so the
  artifact can be embedded in other runtimes (C++ PJRT, serving systems)
  without Python model code.

XLA note: shapes are static under export, so ``orig_im_size`` is a
trace-time constant (each artifact is specialized to one original size)
rather than the reference's runtime tensor — the crop/resize math is
identical (onnx.py:41-49,76-90).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig
from ullsam_tpu.inference.amg import calculate_stability_score
from ullsam_tpu.inference.transforms import get_preprocess_shape
from ullsam_tpu.models.sam import prompt_encoder as PE
from ullsam_tpu.models.sam import mask_decoder as MD
from ullsam_tpu.models.sam import sam as S
from ullsam_tpu.ops.resize import sam_postprocess_resize

Array = jax.Array

STABILITY_SCORE_OFFSET = 1.0  # onnx.py:38


def _embed_masks_lerp(params: dict, cfg: SamConfig, mask_input: Array,
                      has_mask_input: Array) -> Array:
    """Branchless dense prompt: lerp between the mask-downscaler output and
    the no-mask embedding by ``has_mask_input`` (onnx.py:69-74).

    mask_input: [B, 4H, 4W, 1] NHWC; has_mask_input: [B] float in {0, 1}.
    """
    pcfg = cfg.prompt_encoder
    pe_params = params["prompt_encoder"]
    down = PE.embed_masks(pe_params, pcfg, mask_input)
    no_mask = PE.no_mask_dense(pe_params, pcfg, mask_input.shape[0])
    w = has_mask_input.reshape(-1, 1, 1, 1).astype(down.dtype)
    return w * down + (1.0 - w) * no_mask.astype(down.dtype)


def select_masks(masks: Array, iou_preds: Array, num_points: int
                 ) -> Tuple[Array, Array]:
    """Best-mask selection without control flow (onnx.py:92-105): with >1
    point the single-mask token (index 0) is force-selected via a +1000
    score reweight; with 1 point the best multimask output wins."""
    nm = masks.shape[1]
    reweight = jnp.asarray([1000.0] + [0.0] * (nm - 1), iou_preds.dtype)
    score = iou_preds + (num_points - 2.5) * reweight[None, :]
    best = jnp.argmax(score, axis=1)
    take = jax.vmap(lambda m, i: m[i])
    return (take(masks, best)[:, None], take(iou_preds, best)[:, None])


def mask_postprocessing(masks: Array, img_size: int,
                        orig_im_size: Tuple[int, int]) -> Array:
    """Upscale low-res logits to ``orig_im_size`` (onnx.py:76-90): bilinear
    to img_size, crop to the prepadded (longest-side-resized) extent, then
    bilinear to the original size — one fused pair of resize matmuls with
    exact torch align_corners=False semantics."""
    oh, ow = int(orig_im_size[0]), int(orig_im_size[1])
    prepadded = get_preprocess_shape(oh, ow, img_size)  # floor(+0.5), onnx.py:41-49
    return sam_postprocess_resize(masks.astype(jnp.float32), img_size,
                                  prepadded, (oh, ow))


def make_onnx_decoder_fn(cfg: SamConfig, *,
                         return_single_mask: bool = False,
                         use_stability_score: bool = False,
                         return_extra_metrics: bool = False,
                         orig_im_size: Optional[Tuple[int, int]] = None,
                         dynamic_size: bool = False):
    """Functional ``SamOnnxModel.forward`` (onnx.py:107-144).

    Returns ``fn(params, embedding, point_coords, point_labels, mask_input,
    has_mask_input)`` where
      embedding      [1, H, W, C]   (NHWC image embedding)
      point_coords   [B, N, 2]      (x, y) pixels in the model input frame;
                                    the caller supplies the (0,0)/-1 padding
                                    point per ONNX convention
      point_labels   [B, N]         {-1, 0, 1, 2, 3}
      mask_input     [B, 4H, 4W, 1] NHWC low-res mask logits
      has_mask_input [B]            float {0, 1}
    and the outputs are (upscaled_masks, scores, low_res_masks), or with
    ``return_extra_metrics`` (upscaled, scores, stability, areas, low_res).
    """
    img_size = cfg.vit.img_size
    size = orig_im_size if orig_im_size is not None else (img_size, img_size)
    thresh = cfg.mask_threshold

    def fn(params, embedding, point_coords, point_labels, mask_input,
           has_mask_input, size_witness=None):
        pe_params = params["prompt_encoder"]
        sparse = PE.embed_points(pe_params, cfg.prompt_encoder,
                                 point_coords, point_labels)  # onnx.py:51-67
        dense = _embed_masks_lerp(params, cfg, mask_input, has_mask_input)
        image_pe = PE.get_dense_pe(pe_params, cfg.prompt_encoder)
        masks, scores = MD.predict_masks(
            params["mask_decoder"], cfg.mask_decoder,
            embedding, image_pe, sparse, dense)

        if use_stability_score:  # onnx.py:127-130
            scores = calculate_stability_score(masks, thresh,
                                               STABILITY_SCORE_OFFSET)
        if return_single_mask:
            num_points = point_coords.shape[1]
            masks, scores = select_masks(masks, scores, num_points)

        if dynamic_size:
            # runtime original size (reference onnx.py:76-90 semantics):
            # the witness tensor's SHAPE carries (oh, ow) — with
            # jax.export symbolic dims one artifact serves every size
            from ullsam_tpu.ops.resize import sam_postprocess_resize_dynamic
            upscaled = sam_postprocess_resize_dynamic(
                masks.astype(jnp.float32), img_size, size_witness)
        else:
            upscaled = mask_postprocessing(masks, img_size, size)

        if return_extra_metrics:  # onnx.py:137-142
            stability = calculate_stability_score(upscaled, thresh,
                                                  STABILITY_SCORE_OFFSET)
            areas = jnp.sum(upscaled > thresh, axis=(-2, -1))
            return upscaled, scores, stability, areas, masks
        return upscaled, scores, masks

    return fn


def make_decoder_fn(cfg: SamConfig, multimask_output: bool = True):
    """Minimal point-decode closure with static prompt shapes (the pre-r2
    export surface; kept for embedding-pipeline users that do their own
    postprocess).

    (embedding [1,H,W,C], coords [B,N,2], labels [B,N])
      -> (low-res mask logits [B,M,4H,4W], iou [B,M])
    """

    def fn(params, embedding, coords, labels):
        return S.decode_masks(params, cfg, embedding,
                              points=(coords, labels),
                              multimask_output=multimask_output)

    return fn


def export_decoder(params, cfg: SamConfig, num_points: int = 4,
                   batch: int = 1, *,
                   full: bool = False,
                   multimask_output: bool = True,
                   return_single_mask: bool = False,
                   use_stability_score: bool = False,
                   return_extra_metrics: bool = False,
                   orig_im_size: Optional[Tuple[int, int]] = None,
                   dynamic_size: bool = False) -> bytes:
    """Serialize the prompt decoder to a portable StableHLO artifact.

    ``full=True`` exports the SamOnnxModel-equivalent signature (with mask
    input + postprocess); otherwise the minimal low-res point decoder.
    """
    from jax import export as jexport

    h, w = cfg.prompt_encoder.image_embedding_size
    d = cfg.vit.out_chans
    emb = jax.ShapeDtypeStruct((1, h, w, d), jnp.float32)
    coords = jax.ShapeDtypeStruct((batch, num_points, 2), jnp.float32)
    labels = jax.ShapeDtypeStruct((batch, num_points), jnp.int32)

    if full:
        fn = make_onnx_decoder_fn(
            cfg, return_single_mask=return_single_mask,
            use_stability_score=use_stability_score,
            return_extra_metrics=return_extra_metrics,
            orig_im_size=orig_im_size, dynamic_size=dynamic_size)
        mask_in = jax.ShapeDtypeStruct((batch, 4 * h, 4 * w, 1), jnp.float32)
        has_in = jax.ShapeDtypeStruct((batch,), jnp.float32)
        if dynamic_size:
            # one artifact, every original size: the witness input's
            # symbolic (oh, ow) shape is the runtime size
            oh, ow = jexport.symbolic_shape("oh, ow")
            closed = lambda e, c, l, m, hm, sw: fn(params, e, c, l, m, hm, sw)  # noqa: E731
            args = (emb, coords, labels, mask_in, has_in,
                    jax.ShapeDtypeStruct((oh, ow), jnp.float32))
        else:
            closed = lambda e, c, l, m, hm: fn(params, e, c, l, m, hm)  # noqa: E731
            args = (emb, coords, labels, mask_in, has_in)
    else:
        simple = make_decoder_fn(cfg, multimask_output)
        closed = lambda e, c, l: simple(params, e, c, l)  # noqa: E731
        args = (emb, coords, labels)
    exported = jexport.export(jax.jit(closed))(*args)
    return exported.serialize()


def load_exported_decoder(blob: bytes):
    """Deserialize and return a callable with the exported signature."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call
