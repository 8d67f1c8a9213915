"""Automatic mask generation (AMG): point-grid sweep -> stability filter ->
NMS -> RLE.

Behavioral reference: utils/amg.py primitives (point grids :179-197,
stability score :156-176, mask->box :303-346, RLE :107-153, crop boxes
:200-264, batch iterator :98-104). The full generator loop is absent from
the reference (SURVEY §2.13 gap) — this implements the standard SAM AMG
contract on those primitives, TPU-first:

  * the point sweep is one jitted chunked decode (points_per_batch prompts
    per call), with IoU/stability filtering, boxes, and NMS scoring all
    computed ON DEVICE at low-res (256^2) — 16x less HBM traffic than
    filtering at full res; only surviving mask logits are upscaled.
  * NMS is a vectorized IoU-matrix greedy pass (host numpy at <=3k boxes;
    the box math itself is device-side).
  * RLE encoding is vectorized column-major run extraction (pycocotools-
    compatible uncompressed format), with an optional native C++ codec.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig
from ullsam_tpu.models.sam import sam as S

Array = jax.Array


# ---------------------------------------------------------------------------
# MaskData: dict of parallel arrays with filter/cat (utils/amg.py:16-76)
# ---------------------------------------------------------------------------


class MaskData:
    def __init__(self, **kwargs):
        self._stats: Dict[str, Any] = dict(kwargs)

    def __getitem__(self, k):
        return self._stats[k]

    def __setitem__(self, k, v):
        self._stats[k] = v

    def __contains__(self, k):
        return k in self._stats

    def items(self):
        return self._stats.items()

    def filter(self, keep: np.ndarray):
        for k, v in self._stats.items():
            if v is None:
                continue
            if isinstance(v, (np.ndarray, jnp.ndarray)):
                self._stats[k] = np.asarray(v)[np.asarray(keep)]
            elif isinstance(v, list):
                idx = (np.flatnonzero(keep) if keep.dtype == bool
                       else np.asarray(keep))
                self._stats[k] = [v[i] for i in idx]
            else:
                raise TypeError(f"unsupported MaskData type {type(v)}")

    def cat(self, other: "MaskData"):
        for k, v in other.items():
            if k not in self._stats or self._stats[k] is None:
                self._stats[k] = v
            elif isinstance(v, np.ndarray):
                self._stats[k] = np.concatenate([self._stats[k], v], axis=0)
            elif isinstance(v, list):
                self._stats[k] = self._stats[k] + v
            else:
                raise TypeError(f"unsupported MaskData type {type(v)}")


# ---------------------------------------------------------------------------
# point grids (utils/amg.py:179-197)
# ---------------------------------------------------------------------------


def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1 / (2 * n_per_side)
    points_one_side = np.linspace(offset, 1 - offset, n_per_side)
    points_x = np.tile(points_one_side[None, :], (n_per_side, 1))
    points_y = np.tile(points_one_side[:, None], (1, n_per_side))
    return np.stack([points_x, points_y], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def batch_iterator(batch_size: int, *args):
    assert args and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(
        len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [a[b * batch_size:(b + 1) * batch_size] for a in args]


# ---------------------------------------------------------------------------
# device-side mask math
# ---------------------------------------------------------------------------


def calculate_stability_score(mask_logits: Array, mask_threshold: float,
                              threshold_offset: float) -> Array:
    """IoU between high- and low-threshold binarizations
    (utils/amg.py:156-176). [..., H, W] -> [...]."""
    hi = jnp.sum((mask_logits > (mask_threshold + threshold_offset)),
                 axis=(-2, -1), dtype=jnp.int32)
    lo = jnp.sum((mask_logits > (mask_threshold - threshold_offset)),
                 axis=(-2, -1), dtype=jnp.int32)
    return hi.astype(jnp.float32) / jnp.maximum(lo, 1).astype(jnp.float32)


def batched_mask_to_box(masks: Array) -> Array:
    """Bool masks [..., H, W] -> xyxy boxes [..., 4]; zeros for empty
    (utils/amg.py:303-346 semantics)."""
    H, W = masks.shape[-2], masks.shape[-1]
    any_row = jnp.any(masks, axis=-1)       # [..., H]
    any_col = jnp.any(masks, axis=-2)       # [..., W]
    rows = jnp.arange(H)
    cols = jnp.arange(W)
    top = jnp.min(jnp.where(any_row, rows, H), axis=-1)
    bottom = jnp.max(jnp.where(any_row, rows, -1), axis=-1)
    left = jnp.min(jnp.where(any_col, cols, W), axis=-1)
    right = jnp.max(jnp.where(any_col, cols, -1), axis=-1)
    empty = ~jnp.any(any_row, axis=-1)
    # NB: edges are inclusive (right = max col index), matching the
    # reference exactly (utils/amg.py:303-346)
    box = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, box).astype(jnp.float32)


def stability_score_cols(masks_cols: Array, nm: int, mask_threshold: float,
                         threshold_offset: float) -> Array:
    """Stability scores from BLOCK-COLUMN mask logits [B, N, nm*16]
    (sam.decode_masks_cols layout). Pixel counts are layout-invariant:
    sum over rows and each mask's 16 sub-pixel columns. Returns [B, nm]
    identical to calculate_stability_score on the spatial layout."""
    B, N, _ = masks_cols.shape
    hi = jnp.sum(masks_cols > (mask_threshold + threshold_offset),
                 axis=1, dtype=jnp.int32).reshape(B, nm, 16).sum(-1)
    lo = jnp.sum(masks_cols > (mask_threshold - threshold_offset),
                 axis=1, dtype=jnp.int32).reshape(B, nm, 16).sum(-1)
    return hi.astype(jnp.float32) / jnp.maximum(lo, 1).astype(jnp.float32)


def mask_to_box_cols(masks_cols: Array, nm: int, H: int, W: int) -> Array:
    """Boxes from BLOCK-COLUMN bool masks [B, H*W, nm*16] -> [B, nm, 4]
    xyxy in low-res (4H x 4W) pixels, matching batched_mask_to_box on the
    spatial layout (row 4i+2di+ei, col 4j+2dj+ej)."""
    B = masks_cols.shape[0]
    x = masks_cols.reshape(B, H, W, nm, 2, 2, 2, 2)  # (i, j, m, di,dj,ei,ej)
    any_row = jnp.any(x, axis=(2, 5, 7))             # [B, H, nm, di, ei]
    any_row = jnp.transpose(any_row, (0, 2, 1, 3, 4)).reshape(B, nm, 4 * H)
    any_col = jnp.any(x, axis=(1, 4, 6))             # [B, W, nm, dj, ej]
    any_col = jnp.transpose(any_col, (0, 2, 1, 3, 4)).reshape(B, nm, 4 * W)
    rows = jnp.arange(4 * H)
    cols = jnp.arange(4 * W)
    top = jnp.min(jnp.where(any_row, rows, 4 * H), axis=-1)
    bottom = jnp.max(jnp.where(any_row, rows, -1), axis=-1)
    left = jnp.min(jnp.where(any_col, cols, 4 * W), axis=-1)
    right = jnp.max(jnp.where(any_col, cols, -1), axis=-1)
    empty = ~jnp.any(any_row, axis=-1)
    box = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, box).astype(jnp.float32)


def box_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU for xyxy boxes (host numpy)."""
    a1 = np.maximum(boxes1[:, 2] - boxes1[:, 0], 0) * np.maximum(
        boxes1[:, 3] - boxes1[:, 1], 0)
    a2 = np.maximum(boxes2[:, 2] - boxes2[:, 0], 0) * np.maximum(
        boxes2[:, 3] - boxes2[:, 1], 0)
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return inter / np.maximum(union, 1e-7)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float
        ) -> np.ndarray:
    """Greedy NMS -> kept indices (replaces torchvision.batched_nms)."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    order = np.argsort(-scores)
    iou = box_iou(boxes, boxes)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)


# ---------------------------------------------------------------------------
# RLE (pycocotools-compatible uncompressed; utils/amg.py:107-153)
# ---------------------------------------------------------------------------


def mask_to_rle(masks: np.ndarray) -> List[Dict[str, Any]]:
    """[B, H, W] bool -> list of uncompressed RLEs (column-major runs,
    starting with a 0-run like COCO)."""
    try:
        from ullsam_tpu.native import host_ops
        if host_ops.available():
            return host_ops.mask_to_rle(masks)
    except ImportError:
        pass
    B, H, W = masks.shape
    flat = masks.transpose(0, 2, 1).reshape(B, -1)  # column-major per mask
    out = []
    for b in range(B):
        row = flat[b]
        change = np.flatnonzero(row[1:] != row[:-1]) + 1
        idx = np.concatenate([[0], change, [H * W]])
        counts = np.diff(idx).tolist()
        if row[0]:
            counts = [0] + counts
        out.append({"size": [H, W], "counts": counts})
    return out


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """Uncompressed RLE -> [H, W] bool (utils/amg.py:138-148)."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx:idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def coco_encode_rle(uncompressed_rle: Dict[str, Any]) -> Dict[str, Any]:
    """Uncompressed counts -> COCO compressed string (pycocotools LEB128
    variant; replaces utils/amg.py:294-300's pycocotools call)."""
    h, w = uncompressed_rle["size"]
    counts = uncompressed_rle["counts"]
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]  # delta encoding from pycocotools
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or
                        (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return {"size": [h, w], "counts": out.decode("ascii")}


# ---------------------------------------------------------------------------
# crops (utils/amg.py:200-264)
# ---------------------------------------------------------------------------


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float
                        ) -> Tuple[List[List[int]], List[int]]:
    """Overlapping crop boxes per layer; layer 0 = full image."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(np.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i)
                       for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i)
                       for i in range(n_crops_per_side)]
        for x0 in crop_box_x0:
            for y0 in crop_box_y0:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                                   min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + np.asarray([[x0, y0, x0, y0]], boxes.dtype)


def uncrop_points(points: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return points + np.asarray([[x0, y0]], points.dtype)


def uncrop_masks(masks: np.ndarray, crop_box: List[int], orig_h: int,
                 orig_w: int) -> np.ndarray:
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad = ((0, 0), (y0, orig_h - y1), (x0, orig_w - x1))
    return np.pad(masks, pad)


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str
                         ) -> Tuple[np.ndarray, bool]:
    """Remove small connected components / fill small holes
    (utils/amg.py:267-291; cv2 replaced by native ext or scipy.ndimage)."""
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    try:
        from ullsam_tpu.native import host_ops
        if host_ops.available():
            labels, n = host_ops.connected_components(working)
        else:
            raise ImportError
    except ImportError:
        from scipy import ndimage
        # 8-connectivity to match the reference's cv2 default
        labels, n = ndimage.label(working, structure=np.ones((3, 3)))
    sizes = np.bincount(labels.ravel(), minlength=n + 1)[1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = np.isin(labels, small)
    if correct_holes:
        return mask | fill, True
    big = ~fill & (labels > 0)
    if not big.any():
        # keep the largest island if everything was small
        keep = int(np.argmax(sizes)) + 1
        big = labels == keep
    return big, True


# ---------------------------------------------------------------------------
# the jitted sweep kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("cfg", "out_h", "out_w", "input_hw"))
def _upscale_threshold(cfg: SamConfig, low_res, out_h: int, out_w: int,
                       input_hw: Tuple[int, int]):
    """Selected low-res logits -> bool masks at original resolution
    (postprocess_masks geometry, sam.py:133-162)."""
    from ullsam_tpu.ops.resize import sam_postprocess_resize
    up = sam_postprocess_resize(low_res, cfg.vit.img_size, input_hw,
                                (out_h, out_w), compute_dtype=jnp.bfloat16)
    return up > cfg.mask_threshold


def _cols_to_spatial_masks(sel16, H: int, W: int):
    """Selected block-column logits [K, H*W, 16] -> spatial [K, 4H, 4W].
    The layout restore happens AFTER top-k selection, on ~33 MB instead of
    the full candidate set."""
    K = sel16.shape[0]
    sp = sel16.reshape(K, H, W, 2, 2, 2, 2)          # (i, j, di,dj,ei,ej)
    sp = jnp.transpose(sp, (0, 1, 3, 5, 2, 4, 6))    # (i, di, ei, j, dj, ej)
    return sp.reshape(K, 4 * H, 4 * W)


def _device_box_iou(boxes: Array) -> Array:
    """Pairwise IoU [N, N] on device for xyxy boxes."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-7)


def _device_nms_topk(boxes: Array, scores: Array, iou_threshold: float,
                     k: int) -> Tuple[Array, Array]:
    """Greedy NMS keeping at most k boxes, fully on device.

    Returns (indices [k], valid [k]). Runs k iterations of
    argmax-and-suppress over the precomputed IoU matrix — no host sync.
    """
    iou = _device_box_iou(boxes)

    def body(carry, _):
        scores = carry
        i = jnp.argmax(scores)
        valid = scores[i] > -jnp.inf
        # suppress overlapping + the chosen one
        suppress = jnp.where(iou[i] > iou_threshold, -jnp.inf, 0.0)
        scores = jnp.where(valid, scores + suppress, scores)
        scores = scores.at[i].set(-jnp.inf)
        return scores, (i, valid)

    _, (idx, valid) = jax.lax.scan(body, scores, None, length=k)
    return idx, valid


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "points_per_batch", "max_out", "pred_iou_thresh",
                     "stability_thresh", "stability_offset",
                     "box_nms_thresh", "input_hw", "out_hw", "n_real",
                     "compute_dtype"))
def _amg_device_sweep(params, cfg: SamConfig, image, points,
                      points_per_batch: int, max_out: int,
                      pred_iou_thresh: float, stability_thresh: float,
                      stability_offset: float, box_nms_thresh: float,
                      input_hw: Tuple[int, int], out_hw: Tuple[int, int],
                      n_real: int, compute_dtype=jnp.float32):
    """The ENTIRE AMG sweep as one device program (one dispatch, one sync):

    encode -> lax.map over prompt chunks (decode + iou/stability/boxes at
    low res, logits kept bf16 in HBM) -> threshold filter -> on-device
    greedy NMS -> top-max_out gather -> fused upscale-threshold to out_hw.

    On the axon relay a single host round trip costs ~400ms, so per-chunk
    host filtering dominates any compute saving — everything stays on
    device until the final (small) stats transfer.

    image: [1, ch, cw, 3] RAW crop (uint8/float 0-255, any size) — the
    longest-side resize to input_hw, normalization, and padding all happen
    ON DEVICE (ships ~3MB uint8 instead of 12MB fp32 + a resize round
    trip). points: [N, 2] input-frame pixels, N % points_per_batch == 0.
    Returns dict with masks [max_out, *out_hw] bool plus per-mask stats.
    """
    from ullsam_tpu.ops.resize import bilinear_resize_nhwc
    x = bilinear_resize_nhwc(image.astype(jnp.float32), input_hw[0],
                             input_hw[1])
    emb = S.encode_image(params, cfg,
                         S.preprocess(x, cfg).astype(compute_dtype))
    H, W = emb.shape[1], emb.shape[2]
    n_chunks = points.shape[0] // points_per_batch
    chunks = points.reshape(n_chunks, points_per_batch, 2)

    def do_chunk(pts):
        labels = jnp.ones((points_per_batch, 1), jnp.int32)
        # BLOCK-COLUMN decode (no spatial transpose; fused Pallas
        # upscale+hypernet on TPU) — identical values to decode_masks.
        # On TPU the kernel also emits the stability counts and box
        # bitmaps in-VMEM (the XLA stats chain re-read the ~100 MB cols
        # tensor several times per chunk).
        cols, iou, st = S.decode_masks_cols_stats(
            params, cfg, emb, points=(pts[:, None, :], labels),
            multimask_output=True, stability_offset=stability_offset)
        M = iou.shape[1]
        if st is not None:
            stability, boxes = st
        else:
            stability = stability_score_cols(cols, M, cfg.mask_threshold,
                                             stability_offset)
            boxes = mask_to_box_cols(cols > cfg.mask_threshold, M, H, W)
        return (cols.astype(jnp.bfloat16), iou.reshape(-1),
                stability.reshape(-1), boxes.reshape(-1, 4))

    cols, iou, stability, boxes = jax.lax.map(do_chunk, chunks)
    M = cols.shape[-1] // 16
    cols = cols.reshape(-1, H * W, M * 16)  # candidate prompt-major
    iou = iou.reshape(-1)
    stability = stability.reshape(-1)
    boxes = boxes.reshape(-1, 4)

    keep = jnp.arange(iou.shape[0]) < n_real * M  # mask chunk padding
    if pred_iou_thresh > 0.0:
        keep &= iou > pred_iou_thresh
    if stability_thresh > 0.0:
        keep &= stability >= stability_thresh
    scores = jnp.where(keep, iou, -jnp.inf)

    if box_nms_thresh < 1.0:
        idx, valid = _device_nms_topk(boxes, scores, box_nms_thresh, max_out)
    else:
        top = jax.lax.top_k(scores, max_out)
        idx, valid = top[1], top[0] > -jnp.inf

    # candidate idx = prompt * M + m: gather prompt rows, then the m-th
    # 16-column sub-pixel group via a one-hot contraction (lane-native)
    sel_p = jnp.take(cols, idx // M, axis=0)        # [max_out, N, M*16]
    onehot = jax.nn.one_hot(idx % M, M, dtype=sel_p.dtype)
    sel16 = jnp.einsum("knmf,km->knf",
                       sel_p.reshape(max_out, H * W, M, 16), onehot)
    sel = _cols_to_spatial_masks(sel16, H, W)
    masks = _upscale_threshold(cfg, sel, out_hw[0], out_hw[1], input_hw)
    masks = masks & valid[:, None, None]
    out = {
        "masks": masks, "indices": idx, "valid": valid,
        "iou": jnp.take(iou, idx), "stability": jnp.take(stability, idx),
        "boxes_low": jnp.take(boxes, idx, axis=0),
        "areas": jnp.sum(masks, axis=(1, 2), dtype=jnp.int32),
    }
    # all per-mask stats as ONE [max_out, 9] f32 tensor: a device_get of
    # the 6 separate leaves costs up to 6 relay round trips per image
    # (~25 ms base latency each); one packed transfer collapses that to
    # one. indices (< 3*n) and areas (< 2^24 px) are exact in f32.
    out["stats_packed"] = jnp.concatenate(
        [out["indices"].astype(jnp.float32)[:, None],
         out["valid"].astype(jnp.float32)[:, None],
         out["iou"].astype(jnp.float32)[:, None],
         out["stability"].astype(jnp.float32)[:, None],
         out["boxes_low"].astype(jnp.float32),
         out["areas"].astype(jnp.float32)[:, None]], axis=-1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "points_per_batch", "max_out", "pred_iou_thresh",
                     "stability_thresh", "stability_offset",
                     "box_nms_thresh", "input_hw", "crop_hw", "n_real",
                     "compute_dtype"))
def _amg_device_sweep_crops(params, cfg: SamConfig, crops, points,
                            points_per_batch: int, max_out: int,
                            pred_iou_thresh: float, stability_thresh: float,
                            stability_offset: float, box_nms_thresh: float,
                            input_hw: Tuple[int, int],
                            crop_hw: Tuple[int, int], n_real: int,
                            compute_dtype=jnp.float32):
    """K EQUAL-SIZE crops swept in ONE dispatch (one trace): lax.map of the
    single-crop sweep over the stacked crops. crops: [K, ch, cw, 3] raw.
    Returns the per-crop sweep dicts stacked on a leading K axis (masks
    [K, max_out, ch, cw])."""
    def one(crop):
        return _amg_device_sweep(
            params, cfg, crop[None], points,
            points_per_batch=points_per_batch, max_out=max_out,
            pred_iou_thresh=pred_iou_thresh,
            stability_thresh=stability_thresh,
            stability_offset=stability_offset,
            box_nms_thresh=box_nms_thresh, input_hw=input_hw,
            out_hw=crop_hw, n_real=n_real, compute_dtype=compute_dtype)

    return jax.lax.map(one, crops)


@functools.partial(
    jax.jit,
    static_argnames=("orig_hw", "crop_hws", "crop_nms_thresh", "final_k",
                     "scale_full", "scale_crops"))
def _merge_crop_pools_device(full_out, pools, offsets, areas,
                             orig_hw: Tuple[int, int],
                             crop_hws: Tuple[Tuple[int, int], ...],
                             crop_nms_thresh: float, final_k: int,
                             scale_full: Tuple[float, float],
                             scale_crops: Tuple[Tuple[float, float], ...]):
    """Cross-crop NMS + survivor gather over ANY number of crop pools.

    Generalizes `_merge_crops_device` from one equal-size crop pool to G
    pools of distinct geometries, which is what a crop_n_layers>=2 pyramid
    (and the unequal edge crops `generate_crop_boxes` produces via its
    ceil split, utils/amg.py:220-247) turns into: each pool g holds the
    stacked sweep of K_g same-size crops (masks [K_g, M_g, ch_g, cw_g]).
    All candidates NMS together in the original frame (smaller crops
    preferred, reference crop-loop semantics utils/amg.py:200-264);
    survivor masks are placed at their crop offsets on device.
    """
    H, W = orig_hw
    Mf = full_out["valid"].shape[0]
    G = len(pools)

    bf = full_out["boxes_low"] * jnp.asarray(
        [scale_full[1], scale_full[0]] * 2, jnp.float32)
    cand_boxes, cand_valid, cand_iou, cand_stab, cand_pref = \
        [bf], [full_out["valid"]], [full_out["iou"]], \
        [full_out["stability"]], \
        [jnp.full((Mf,), 1.0 / (float(H) * float(W) + 1.0), jnp.float32)]
    # per-candidate source crop box [x0,y0,x1,y1] for reporting
    cand_crop = [jnp.broadcast_to(
        jnp.asarray([0, 0, W, H], jnp.float32), (Mf, 4))]
    sizes = [Mf]
    for g in range(G):
        K, Mc = pools[g]["valid"].shape
        ch, cw = crop_hws[g]
        sh, sw = scale_crops[g]
        off = offsets[g].astype(jnp.float32)          # [K, 2] (x0, y0)
        bc = pools[g]["boxes_low"] * jnp.asarray([sw, sh] * 2, jnp.float32)
        bc = bc + jnp.concatenate([off, off], -1)[:, None, :]
        cand_boxes.append(bc.reshape(K * Mc, 4))
        cand_valid.append(pools[g]["valid"].reshape(-1))
        cand_iou.append(pools[g]["iou"].reshape(-1))
        cand_stab.append(pools[g]["stability"].reshape(-1))
        cand_pref.append(jnp.repeat(
            1.0 / (areas[g].astype(jnp.float32) + 1.0), Mc))
        cb = jnp.concatenate(
            [off, off + jnp.asarray([cw, ch], jnp.float32)], -1)
        cand_crop.append(jnp.repeat(cb, Mc, axis=0))
        sizes.append(K * Mc)

    boxes = jnp.concatenate(cand_boxes, axis=0)
    valid = jnp.concatenate(cand_valid)
    iou = jnp.concatenate(cand_iou)
    stab = jnp.concatenate(cand_stab)
    pref = jnp.concatenate(cand_pref)
    crop_box_of = jnp.concatenate(cand_crop, axis=0)
    scores = jnp.where(valid, pref + 1e-9 * iou, -jnp.inf)

    idx, keep = _device_nms_topk(boxes, scores, crop_nms_thresh, final_k)

    starts = np.cumsum([0] + sizes)[:-1]              # static pool starts
    pool_id = sum((idx >= s).astype(jnp.int32)
                  for s in starts[1:]) if G else jnp.zeros_like(idx)
    from_full = pool_id == 0

    def build(i):
        ix = idx[i]

        def b_full(_):
            return full_out["masks"][jnp.clip(ix, 0, Mf - 1)]

        def b_pool(g):
            K, Mc = pools[g]["valid"].shape

            def f(_):
                rel = jnp.clip(ix - starts[g + 1], 0, K * Mc - 1)
                mc = pools[g]["masks"][rel // Mc, rel % Mc]
                return jax.lax.dynamic_update_slice(
                    jnp.zeros((H, W), bool), mc,
                    (offsets[g][rel // Mc, 1], offsets[g][rel // Mc, 0]))
            return f

        return jax.lax.switch(pool_id[i],
                              [b_full] + [b_pool(g) for g in range(G)],
                              None)

    masks = jax.lax.map(build, jnp.arange(final_k))
    masks = masks & keep[:, None, None]
    return {
        "masks": masks, "valid": keep,
        "iou": jnp.take(iou, idx), "stability": jnp.take(stab, idx),
        "boxes": jnp.take(boxes, idx, axis=0),
        "from_full": from_full,
        "crop_box_of": jnp.take(crop_box_of, idx, axis=0),
        "areas": jnp.sum(masks, axis=(1, 2), dtype=jnp.int32),
    }


@functools.partial(
    jax.jit,
    static_argnames=("orig_hw", "crop_hw", "crop_nms_thresh", "final_k",
                     "scale_full", "scale_crop"))
def _merge_crops_device(full_out, crops_out, crop_offsets, crop_areas,
                        orig_hw: Tuple[int, int], crop_hw: Tuple[int, int],
                        crop_nms_thresh: float, final_k: int,
                        scale_full: Tuple[float, float],
                        scale_crop: Tuple[float, float]):
    """Cross-crop NMS + survivor gather + full-frame placement, on device
    (round-2 verdict item 9: the host stitch/retrace multi-crop path).

    full_out: the full-image sweep dict (masks [Mf, H, W]); crops_out: the
    stacked crop sweep dict (masks [K, Mc, ch, cw]); crop_offsets [K, 2]
    (x0, y0). Boxes are uncropped on device; NMS scores prefer smaller
    crops (reference cross-crop semantics, utils/amg.py crop loop) with
    predicted IoU as tie-break; survivors' masks are gathered from the two
    pools and the crop ones placed at their offsets — no host round trip,
    no per-crop retrace."""
    H, W = orig_hw
    Mf = full_out["valid"].shape[0]
    K, Mc = crops_out["valid"].shape

    # candidate boxes in the original frame
    bf = full_out["boxes_low"] * jnp.asarray(
        [scale_full[1], scale_full[0]] * 2, jnp.float32)
    bc = crops_out["boxes_low"] * jnp.asarray(
        [scale_crop[1], scale_crop[0]] * 2, jnp.float32)
    off = crop_offsets.astype(jnp.float32)            # [K, 2] (x0, y0)
    bc = bc + jnp.concatenate([off, off], -1)[:, None, :]

    boxes = jnp.concatenate([bf, bc.reshape(K * Mc, 4)], axis=0)
    valid = jnp.concatenate([full_out["valid"],
                             crops_out["valid"].reshape(-1)])
    iou = jnp.concatenate([full_out["iou"], crops_out["iou"].reshape(-1)])
    stab = jnp.concatenate([full_out["stability"],
                            crops_out["stability"].reshape(-1)])
    area_full = float(H) * float(W)
    pref = jnp.concatenate([
        jnp.full((Mf,), 1.0 / (area_full + 1.0), jnp.float32),
        jnp.repeat(1.0 / (crop_areas.astype(jnp.float32) + 1.0), Mc)])
    scores = jnp.where(valid, pref + 1e-9 * iou, -jnp.inf)

    idx, keep = _device_nms_topk(boxes, scores, crop_nms_thresh, final_k)

    from_full = idx < Mf
    slot_f = jnp.clip(idx, 0, Mf - 1)
    ci = jnp.clip((idx - Mf) // Mc, 0, K - 1)
    slot_c = jnp.clip(idx - Mf, 0, K * Mc - 1) % Mc

    def build(i):
        mf = full_out["masks"][slot_f[i]]
        mc = crops_out["masks"][ci[i], slot_c[i]]
        placed = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W), bool), mc,
            (crop_offsets[ci[i], 1], crop_offsets[ci[i], 0]))
        return jnp.where(from_full[i], mf, placed)

    masks = jax.lax.map(build, jnp.arange(final_k))
    masks = masks & keep[:, None, None]
    return {
        "masks": masks, "valid": keep,
        "iou": jnp.take(iou, idx), "stability": jnp.take(stab, idx),
        "boxes": jnp.take(boxes, idx, axis=0),
        "from_full": from_full, "crop_index": jnp.where(from_full, -1, ci),
        "areas": jnp.sum(masks, axis=(1, 2), dtype=jnp.int32),
    }


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


class AutomaticMaskGenerator:
    """SAM AMG on TPU. Mirrors the upstream generator contract; the sweep,
    filtering, and box math run on device."""

    def __init__(self, cfg: SamConfig, params,
                 points_per_side: int = 32,
                 points_per_batch: int = 256,
                 pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 crop_n_layers: int = 0,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1,
                 min_mask_region_area: int = 0,
                 output_mode: str = "binary_mask",
                 max_masks: Optional[int] = None,
                 compute_dtype=jnp.float32,
                 device_multicrop: bool = True):
        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle")
        self.cfg = cfg
        self.params = params
        self.point_grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self.max_masks = max_masks
        self.device_multicrop = device_multicrop
        self.compute_dtype = jnp.dtype(compute_dtype)
        if self.compute_dtype != jnp.float32:
            from ullsam_tpu.core.tree import cast_floating
            params = cast_floating(params, self.compute_dtype)
        from ullsam_tpu.inference.transforms import ResizeLongestSide
        self.transform = ResizeLongestSide(cfg.vit.img_size)

    # -- per-crop sweep ---------------------------------------------------

    def _process_crop(self, image: np.ndarray, crop_box: List[int],
                      layer_idx: int, orig_size: Tuple[int, int],
                      defer: bool = False):
        """One crop = ONE device dispatch (_amg_device_sweep) + one small
        stats transfer. Returns (MaskData, masks bool [max_out, ch, cw] on
        device, max_out)."""
        from ullsam_tpu.inference.transforms import get_preprocess_shape
        x0, y0, x1, y1 = crop_box
        cropped = image[y0:y1, x0:x1]
        crop_size = tuple(cropped.shape[:2])
        input_hw = get_preprocess_shape(crop_size[0], crop_size[1],
                                        self.cfg.vit.img_size)

        # the transformed point grid depends only on (layer, crop size) —
        # reuse one device buffer across a batch of same-size images
        # instead of re-uploading an identical tensor per image (each
        # upload is one serialized relay transfer in the dispatch loop).
        # Dict cache, not single-slot: with crop_n_layers>=1 the
        # alternating full-frame/crop sizes would evict each other every
        # image (advisor r4). Bounded — AMG produces O(crop layers)
        # distinct sizes per run.
        key = (layer_idx, crop_size)
        cache = getattr(self, "_pts_cache", None)
        if cache is None or not isinstance(cache, dict):
            cache = self._pts_cache = {}
        if key in cache:
            points_for_image, in_pts_dev, n = cache[key]
        else:
            points_scale = np.array(crop_size)[None, ::-1]  # (w, h)
            points_for_image = self.point_grids[layer_idx] * points_scale
            in_pts = self.transform.apply_coords(points_for_image, crop_size)
            n = len(in_pts)
            n_pad = -n % self.points_per_batch
            if n_pad:
                in_pts = np.concatenate([in_pts, np.zeros((n_pad, 2),
                                                          in_pts.dtype)])
            in_pts_dev = jnp.asarray(in_pts, jnp.float32)
            if len(cache) > 16:  # safety bound; never expected in practice
                cache.clear()
            cache[key] = (points_for_image, in_pts_dev, n)

        ppb = self.points_per_batch
        max_out = min(self.max_masks or 512, n * 3)

        out = _amg_device_sweep(
            self.params, self.cfg,
            jnp.asarray(cropped)[None],
            in_pts_dev,
            points_per_batch=ppb, max_out=max_out,
            pred_iou_thresh=self.pred_iou_thresh,
            stability_thresh=self.stability_score_thresh,
            stability_offset=self.stability_score_offset,
            box_nms_thresh=self.box_nms_thresh,
            input_hw=input_hw, out_hw=crop_size, n_real=n,
            compute_dtype=self.compute_dtype)
        if defer:
            # async handle: caller collects stats later (pipelining)
            return (out, crop_box, crop_size, input_hw, max_out,
                    points_for_image, n)
        return self._collect_crop(out, crop_box, crop_size, input_hw,
                                  max_out, points_for_image, n)

    def _collect_crop(self, out, crop_box, crop_size, input_hw, max_out,
                      points_for_image, n):
        # ONE small transfer for all per-mask stats (~max_out floats):
        # the packed [max_out, 9] tensor is a single relay round trip
        # (6 separate leaves measured ~20 ms/image of host overhead)
        if "stats_packed" in out:
            sp = np.asarray(out["stats_packed"])
            stats = {"indices": sp[:, 0].astype(np.int64),
                     "valid": sp[:, 1], "iou": sp[:, 2],
                     "stability": sp[:, 3], "boxes_low": sp[:, 4:8],
                     "areas": sp[:, 8].astype(np.int64)}
        else:
            stats = jax.device_get({k: out[k] for k in
                                    ("indices", "valid", "iou", "stability",
                                     "boxes_low", "areas")})
        valid = stats["valid"].astype(bool)

        lr = 4 * self.cfg.prompt_encoder.image_embedding_size[0]
        size = self.cfg.vit.img_size
        boxes = stats["boxes_low"].astype(np.float32) * (size / lr)
        boxes[:, [0, 2]] *= crop_size[1] / input_hw[1]
        boxes[:, [1, 3]] *= crop_size[0] / input_hw[0]

        points = np.repeat(points_for_image, 3, axis=0)[
            np.clip(stats["indices"], 0, n * 3 - 1)]

        data = MaskData(
            iou_preds=stats["iou"].astype(np.float32),
            stability=stats["stability"].astype(np.float32),
            boxes=uncrop_boxes_xyxy(boxes, crop_box),
            points=uncrop_points(points.astype(np.float32), crop_box),
            areas=stats["areas"].astype(np.int64),
            valid=valid,
            crop_boxes=np.asarray([crop_box] * max_out,
                                  np.float32).reshape(-1, 4),
            crop_size=[crop_size] * max_out,
            mask_slot=np.arange(max_out),
        )
        return data, out["masks"], max_out

    def _collect_device_multicrop(self, image: np.ndarray, crop_boxes,
                                  orig_size):
        """crop_n_layers==1 with equal-size layer-1 crops: the whole
        multi-crop pipeline stays ON DEVICE (round-2 verdict item 9) —
        the 4 crops sweep as ONE stacked dispatch (one trace instead of a
        retrace per crop geometry), cross-crop NMS runs on device, and
        survivors are placed into the full frame on device (no host
        stitch). Returns (MaskData, [masks [K, H, W] device], orig)."""
        from ullsam_tpu.inference.transforms import get_preprocess_shape

        full_handle = self._process_crop(image, crop_boxes[0], 0, orig_size,
                                         defer=True)
        full_out, _, _, input_full, max_out_f, pts_full, n_full = full_handle

        boxes1 = crop_boxes[1:]
        x0s = np.asarray([b[0] for b in boxes1], np.int32)
        y0s = np.asarray([b[1] for b in boxes1], np.int32)
        ch = boxes1[0][3] - boxes1[0][1]
        cw = boxes1[0][2] - boxes1[0][0]
        crop_imgs = np.stack([image[b[1]:b[3], b[0]:b[2]] for b in boxes1])
        input_crop = get_preprocess_shape(ch, cw, self.cfg.vit.img_size)
        pts_crop = self.point_grids[1] * np.array([cw, ch])[None]
        in_pts = self.transform.apply_coords(pts_crop, (ch, cw))
        ppb = self.points_per_batch
        n_c = len(in_pts)
        if -n_c % ppb:
            in_pts = np.concatenate(
                [in_pts, np.zeros((-n_c % ppb, 2), in_pts.dtype)])
        max_out_c = min(self.max_masks or 512, n_c * 3)
        crops_out = _amg_device_sweep_crops(
            self.params, self.cfg, jnp.asarray(crop_imgs),
            jnp.asarray(in_pts, jnp.float32), points_per_batch=ppb,
            max_out=max_out_c, pred_iou_thresh=self.pred_iou_thresh,
            stability_thresh=self.stability_score_thresh,
            stability_offset=self.stability_score_offset,
            box_nms_thresh=self.box_nms_thresh, input_hw=input_crop,
            crop_hw=(ch, cw), n_real=n_c,
            compute_dtype=self.compute_dtype)

        lr = 4 * self.cfg.prompt_encoder.image_embedding_size[0]
        size = self.cfg.vit.img_size
        final_k = self.max_masks or 512
        areas1 = np.full((len(boxes1),), float(ch) * float(cw), np.float32)
        merged = _merge_crops_device(
            full_out, crops_out,
            jnp.stack([jnp.asarray(x0s), jnp.asarray(y0s)], -1),
            jnp.asarray(areas1), tuple(orig_size), (ch, cw),
            self.crop_nms_thresh, final_k,
            scale_full=(size / lr * orig_size[0] / input_full[0],
                        size / lr * orig_size[1] / input_full[1]),
            scale_crop=(size / lr * ch / input_crop[0],
                        size / lr * cw / input_crop[1]))

        stats = jax.device_get({
            "valid": merged["valid"], "iou": merged["iou"],
            "stability": merged["stability"], "boxes": merged["boxes"],
            "areas": merged["areas"], "from_full": merged["from_full"],
            "crop_index": merged["crop_index"]})
        valid = stats["valid"].astype(bool)
        K = final_k
        report_boxes = np.where(
            stats["from_full"][:, None],
            np.asarray([0, 0, orig_size[1], orig_size[0]], np.float32)[None],
            np.concatenate([
                np.stack([x0s, y0s], -1),
                np.stack([x0s + cw, y0s + ch], -1)], -1).astype(np.float32)[
                np.clip(stats["crop_index"], 0, len(boxes1) - 1)])
        data = MaskData(
            iou_preds=stats["iou"].astype(np.float32),
            stability=stats["stability"].astype(np.float32),
            boxes=stats["boxes"].astype(np.float32),
            points=np.zeros((K, 2), np.float32),
            areas=stats["areas"].astype(np.int64),
            valid=valid,
            # masks are ALREADY placed in the full frame: the pool's crop
            # box is the whole image (uncrop no-op); the true source crop
            # is reported separately for the output records
            crop_boxes=np.asarray([[0, 0, orig_size[1], orig_size[0]]] * K,
                                  np.float32),
            report_crop_boxes=report_boxes,
            crop_size=[tuple(orig_size)] * K,
            mask_slot=np.arange(K),
            crop_index=np.zeros((K,), np.int64),
        )
        data.filter(valid)
        return data, [merged["masks"]], orig_size

    def _collect_device_multicrop_pools(self, image: np.ndarray, crop_boxes,
                                        layer_idxs, orig_size):
        """ANY crop pyramid fully on device (crop_n_layers>=2, unequal edge
        crops): crops are grouped into same-geometry pools, each pool sweeps
        as ONE stacked dispatch, and a single cross-pool NMS + placement
        kernel commits survivors into the full frame. Generalizes
        `_collect_device_multicrop` beyond the equal-size layer-1 case
        (reference crop pyramid: utils/amg.py:200-264 crop loop +
        generate_crop_boxes ceil split :220-247)."""
        from ullsam_tpu.inference.transforms import get_preprocess_shape

        full_handle = self._process_crop(image, crop_boxes[0], 0, orig_size,
                                         defer=True)
        full_out, _, _, input_full, _, _, _ = full_handle

        groups: dict = {}
        for b, li in zip(crop_boxes[1:], layer_idxs[1:]):
            groups.setdefault((li, b[3] - b[1], b[2] - b[0]), []).append(b)

        lr = 4 * self.cfg.prompt_encoder.image_embedding_size[0]
        size = self.cfg.vit.img_size
        ppb = self.points_per_batch
        pools, offsets, areas, crop_hws, scale_crops = [], [], [], [], []
        for (li, ch, cw), boxes in groups.items():
            crop_imgs = np.stack([image[b[1]:b[3], b[0]:b[2]]
                                  for b in boxes])
            input_crop = get_preprocess_shape(ch, cw, size)
            pts_crop = self.point_grids[li] * np.array([cw, ch])[None]
            in_pts = self.transform.apply_coords(pts_crop, (ch, cw))
            n_c = len(in_pts)
            if -n_c % ppb:
                in_pts = np.concatenate(
                    [in_pts, np.zeros((-n_c % ppb, 2), in_pts.dtype)])
            max_out_c = min(self.max_masks or 512, n_c * 3)
            pools.append(_amg_device_sweep_crops(
                self.params, self.cfg, jnp.asarray(crop_imgs),
                jnp.asarray(in_pts, jnp.float32), points_per_batch=ppb,
                max_out=max_out_c, pred_iou_thresh=self.pred_iou_thresh,
                stability_thresh=self.stability_score_thresh,
                stability_offset=self.stability_score_offset,
                box_nms_thresh=self.box_nms_thresh, input_hw=input_crop,
                crop_hw=(ch, cw), n_real=n_c,
                compute_dtype=self.compute_dtype))
            offsets.append(jnp.asarray([[b[0], b[1]] for b in boxes],
                                       jnp.int32))
            areas.append(jnp.full((len(boxes),), float(ch) * float(cw),
                                  jnp.float32))
            crop_hws.append((ch, cw))
            scale_crops.append((size / lr * ch / input_crop[0],
                                size / lr * cw / input_crop[1]))

        final_k = self.max_masks or 512
        merged = _merge_crop_pools_device(
            full_out, tuple(pools), tuple(offsets), tuple(areas),
            tuple(orig_size), tuple(crop_hws), self.crop_nms_thresh,
            final_k,
            scale_full=(size / lr * orig_size[0] / input_full[0],
                        size / lr * orig_size[1] / input_full[1]),
            scale_crops=tuple(scale_crops))

        stats = jax.device_get({
            "valid": merged["valid"], "iou": merged["iou"],
            "stability": merged["stability"], "boxes": merged["boxes"],
            "areas": merged["areas"],
            "crop_box_of": merged["crop_box_of"]})
        valid = stats["valid"].astype(bool)
        K = final_k
        data = MaskData(
            iou_preds=stats["iou"].astype(np.float32),
            stability=stats["stability"].astype(np.float32),
            boxes=stats["boxes"].astype(np.float32),
            points=np.zeros((K, 2), np.float32),
            areas=stats["areas"].astype(np.int64),
            valid=valid,
            # masks are already placed in the full frame (uncrop no-op);
            # the true source crop is reported separately
            crop_boxes=np.asarray([[0, 0, orig_size[1], orig_size[0]]] * K,
                                  np.float32),
            report_crop_boxes=stats["crop_box_of"].astype(np.float32),
            crop_size=[tuple(orig_size)] * K,
            mask_slot=np.arange(K),
            crop_index=np.zeros((K,), np.int64),
        )
        data.filter(valid)
        return data, [merged["masks"]], orig_size

    def _collect(self, image: np.ndarray):
        """Sweep all crops. Returns (MaskData of VALID survivors after
        cross-crop NMS, list of per-crop device mask arrays; each MaskData
        row carries (crop_index, mask_slot))."""
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)

        if (self.device_multicrop and self.crop_n_layers == 1
                and len(crop_boxes) > 1):
            sizes = {(b[3] - b[1], b[2] - b[0]) for b in crop_boxes[1:]}
            if len(sizes) == 1:
                return self._collect_device_multicrop(image, crop_boxes,
                                                      orig_size)
        if self.device_multicrop and len(crop_boxes) > 1:
            return self._collect_device_multicrop_pools(
                image, crop_boxes, layer_idxs, orig_size)

        data = MaskData(iou_preds=np.zeros((0,), np.float32),
                        stability=np.zeros((0,), np.float32),
                        boxes=np.zeros((0, 4), np.float32),
                        points=np.zeros((0, 2), np.float32),
                        areas=np.zeros((0,), np.int64),
                        valid=np.zeros((0,), bool),
                        crop_boxes=np.zeros((0, 4), np.float32),
                        crop_size=[], mask_slot=np.zeros((0,), np.int64),
                        crop_index=np.zeros((0,), np.int64))
        device_masks = []
        for ci, (crop_box, layer_idx) in enumerate(
                zip(crop_boxes, layer_idxs)):
            cd, masks_dev, max_out = self._process_crop(
                image, crop_box, layer_idx, orig_size)
            cd["crop_index"] = np.full(max_out, ci, np.int64)
            device_masks.append(masks_dev)
            data.cat(cd)

        data.filter(data["valid"])

        if len(crop_boxes) > 1 and len(data["boxes"]):
            # prefer masks from smaller crops (score by crop area inverse)
            areas = ((data["crop_boxes"][:, 2] - data["crop_boxes"][:, 0]) *
                     (data["crop_boxes"][:, 3] - data["crop_boxes"][:, 1]))
            scores = 1.0 / (areas + 1.0)
            keep = nms(data["boxes"], scores.astype(np.float32),
                       self.crop_nms_thresh)
            data.filter(keep)

        if (self.max_masks is not None
                and len(data["iou_preds"]) > self.max_masks):
            top = np.argsort(-data["iou_preds"])[: self.max_masks]
            data.filter(top)
        return data, device_masks, orig_size

    def generate_dense(self, image: np.ndarray):
        """Device-native output: (masks [K, H, W] bool ON DEVICE, MaskData).
        No RLE, no bulk host transfer — the fast path for on-TPU consumers
        and benchmarks. Single-crop configs never touch the host beyond one
        small stats read."""
        data, device_masks, orig_size = self._collect(image)
        if len(device_masks) == 1:
            masks = jnp.take(device_masks[0],
                             jnp.asarray(data["mask_slot"]), axis=0)
            return masks, data
        # multi-crop: uncrop on host (sizes differ per crop)
        return jnp.asarray(self._masks_to_host(data, device_masks,
                                               orig_size)), data

    def generate_dense_batch(self, images):
        """Pipelined throughput API: dispatch the device sweep for EVERY
        image before collecting any stats, overlapping compute with the
        per-image host sync. Single-crop configs only. Returns a list of
        (masks_on_device, MaskData)."""
        assert self.crop_n_layers == 0, "batch path is single-crop"
        # NB: do NOT pre-upload all images before dispatching (measured
        # 1638 -> 1232 masks/s): interleaved upload/dispatch overlaps the
        # relay transfer with the previous image's sweep, while a bulk
        # upload serializes ~30 ms/image ahead of the first sweep
        handles = []
        for image in images:
            orig_size = image.shape[:2]
            crop_box = [0, 0, orig_size[1], orig_size[0]]
            handles.append((self._process_crop(image, crop_box, 0,
                                               orig_size, defer=True),
                            orig_size))
            # start the packed-stats device->host copy as soon as the
            # sweep is dispatched: the transfer then rides the relay
            # behind the NEXT image's upload instead of being requested
            # lazily at collect time (round-4 verdict item 6 —
            # double-buffer the stats transfer against the next sweep)
            out = handles[-1][0][0]
            if "stats_packed" in out:
                try:
                    out["stats_packed"].copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass  # non-jax array (tests) or backend w/o async copy
        results = []
        for handle, orig_size in handles:
            cd, masks_dev, _ = self._collect_crop(*handle)
            cd.filter(cd["valid"])
            slots = cd["mask_slot"]
            if (len(slots) == masks_dev.shape[0]
                    and np.array_equal(slots, np.arange(len(slots)))):
                masks = masks_dev  # all slots valid: skip the identity gather
            else:
                masks = jnp.take(masks_dev, jnp.asarray(slots), axis=0)
            results.append((masks, cd))
        return results

    def _masks_to_host(self, data: MaskData, device_masks, orig_size):
        K = len(data["iou_preds"])
        out = np.zeros((K, orig_size[0], orig_size[1]), bool)
        for ci in range(len(device_masks)):
            rows = np.flatnonzero(data["crop_index"] == ci)
            if not len(rows):
                continue
            slots = data["mask_slot"][rows]
            sel = np.asarray(jnp.take(device_masks[ci],
                                      jnp.asarray(slots), axis=0))
            crop_box = data["crop_boxes"][rows[0]].astype(int).tolist()
            sel = uncrop_masks(sel, crop_box, orig_size[0], orig_size[1])
            out[rows] = sel
        return out

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: [H, W, 3] uint8 -> list of mask records (upstream AMG
        output contract)."""
        data, device_masks, orig_size = self._collect(image)
        K = len(data["iou_preds"])
        masks_full = self._masks_to_host(data, device_masks, orig_size)

        if self.min_mask_region_area > 0 and K:
            changed = np.zeros(K, bool)
            for i in range(K):
                m, ch1 = remove_small_regions(masks_full[i],
                                              self.min_mask_region_area,
                                              "holes")
                m, ch2 = remove_small_regions(m, self.min_mask_region_area,
                                              "islands")
                masks_full[i] = m
                changed[i] = ch1 or ch2
            # cleanup can merge duplicates: re-run NMS preferring
            # unchanged masks (upstream postprocess_small_regions behavior)
            boxes_clean = np.asarray(batched_mask_to_box(
                jnp.asarray(masks_full)))
            scores = (~changed).astype(np.float32)
            keep = nms(boxes_clean, scores, self.box_nms_thresh)
            keep = np.sort(keep)
            data.filter(keep)
            masks_full = masks_full[keep]
            K = len(keep)

        rles = mask_to_rle(masks_full) if K else []
        boxes_full = (np.asarray(batched_mask_to_box(
            jnp.asarray(masks_full))) if K else np.zeros((0, 4)))

        crop_col = (data["report_crop_boxes"] if "report_crop_boxes" in data
                    else data["crop_boxes"])
        records = []
        for i in range(K):
            crop_box = crop_col[i].astype(int).tolist()
            rle = rles[i]
            box = boxes_full[i]
            records.append({
                "segmentation": (masks_full[i]
                                 if self.output_mode == "binary_mask"
                                 else rle if self.output_mode ==
                                 "uncompressed_rle"
                                 else coco_encode_rle(rle)),
                "area": area_from_rle(rle),
                "bbox": [float(box[0]), float(box[1]),
                         float(box[2] - box[0]), float(box[3] - box[1])],
                "predicted_iou": float(data["iou_preds"][i]),
                "point_coords": [data["points"][i].tolist()],
                "stability_score": float(data["stability"][i]),
                "crop_box": [crop_box[0], crop_box[1],
                             crop_box[2] - crop_box[0],
                             crop_box[3] - crop_box[1]],
            })
        records.sort(key=lambda r: -r["area"])
        return records


# ---------------------------------------------------------------------------
# benchmark hook (bench.py)
# ---------------------------------------------------------------------------


def bench_amg_stats(points_per_side: int = 32, iters: int = 3,
                    variant: str = "vit_b",
                    pred_iou_thresh: float = 0.0,
                    stability_score_thresh: float = 0.0,
                    box_nms_thresh: float = 1.0,
                    calibrated: bool = False) -> dict:
    """Full-AMG-sweep throughput on synthetic images.

    Returns {masks_per_sec, images_per_sec, committed_masks}. The default
    thresholds-off/NMS-off config is the DETERMINISTIC workload (full
    1024-point sweep, 256 masks committed regardless of weights); pass the
    upstream production config (0.88 / 0.95 / NMS 0.7, SURVEY §2.13) for
    the realistic path — note that under random weights the IoU head
    commits ~nothing and NMS correctly collapses near-identical masks, so
    images_per_sec is the meaningful realistic number, not masks_per_sec.
    """
    import time

    from ullsam_tpu.models.sam import build_sam

    cfg, params = build_sam(variant)
    if calibrated:
        # closed-form calibration so the production thresholds commit a
        # realistic mask population (see inference/calibrate.py)
        from ullsam_tpu.inference.calibrate import calibrate_amg_weights
        params = calibrate_amg_weights(params, cfg)
    rng = np.random.RandomState(0)
    image = (rng.rand(1024, 1024, 3) * 255).astype(np.uint8)
    gen = AutomaticMaskGenerator(
        cfg, params, points_per_side=points_per_side,
        pred_iou_thresh=pred_iou_thresh,
        stability_score_thresh=stability_score_thresh,
        box_nms_thresh=box_nms_thresh, max_masks=256,
        compute_dtype=jnp.bfloat16)
    # device-native path: masks are materialized in HBM; only per-mask
    # pixel counts cross the host link (the axon tunnel makes bulk
    # host transfers dominate otherwise)
    images = [(rng.rand(1024, 1024, 3) * 255).astype(np.uint8)
              for _ in range(iters)]
    masks, _ = gen.generate_dense(image)  # warmup + compile
    np.asarray(jnp.sum(masks, axis=(1, 2)))
    t0 = time.perf_counter()
    total = 0
    # pipelined: all sweeps dispatched before any stats sync; areas are
    # computed FROM the final masks, so the stats transfer proves the
    # masks are materialized in HBM
    for masks, data in gen.generate_dense_batch(images):
        total += int(data["valid"].sum())
    dt = time.perf_counter() - t0
    return {"masks_per_sec": total / dt,
            "images_per_sec": len(images) / dt,
            "committed_masks": total}


def bench_amg(points_per_side: int = 32, iters: int = 3,
              variant: str = "vit_b") -> float:
    """masks/sec for the deterministic full AMG sweep (bench.py headline)."""
    return bench_amg_stats(points_per_side, iters, variant)["masks_per_sec"]


# ---------------------------------------------------------------------------
# multi-chip AMG (data-parallel over images)
# ---------------------------------------------------------------------------


def amg_sharded_sweep(params, cfg: SamConfig, images, points, mesh, *,
                      points_per_batch: int = 256, max_out: int = 256,
                      pred_iou_thresh: float = 0.0,
                      stability_thresh: float = 0.0,
                      stability_score_offset: float = 1.0,
                      box_nms_thresh: float = 1.0,
                      input_hw: Tuple[int, int] = None,
                      out_hw: Tuple[int, int] = None,
                      compute_dtype=jnp.bfloat16,
                      data_axes="data"):
    """Image-parallel AMG over a device mesh (SURVEY §2.10 inference DP).

    images: [D, H, W, 3] raw uint8/float, one image per device along
    ``data_axes`` (a mesh axis name or tuple of names — pass
    ``("data", "model")`` to spread images over EVERY device of a 2D
    training/serving mesh instead of building a separate dp-only mesh);
    points: [N, 2] shared prompt grid (same-size images). Each device runs
    the full single-dispatch `_amg_device_sweep` on its image — no
    cross-device communication at all (masks stay device-local, sharded
    along ``data_axes``). Returns the per-image sweep dict stacked on a
    leading sharded axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    D, H, W, _ = images.shape
    n_real = points.shape[0]
    n_pad = -n_real % points_per_batch
    if n_pad:
        points = jnp.concatenate(
            [points, jnp.zeros((n_pad, 2), points.dtype)])
    input_hw = input_hw or (cfg.vit.img_size, cfg.vit.img_size)
    out_hw = out_hw or (H, W)

    def one(params, image, pts):
        return _amg_device_sweep(
            params, cfg, image, pts,
            points_per_batch=points_per_batch, max_out=max_out,
            pred_iou_thresh=pred_iou_thresh,
            stability_thresh=stability_thresh,
            stability_offset=stability_score_offset,
            box_nms_thresh=box_nms_thresh,
            input_hw=input_hw, out_hw=out_hw, n_real=n_real,
            compute_dtype=compute_dtype)

    fn = shard_map(one, mesh=mesh,
                   in_specs=(P(), P(data_axes), P()),
                   out_specs=P(data_axes))
    out = jax.jit(fn)(params, images, points)
    # per-device results concatenate along axis 0; restore [D, ...] leaves
    return jax.tree.map(lambda a: a.reshape(D, -1, *a.shape[1:])
                        if a.shape[0] == D * max_out
                        else a.reshape(D, *a.shape[1:]), out)
