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
        labels, n = ndimage.label(working)
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
                   static_argnames=("cfg", "stability_offset"))
def _sweep_chunk(params, cfg: SamConfig, emb, coords,
                 stability_offset: float = 1.0):
    """Decode one chunk of single-point prompts and compute all per-mask
    statistics on device at low res.

    coords: [P, 2] in input-frame pixels. Returns dict of [P*3, ...] arrays:
    low-res logits, iou predictions, stability scores, low-res boxes.
    """
    P = coords.shape[0]
    pts = coords[:, None, :]
    labels = jnp.ones((P, 1), jnp.int32)
    low_res, iou = S.decode_masks(params, cfg, emb, points=(pts, labels),
                                  multimask_output=True)  # [P,3,256,256]
    M = low_res.shape[1]
    flat = low_res.reshape(P * M, *low_res.shape[2:])
    iou = iou.reshape(P * M)
    stability = calculate_stability_score(flat, cfg.mask_threshold,
                                          stability_offset)
    boxes = batched_mask_to_box(flat > cfg.mask_threshold)
    return {"low_res": flat, "iou": iou, "stability": stability,
            "boxes_low": boxes}


@functools.partial(jax.jit,
                   static_argnames=("cfg", "out_h", "out_w", "input_hw"))
def _upscale_threshold(cfg: SamConfig, low_res, out_h: int, out_w: int,
                       input_hw: Tuple[int, int]):
    """Selected low-res logits -> bool masks at original resolution
    (postprocess_masks geometry, sam.py:133-162)."""
    K = low_res.shape[0]
    size = cfg.vit.img_size
    up = jax.image.resize(low_res.astype(jnp.float32), (K, size, size),
                          method="bilinear")
    up = up[:, :input_hw[0], :input_hw[1]]
    up = jax.image.resize(up, (K, out_h, out_w), method="bilinear")
    return up > cfg.mask_threshold


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
                 max_masks: Optional[int] = None):
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
        from ullsam_tpu.inference.transforms import ResizeLongestSide
        self.transform = ResizeLongestSide(cfg.vit.img_size)

    # -- per-crop sweep ---------------------------------------------------

    def _process_crop(self, image: np.ndarray, crop_box: List[int],
                      layer_idx: int, orig_size: Tuple[int, int]) -> MaskData:
        x0, y0, x1, y1 = crop_box
        cropped = image[y0:y1, x0:x1]
        crop_size = cropped.shape[:2]
        resized = self.transform.apply_image(cropped)
        input_hw = resized.shape[:2]
        emb = None

        x = jnp.asarray(resized, jnp.float32)[None]
        from ullsam_tpu.inference.predictor import _encode
        emb = _encode(self.params, self.cfg, x)

        points_scale = np.array(crop_size)[None, ::-1]  # (w, h)
        points_for_image = self.point_grids[layer_idx] * points_scale

        data = MaskData(iou_preds=np.zeros((0,), np.float32),
                        stability=np.zeros((0,), np.float32),
                        boxes_low=np.zeros((0, 4), np.float32),
                        points=np.zeros((0, 2), np.float32))
        low_res_chunks = []
        ppb = self.points_per_batch
        n = len(points_for_image)
        n_pad = -n % ppb
        padded = np.concatenate(
            [points_for_image,
             np.zeros((n_pad, 2), points_for_image.dtype)]) if n_pad else \
            points_for_image
        for start in range(0, len(padded), ppb):
            pts = padded[start:start + ppb]
            real = min(ppb, n - start)
            if real <= 0:
                break
            in_pts = self.transform.apply_coords(pts, crop_size)
            out = _sweep_chunk(self.params, self.cfg, emb,
                               jnp.asarray(in_pts, jnp.float32),
                               stability_offset=self.stability_score_offset)
            M = 3
            iou = np.asarray(out["iou"])[: real * M]
            stab = np.asarray(out["stability"])[: real * M]
            keep = np.ones(real * M, bool)
            if self.pred_iou_thresh > 0:
                keep &= iou > self.pred_iou_thresh
            if self.stability_score_thresh > 0:
                keep &= stab >= self.stability_score_thresh
            if not keep.any():
                continue
            idx = np.flatnonzero(keep)
            # stays ON DEVICE: logits never cross the host link
            low_res_kept = jnp.take(out["low_res"], jnp.asarray(idx), axis=0)
            chunk = MaskData(
                iou_preds=iou[idx],
                stability=stab[idx],
                boxes_low=np.asarray(out["boxes_low"])[idx],
                points=np.repeat(pts[:real], M, axis=0)[idx])
            low_res_chunks.append(low_res_kept)
            data.cat(chunk)

        lr_hw = tuple(4 * np.asarray(self.cfg.prompt_encoder.image_embedding_size))
        if low_res_chunks:
            low_res_dev = jnp.concatenate(low_res_chunks, axis=0)
        else:
            low_res_dev = jnp.zeros((0,) + lr_hw, jnp.float32)

        # scale low-res boxes (256 grid) to crop pixel coords for NMS
        scale_x = crop_size[1] / (4 * self.cfg.prompt_encoder.image_embedding_size[1])
        scale_y = crop_size[0] / (4 * self.cfg.prompt_encoder.image_embedding_size[0])
        # account for longest-side resize: low-res frame covers img_size;
        # the crop occupies input_hw within it
        size = self.cfg.vit.img_size
        lr = 4 * self.cfg.prompt_encoder.image_embedding_size[0]
        boxes = data["boxes_low"] * (size / lr)  # -> input frame (1024)
        boxes[:, [0, 2]] *= crop_size[1] / input_hw[1]
        boxes[:, [1, 3]] *= crop_size[0] / input_hw[0]
        data["boxes"] = boxes

        # per-crop NMS
        keep = nms(data["boxes"], data["iou_preds"], self.box_nms_thresh)
        data.filter(keep)
        low_res_dev = jnp.take(low_res_dev, jnp.asarray(keep), axis=0)

        data["boxes"] = uncrop_boxes_xyxy(data["boxes"], crop_box)
        data["points"] = uncrop_points(data["points"], crop_box)
        data["crop_boxes"] = np.asarray([crop_box] * len(data["boxes"]),
                                        np.float32).reshape(-1, 4)
        data["input_hw"] = [tuple(input_hw)] * len(data["boxes"])
        data["crop_size"] = [tuple(crop_size)] * len(data["boxes"])
        return data, low_res_dev

    def _collect(self, image: np.ndarray):
        """Run the sweep over all crops; returns (metadata MaskData,
        low-res logits as one DEVICE array [K, 256, 256])."""
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)

        data = MaskData(iou_preds=np.zeros((0,), np.float32),
                        stability=np.zeros((0,), np.float32),
                        boxes=np.zeros((0, 4), np.float32),
                        boxes_low=np.zeros((0, 4), np.float32),
                        points=np.zeros((0, 2), np.float32),
                        crop_boxes=np.zeros((0, 4), np.float32))
        dev_chunks = []
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            cd, low_dev = self._process_crop(image, crop_box, layer_idx,
                                             orig_size)
            dev_chunks.append(low_dev)
            data.cat(cd)
        lr_hw = tuple(4 * np.asarray(
            self.cfg.prompt_encoder.image_embedding_size))
        low_res = (jnp.concatenate(dev_chunks, axis=0) if dev_chunks
                   else jnp.zeros((0,) + lr_hw, jnp.float32))

        if len(crop_boxes) > 1 and len(data["boxes"]):
            # prefer masks from smaller crops (score by crop area inverse)
            scores = 1.0 / (data["crop_boxes"][:, 2] *
                            data["crop_boxes"][:, 3] + 1.0)
            keep = nms(data["boxes"], scores.astype(np.float32),
                       self.crop_nms_thresh)
            data.filter(keep)
            low_res = jnp.take(low_res, jnp.asarray(keep), axis=0)

        if (self.max_masks is not None
                and len(data["iou_preds"]) > self.max_masks):
            top = np.argsort(-data["iou_preds"])[: self.max_masks]
            data.filter(top)
            low_res = jnp.take(low_res, jnp.asarray(top), axis=0)
        return data, low_res, orig_size

    def _upscale_all(self, data: MaskData, low_res, orig_size,
                     to_host: bool):
        """Upscale survivors batched per unique crop geometry. Returns
        [K, H, W] bool — numpy if to_host else device array."""
        K = low_res.shape[0]
        groups: Dict[tuple, list] = {}
        for i in range(K):
            key = (tuple(data["crop_boxes"][i].astype(int).tolist()),
                   tuple(data["input_hw"][i]), tuple(data["crop_size"][i]))
            groups.setdefault(key, []).append(i)

        single_full = (len(groups) == 1 and next(iter(groups))[0] ==
                       (0, 0, orig_size[1], orig_size[0]))
        if single_full and not to_host:
            (crop_box, input_hw, crop_size), idxs = next(iter(groups.items()))
            return _upscale_threshold(self.cfg, low_res, orig_size[0],
                                      orig_size[1], tuple(input_hw))

        masks_full = np.zeros((K, orig_size[0], orig_size[1]), bool)
        for (crop_box, input_hw, crop_size), idxs in groups.items():
            sel = jnp.take(low_res, jnp.asarray(idxs), axis=0)
            up = np.asarray(_upscale_threshold(
                self.cfg, sel, int(crop_size[0]), int(crop_size[1]),
                tuple(input_hw)))
            up = uncrop_masks(up, list(crop_box), orig_size[0], orig_size[1])
            masks_full[np.asarray(idxs)] = up
        return masks_full if to_host else jnp.asarray(masks_full)

    def generate_dense(self, image: np.ndarray):
        """Device-native output: (masks [K, H, W] bool on device, metadata
        MaskData with iou_preds/stability/boxes/points). No RLE, no host
        mask transfer — the fast path for on-TPU consumers and benchmarks."""
        data, low_res, orig_size = self._collect(image)
        masks = self._upscale_all(data, low_res, orig_size, to_host=False)
        return masks, data

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: [H, W, 3] uint8 -> list of mask records (upstream AMG
        output contract)."""
        data, low_res, orig_size = self._collect(image)
        K = low_res.shape[0]
        masks_full = self._upscale_all(data, low_res, orig_size,
                                       to_host=True)
        masks_full = np.asarray(masks_full)

        if self.min_mask_region_area > 0:
            for i in range(K):
                m, _ = remove_small_regions(masks_full[i],
                                            self.min_mask_region_area,
                                            "holes")
                m, _ = remove_small_regions(m, self.min_mask_region_area,
                                            "islands")
                masks_full[i] = m

        rles = mask_to_rle(masks_full) if K else []
        boxes_full = (np.asarray(batched_mask_to_box(
            jnp.asarray(masks_full))) if K else np.zeros((0, 4)))

        records = []
        for i in range(K):
            crop_box = data["crop_boxes"][i].astype(int).tolist()
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


def bench_amg(points_per_side: int = 32, iters: int = 3,
              variant: str = "vit_b") -> float:
    """masks/sec for a full AMG sweep on one synthetic image."""
    import time

    from ullsam_tpu.models.sam import build_sam

    cfg, params = build_sam(variant)
    rng = np.random.RandomState(0)
    image = (rng.rand(1024, 1024, 3) * 255).astype(np.uint8)
    # thresholds disabled + NMS no-op so the workload is deterministic
    # under random weights: full 1024-point sweep, 256 masks upscaled+RLE'd
    gen = AutomaticMaskGenerator(
        cfg, params, points_per_side=points_per_side,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        box_nms_thresh=1.0, max_masks=256)
    # device-native path: masks are materialized in HBM; only per-mask
    # pixel counts cross the host link (the axon tunnel makes bulk
    # host transfers dominate otherwise)
    masks, _ = gen.generate_dense(image)  # warmup + compile
    np.asarray(jnp.sum(masks, axis=(1, 2)))
    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        masks, _ = gen.generate_dense(image)
        counts = np.asarray(jnp.sum(masks, axis=(1, 2)))
        total += int(masks.shape[0])
    dt = time.perf_counter() - t0
    return total / dt
