"""ctypes bindings for the native host ops (RLE, connected components).

Falls back gracefully: callers check available() and use the pure-numpy
paths otherwise (inference/amg.py).
"""

from __future__ import annotations

import ctypes
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from ullsam_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.rle_encode_masks.restype = ctypes.c_int64
        lib.rle_encode_masks.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_void_p]
        lib.connected_components.restype = ctypes.c_int32
        lib.connected_components.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.mask_iou_matrix.restype = None
        lib.mask_iou_matrix.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def mask_to_rle(masks: np.ndarray) -> List[Dict[str, Any]]:
    """[B, H, W] bool/uint8 -> list of uncompressed COCO RLEs."""
    lib = _load()
    B, H, W = masks.shape
    m = np.ascontiguousarray(masks, np.uint8)
    cap = int(B * (H * W + 2))
    counts = np.empty(cap, np.int32)
    lengths = np.empty(B, np.int64)
    total = lib.rle_encode_masks(
        m.ctypes.data_as(ctypes.c_void_p), B, H, W,
        counts.ctypes.data_as(ctypes.c_void_p), cap,
        lengths.ctypes.data_as(ctypes.c_void_p))
    if total < 0:
        raise RuntimeError("RLE buffer overflow")
    out, off = [], 0
    for b in range(B):
        n = int(lengths[b])
        out.append({"size": [H, W], "counts": counts[off:off + n].tolist()})
        off += n
    return out


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    lib = _load()
    h, w = rle["size"]
    counts = np.ascontiguousarray(rle["counts"], np.int32)
    out = np.empty((h, w), np.uint8)
    lib.rle_decode(counts.ctypes.data_as(ctypes.c_void_p), len(counts),
                   h, w, out.ctypes.data_as(ctypes.c_void_p))
    return out.astype(bool)


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """8-connected labeling; returns (labels int32 [H, W], n_components)."""
    lib = _load()
    m = np.ascontiguousarray(mask, np.uint8)
    H, W = m.shape
    labels = np.empty((H, W), np.int32)
    n = lib.connected_components(m.ctypes.data_as(ctypes.c_void_p), H, W,
                                 labels.ctypes.data_as(ctypes.c_void_p))
    return labels, int(n)


def mask_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU between [N, H, W] and [M, H, W] bool stacks."""
    lib = _load()
    N, H, W = a.shape
    M = b.shape[0]
    au = np.ascontiguousarray(a.reshape(N, -1), np.uint8)
    bu = np.ascontiguousarray(b.reshape(M, -1), np.uint8)
    out = np.empty((N, M), np.float32)
    lib.mask_iou_matrix(au.ctypes.data_as(ctypes.c_void_p), N,
                        bu.ctypes.data_as(ctypes.c_void_p), M, H * W,
                        out.ctypes.data_as(ctypes.c_void_p))
    return out
