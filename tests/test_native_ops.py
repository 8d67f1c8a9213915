"""Native C++ host ops vs pure-python implementations."""

import numpy as np
import pytest

from ullsam_tpu.native import host_ops


@pytest.fixture(scope="module")
def lib_ok():
    if not host_ops.available():
        pytest.skip("native host_ops unavailable (g++ build failed)")


def _random_masks(n=5, h=37, w=53, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(n, h, w) > 0.6
    base[2] = False  # empty mask
    return base


def test_rle_matches_numpy(lib_ok):
    from ullsam_tpu.inference import amg

    masks = _random_masks()
    native = host_ops.mask_to_rle(masks)
    # force the numpy path for comparison
    B, H, W = masks.shape
    flat = masks.transpose(0, 2, 1).reshape(B, -1)
    for b in range(B):
        row = flat[b]
        change = np.flatnonzero(row[1:] != row[:-1]) + 1
        idx = np.concatenate([[0], change, [H * W]])
        counts = np.diff(idx).tolist()
        if row[0]:
            counts = [0] + counts
        assert native[b]["counts"] == counts, f"mask {b}"
        # decode roundtrip via native
        np.testing.assert_array_equal(host_ops.rle_to_mask(native[b]),
                                      masks[b])


def test_connected_components(lib_ok):
    mask = np.zeros((20, 30), np.uint8)
    mask[2:6, 2:6] = 1            # comp 1
    mask[10:14, 10:14] = 1        # comp 2
    mask[6, 6] = 1                # diagonal touch to comp1 (8-conn merges)
    labels, n = host_ops.connected_components(mask)
    assert n == 2
    assert labels[3, 3] == labels[6, 6]  # 8-connectivity
    assert labels[11, 11] != labels[3, 3]
    assert labels[0, 0] == 0

    from scipy import ndimage
    ref_labels, ref_n = ndimage.label(mask, structure=np.ones((3, 3)))
    assert ref_n == n


def test_mask_iou_matrix(lib_ok):
    a = _random_masks(3, 16, 16, seed=1)
    b = _random_masks(4, 16, 16, seed=2)
    iou = host_ops.mask_iou_matrix(a, b)
    af = a.reshape(3, -1).astype(np.float64)
    bf = b.reshape(4, -1).astype(np.float64)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    ref = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    np.testing.assert_allclose(iou, ref, atol=1e-6)


def test_amg_uses_native_rle():
    """mask_to_rle in amg should transparently use the native codec."""
    from ullsam_tpu.inference.amg import mask_to_rle, rle_to_mask

    masks = _random_masks()
    rles = mask_to_rle(masks)
    for b in range(len(masks)):
        np.testing.assert_array_equal(rle_to_mask(rles[b]), masks[b])
