"""Debug utilities + distributed helpers + streaming engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_find_nonfinite_and_assert():
    from ullsam_tpu.utils.debug import assert_finite, find_nonfinite

    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros((2, 2))}}
    assert find_nonfinite(good) == []
    bad = {"a": jnp.asarray([1.0, np.nan]), "b": jnp.asarray([np.inf])}
    paths = find_nonfinite(bad)
    assert set(paths) == {"a", "b"}
    with pytest.raises(FloatingPointError):
        assert_finite(bad)


def test_check_finite_jit():
    from ullsam_tpu.utils.debug import check_finite_jit

    ok = jax.jit(check_finite_jit)({"x": jnp.ones(4)})
    assert bool(ok)
    notok = jax.jit(check_finite_jit)({"x": jnp.asarray([1.0, np.nan])})
    assert not bool(notok)


def test_tree_summary_and_diff():
    from ullsam_tpu.utils.debug import tree_diff, tree_summary

    a = {"w": jnp.ones((2, 3))}
    b = {"w": jnp.ones((2, 3)) * 1.5}
    s = tree_summary(a)
    assert "w" in s and "(2, 3)" in s
    d = tree_diff(a, b)
    assert abs(d["w"] - 0.5) < 1e-6


def test_distributed_single_process():
    from ullsam_tpu.parallel.distributed import (initialize,
                                                 is_main_process,
                                                 local_device_count)

    initialize()  # no-op single process
    assert is_main_process()
    assert local_device_count() >= 1


def test_engine_streaming_matches_blocking():
    import os

    if not os.path.exists("/root/reference/modeling/tokenizer/tokenizer.model"):
        pytest.skip("tokenizer asset not available")
    from tests.test_engine import _tiny_setup
    from ullsam_tpu.models.internlm2.generate import GenerationConfig
    from ullsam_tpu.serve.engine import GenerationEngine

    cfg, params, tk = _tiny_setup()
    eng = GenerationEngine(params, cfg, tk, max_batch=2, max_len=512,
                           gen=GenerationConfig(max_new_tokens=5),
                           cache_dtype=jnp.float32)
    try:
        deltas = list(eng.stream_caption(None, "Hi?", max_new_tokens=5))
        full = eng.caption(None, "Hi?", max_new_tokens=5)
        assert "".join(deltas).strip() == full
    finally:
        eng.shutdown()


def test_resize_longest_side_batched_variants():
    """apply_image_batch / apply_coords_device / apply_boxes_device match the
    reference's torch variants (utils/transforms.py:55-91)."""
    import torch
    import torch.nn.functional as F

    from ullsam_tpu.inference.transforms import ResizeLongestSide

    t = ResizeLongestSide(32)
    rs = np.random.RandomState(0)
    imgs = rs.rand(2, 48, 20, 3).astype(np.float32)

    out = np.asarray(t.apply_image_batch(jnp.asarray(imgs)))
    ref = F.interpolate(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                        (32, 13), mode="bilinear", align_corners=False,
                        antialias=True).permute(0, 2, 3, 1).numpy()
    assert out.shape == (2, 32, 13, 3)
    np.testing.assert_allclose(out, ref, atol=2e-2)

    coords = rs.rand(3, 5, 2) * [20, 48]
    got = np.asarray(t.apply_coords_device(jnp.asarray(coords), (48, 20)))
    want = t.apply_coords(coords, (48, 20))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    boxes = np.asarray([[1.0, 2.0, 10.0, 40.0]])
    gotb = np.asarray(t.apply_boxes_device(jnp.asarray(boxes), (48, 20)))
    np.testing.assert_allclose(gotb, t.apply_boxes(boxes, (48, 20)),
                               rtol=1e-6)
