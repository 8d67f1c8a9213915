"""Exported prompt decoder: SamOnnxModel parity + StableHLO round-trip.

Behavioral reference: /root/reference/utils/onnx.py:17-144. The onnx_model
golden holds reference SamOnnxModel outputs on the sam_micro weights for
every flag combination (mask-input lerp, best-mask selection, stability
scores, orig-size postprocess).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig, ViTConfig


def _micro_cfg():
    from tests.test_sam_parity import PE_TINY, MD_TINY
    return SamConfig(
        vit=ViTConfig(img_size=64, patch_size=8, embed_dim=32, depth=2,
                      num_heads=2, mlp_ratio=2.0, out_chans=32,
                      window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PE_TINY,
        mask_decoder=MD_TINY,
    )


def _nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_onnx_model_parity(goldens):
    from ullsam_tpu.convert import torch_sam as C
    from ullsam_tpu.inference.export import make_onnx_decoder_fn

    g = goldens("onnx_model")
    cfg = _micro_cfg()
    params = C.convert_sam_state_dict(g, cfg)

    emb = jnp.asarray(_nchw(g["embedding"]))
    mask_in = jnp.asarray(_nchw(g["mask_input"]))
    coords = {3: jnp.asarray(g["coords3"]), 2: jnp.asarray(g["coords2"])}
    labels = {3: jnp.asarray(g["labels3"], jnp.int32),
              2: jnp.asarray(g["labels2"], jnp.int32)}
    orig = tuple(int(v) for v in g["orig_im_size"])

    cases = [  # (tag, single, stab, extra, has_mask, n_points)
        ("multi_nomask", False, False, False, 0.0, 3),
        ("multi_mask", False, False, False, 1.0, 3),
        ("single_np3", True, False, False, 0.0, 3),
        ("single_np2", True, False, False, 1.0, 2),
        ("stab_extra", False, True, True, 1.0, 3),
    ]
    for tag, single, stab, extra, hm, n in cases:
        fn = make_onnx_decoder_fn(cfg, return_single_mask=single,
                                  use_stability_score=stab,
                                  return_extra_metrics=extra,
                                  orig_im_size=orig)
        res = fn(params, emb, coords[n], labels[n], mask_in,
                 jnp.asarray([hm], jnp.float32))
        if extra:
            up, sc, st, areas, low = res
            np.testing.assert_allclose(np.asarray(st), g[tag + "_stability"],
                                       atol=2e-3, err_msg=tag + " stability")
            assert np.abs(np.asarray(areas) - g[tag + "_areas"]).max() <= 3, tag
        else:
            up, sc, low = res
        np.testing.assert_allclose(np.asarray(up), g[tag + "_upscaled"],
                                   atol=2e-3, rtol=1e-3,
                                   err_msg=tag + " upscaled")
        np.testing.assert_allclose(np.asarray(sc), g[tag + "_scores"],
                                   atol=1e-3, err_msg=tag + " scores")
        np.testing.assert_allclose(np.asarray(low), g[tag + "_lowres"],
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=tag + " lowres")


def test_export_decoder_roundtrip():
    from tests.test_amg import TINY_SAM
    from ullsam_tpu.inference.export import (export_decoder,
                                             load_exported_decoder)
    from ullsam_tpu.models.sam import sam as S

    params = S.sam_init(jax.random.PRNGKey(0), TINY_SAM)
    blob = export_decoder(params, TINY_SAM, num_points=2, batch=1)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_exported_decoder(bytes(blob))
    emb = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16), jnp.float32)
    coords = jnp.asarray([[[10.0, 20.0], [40.0, 50.0]]], jnp.float32)
    labels = jnp.asarray([[1, 0]], jnp.int32)
    masks, iou = fn(emb, coords, labels)
    ref_masks, ref_iou = S.decode_masks(params, TINY_SAM, emb,
                                        points=(coords, labels),
                                        multimask_output=True)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref_iou),
                               atol=1e-5)


def test_export_full_decoder_roundtrip():
    """full=True artifact reproduces make_onnx_decoder_fn end-to-end."""
    from tests.test_amg import TINY_SAM
    from ullsam_tpu.inference.export import (export_decoder,
                                             load_exported_decoder,
                                             make_onnx_decoder_fn)
    from ullsam_tpu.models.sam import sam as S

    params = S.sam_init(jax.random.PRNGKey(1), TINY_SAM)
    orig = (30, 50)
    blob = export_decoder(params, TINY_SAM, num_points=3, batch=2, full=True,
                          return_single_mask=True, orig_im_size=orig)
    fn = load_exported_decoder(bytes(blob))

    rs = np.random.RandomState(1)
    emb = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)
    coords = jnp.asarray(rs.rand(2, 3, 2) * 32, jnp.float32)
    labels = jnp.asarray([[1, 0, -1], [1, 1, -1]], jnp.int32)
    mask_in = jnp.asarray(rs.randn(2, 32, 32, 1), jnp.float32)
    hm = jnp.asarray([1.0, 0.0], jnp.float32)

    up, sc, low = fn(emb, coords, labels, mask_in, hm)
    ref_fn = make_onnx_decoder_fn(TINY_SAM, return_single_mask=True,
                                  orig_im_size=orig)
    rup, rsc, rlow = ref_fn(params, emb, coords, labels, mask_in, hm)
    assert up.shape == (2, 1) + orig
    np.testing.assert_allclose(np.asarray(up), np.asarray(rup), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(rsc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(low), np.asarray(rlow), atol=1e-5)


def test_export_dynamic_size_one_artifact_two_sizes():
    """ONE dynamic_size artifact serves multiple original sizes at runtime
    (reference runtime orig_im_size tensor, onnx.py:76-90; round-2 verdict
    item 8) and matches the per-size static artifacts exactly."""
    from tests.test_amg import TINY_SAM
    from ullsam_tpu.inference.export import (export_decoder,
                                             load_exported_decoder,
                                             make_onnx_decoder_fn)
    from ullsam_tpu.models.sam import sam as S

    params = S.sam_init(jax.random.PRNGKey(2), TINY_SAM)
    blob = export_decoder(params, TINY_SAM, num_points=3, batch=2, full=True,
                          return_single_mask=True, dynamic_size=True)
    fn = load_exported_decoder(bytes(blob))

    rs = np.random.RandomState(2)
    emb = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)
    coords = jnp.asarray(rs.rand(2, 3, 2) * 32, jnp.float32)
    labels = jnp.asarray([[1, 0, -1], [1, 1, -1]], jnp.int32)
    mask_in = jnp.asarray(rs.randn(2, 32, 32, 1), jnp.float32)
    hm = jnp.asarray([1.0, 0.0], jnp.float32)

    for orig in [(30, 50), (48, 25)]:
        witness = jnp.zeros(orig, jnp.float32)
        up, sc, low = fn(emb, coords, labels, mask_in, hm, witness)
        assert up.shape == (2, 1) + orig
        ref_fn = make_onnx_decoder_fn(TINY_SAM, return_single_mask=True,
                                      orig_im_size=orig)
        rup, rsc, rlow = ref_fn(params, emb, coords, labels, mask_in, hm)
        np.testing.assert_allclose(np.asarray(up), np.asarray(rup),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(sc), np.asarray(rsc), atol=1e-5)
        np.testing.assert_allclose(np.asarray(low), np.asarray(rlow),
                                   atol=1e-5)
