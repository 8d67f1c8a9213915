"""Numeric parity vs golden outputs captured from the torch reference.

Fixtures are tiny-config random-weight modules (tools/make_goldens.py);
tests run the torch->jax converter and compare outputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ullsam_tpu.core.config import (MaskDecoderConfig, PromptEncoderConfig,
                                    SamConfig, ViTConfig)
from ullsam_tpu.convert import torch_sam as C
from ullsam_tpu.models.sam import image_encoder as IE
from ullsam_tpu.models.sam import prompt_encoder as PE
from ullsam_tpu.models.sam import mask_decoder as MD
from ullsam_tpu.models.sam import sam as S
from ullsam_tpu.ops import attention as A

VIT_TINY = ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=3,
                     num_heads=2, mlp_ratio=2.0, out_chans=16,
                     window_size=2, global_attn_indexes=(1,))
PE_TINY = PromptEncoderConfig(embed_dim=32, image_embedding_size=(8, 8),
                              input_image_size=(64, 64), mask_in_chans=8)
MD_TINY = MaskDecoderConfig(transformer_dim=32, transformer_mlp_dim=64,
                            transformer_num_heads=2, iou_head_hidden_dim=16)


def nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


def assert_close(actual, expected, atol=2e-4, rtol=2e-4, name=""):
    actual = np.asarray(actual)
    np.testing.assert_allclose(actual, expected, atol=atol, rtol=rtol,
                               err_msg=name)


def test_rel_pos_interp(goldens):
    g = goldens("rel_pos_interp")
    out44 = A.get_rel_pos(4, 4, jnp.asarray(g["rel_pos"]))
    assert_close(out44, g["out_44"], name="rel_pos 4x4 interp")
    out48 = A.get_rel_pos(4, 8, jnp.asarray(g["rel_pos"]))
    assert_close(out48, g["out_48"], name="rel_pos 4x8 scaled")


def test_vit_tiny_parity(goldens):
    g = goldens("vit_tiny")
    params = C.convert_image_encoder(g, VIT_TINY)
    x = jnp.asarray(nchw(g["x"]))
    y = IE.image_encoder_apply(params, x, VIT_TINY)
    assert y.shape == (2, 4, 4, 16)
    assert_close(y, nchw(g["y"]), name="vit output")


def test_prompt_encoder_parity(goldens):
    g = goldens("prompt_encoder_tiny")
    params = C.convert_prompt_encoder(g, PE_TINY)
    coords = jnp.asarray(g["coords"])
    labels = jnp.asarray(g["labels"])

    sp, dn = PE.prompt_encoder_apply(params, PE_TINY, points=(coords, labels))
    assert_close(sp, g["sparse_points"], name="sparse points")
    assert_close(dn, nchw(g["dense_points"]), name="dense no-mask")

    sp, dn = PE.prompt_encoder_apply(params, PE_TINY, points=(coords, labels),
                                     boxes=jnp.asarray(g["boxes"]))
    assert_close(sp, g["sparse_pb"], name="sparse points+boxes")

    sp, dn = PE.prompt_encoder_apply(params, PE_TINY,
                                     masks=jnp.asarray(nchw(g["masks"])))
    assert sp.shape == (2, 0, 32)
    assert_close(dn, nchw(g["dense_mask"]), name="dense mask")

    sp, dn = PE.prompt_encoder_apply(params, PE_TINY, points=(coords, labels),
                                     llm_hidden=jnp.asarray(nchw(g["llm_hidden"])))
    assert_close(dn, nchw(g["dense_llm"]), name="dense llm hidden")

    pe = PE.get_dense_pe(params, PE_TINY)
    assert_close(pe, np.transpose(g["dense_pe"], (0, 2, 3, 1)), name="dense pe")


def test_mask_decoder_parity(goldens):
    g = goldens("mask_decoder_tiny")
    params = C.convert_mask_decoder(g, MD_TINY)
    img = jnp.asarray(nchw(g["img"]))
    pe = jnp.asarray(nchw(g["pe"]))
    sparse = jnp.asarray(g["sparse"])
    dense = jnp.asarray(nchw(g["dense"]))

    masks, iou = MD.mask_decoder_apply(params, MD_TINY, img, pe, sparse,
                                       dense, multimask_output=True)
    assert masks.shape == (2, 3, 32, 32)
    assert_close(masks, g["masks_multi"], atol=5e-4, name="masks multi")
    assert_close(iou, g["iou_multi"], name="iou multi")

    masks, iou = MD.mask_decoder_apply(params, MD_TINY, img, pe, sparse,
                                       dense, multimask_output=False)
    assert_close(masks, g["masks_single"], atol=5e-4, name="masks single")
    assert_close(iou, g["iou_single"], name="iou single")


def test_sam_micro_end_to_end(goldens):
    g = goldens("sam_micro")
    cfg = SamConfig(
        vit=ViTConfig(img_size=64, patch_size=8, embed_dim=32, depth=2,
                      num_heads=2, mlp_ratio=2.0, out_chans=32,
                      window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PE_TINY,
        mask_decoder=MD_TINY,
    )
    params = C.convert_sam_state_dict(g, cfg)

    image = jnp.asarray(g["image"].transpose(1, 2, 0))[None]  # [1,64,64,3]
    x = S.preprocess(image, cfg)
    emb = S.encode_image(params, cfg, x)
    low_res, iou = S.decode_masks(
        params, cfg, emb,
        points=(jnp.asarray(g["coords"]), jnp.asarray(g["labels"])),
        multimask_output=True)
    assert_close(low_res, g["low_res_logits"], atol=1e-3, rtol=1e-3,
                 name="low res logits")
    assert_close(iou, g["iou_predictions"], atol=1e-3, name="iou")

    final = S.postprocess_masks(low_res, (64, 64), (48, 60), cfg)
    binary = np.asarray(final > cfg.mask_threshold)
    mismatch = (binary != g["masks"].astype(bool)).mean()
    assert mismatch < 0.01, f"binary mask mismatch fraction {mismatch}"


def test_persistent_window_partition_equivalence():
    """The run-persistent window layout must match per-block
    partition/unpartition exactly, including the pad-masking path
    (window 3 on a 5x5 grid -> pad to 6)."""
    import jax
    from ullsam_tpu.models.sam.image_encoder import (_block_apply,
                                                     image_encoder_apply,
                                                     image_encoder_init)
    from ullsam_tpu.ops import layers as L

    cfg = ViTConfig(img_size=40, patch_size=8, embed_dim=32, depth=4,
                    num_heads=2, mlp_ratio=2.0, out_chans=16,
                    window_size=3, global_attn_indexes=(2,))
    params = image_encoder_init(jax.random.PRNGKey(3), cfg)
    # randomize zero-init rel pos to exercise the bias
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * np.arange(x.size).reshape(x.shape) % 7
        if x.size and (x == 0).all() else x, params)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 40, 40, 3), jnp.float32)

    fast = image_encoder_apply(params, x, cfg)

    # reference loop: per-block partition/unpartition
    y = L.conv2d(params["patch_embed"], x, stride=(8, 8))
    y = y + params["pos_embed"].astype(y.dtype)
    for i, blk in enumerate(params["blocks"]):
        ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
        y = _block_apply(blk, y, cfg, ws)
    n = params["neck"]
    y = L.conv2d(n["conv1"], y)
    y = L.layer_norm(n["ln1"], y, eps=1e-6)
    y = L.conv2d(n["conv2"], y, padding="SAME")
    y = L.layer_norm(n["ln2"], y, eps=1e-6)

    np.testing.assert_allclose(np.asarray(fast), np.asarray(y),
                               atol=1e-5, rtol=1e-5)
