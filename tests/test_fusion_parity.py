"""Full uLLSAM chain parity: fused forward (logits, CE loss, dense prompt)
and the LLM-guided segmentation path (BASELINE config #4)."""

import numpy as np
import jax.numpy as jnp

from ullsam_tpu.core.config import (FusionConfig, InternLM2Config,
                                    MaskDecoderConfig, PromptEncoderConfig,
                                    SamConfig, ViTConfig)
from ullsam_tpu.convert.torch_sam import (convert_image_encoder,
                                          convert_mask_decoder,
                                          convert_prompt_encoder)
from ullsam_tpu.convert.torch_internlm2 import convert_internlm2_state_dict
from ullsam_tpu.convert.torch_fusion import _convert_proj_mlp
from ullsam_tpu.models.ullsam import fusion as F

VIT = ViTConfig(img_size=1024, patch_size=16, embed_dim=32, depth=1,
                num_heads=2, mlp_ratio=1.0, out_chans=256, window_size=2,
                global_attn_indexes=())
LLM = InternLM2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=2048,
                      bias=False, rope_theta=10000.0,
                      pad_token_id=0, bos_token_id=1, eos_token_id=2)
CFG = FusionConfig(
    sam=SamConfig(
        vit=VIT,
        prompt_encoder=PromptEncoderConfig(),
        mask_decoder=MaskDecoderConfig(transformer_mlp_dim=128,
                                       transformer_num_heads=4,
                                       iou_head_hidden_dim=32)),
    llm=LLM, img_context_token_id=100)


def _pixel_values():
    import torch
    torch.manual_seed(8)
    pv = torch.rand(1, 3, 1024, 1024).numpy()  # regenerated, not stored
    return pv.transpose(0, 2, 3, 1)  # NHWC


def _params(g):
    sam = {
        "image_encoder": convert_image_encoder(g, VIT, "fusion.vision_model."),
        "prompt_encoder": convert_prompt_encoder(
            g, CFG.sam.prompt_encoder, "prompt_encoder."),
        "mask_decoder": convert_mask_decoder(
            g, CFG.sam.mask_decoder, "mask_decoder."),
    }
    return {
        "sam": sam,
        "llm": convert_internlm2_state_dict(
            g, LLM, prefix="fusion.language_model."),
        "mlp1": _convert_proj_mlp(g, "fusion.mlp1"),
        "mlp2": _convert_proj_mlp(g, "fusion.mlp2"),
    }


def test_fusion_forward_and_segmentation(goldens):
    g = goldens("fusion_tiny")
    g = {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
         for k, v in g.items()}
    params = _params(g)
    pixel_values = jnp.asarray(_pixel_values())
    input_ids = jnp.asarray(g["input_ids"])

    out = F.fusion_forward(params, CFG, pixel_values, input_ids,
                           labels=jnp.asarray(g["labels"]),
                           output_dense_prompt=True)

    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits"],
                               atol=5e-3, rtol=5e-3, err_msg="logits")
    np.testing.assert_allclose(float(out["loss"]), float(g["loss"]),
                               atol=2e-3, err_msg="CE loss")
    # dense prompt (reference NCHW fp16)
    dense_ref = g["dense"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out["dense_prompt"]), dense_ref,
                               atol=5e-3, rtol=5e-3, err_msg="dense prompt")
    feats_ref = g["sam_feats"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out["image_embeddings"]), feats_ref,
                               atol=5e-3, rtol=5e-3, err_msg="sam features")

    # segmentation with LLM-conditioned dense prompt (app.py:617-644 path)
    masks, iou = F.segment_with_prompts(
        params, CFG,
        sam_features=jnp.asarray(feats_ref),
        dense_prompt=jnp.asarray(dense_ref),
        point_coords=jnp.asarray(g["coords"]),
        point_labels=jnp.asarray(g["pt_labels"]),
        multimask_output=False)
    np.testing.assert_allclose(np.asarray(masks), g["seg_masks"],
                               atol=2e-2, rtol=2e-2, err_msg="seg masks")
    np.testing.assert_allclose(np.asarray(iou), g["seg_iou"], atol=5e-3,
                               err_msg="seg iou")


def test_scatter_overflow_wraparound():
    """More context tokens than visual tokens -> wraparound repeat
    (modeling_internvl_sam.py:143-145 fallback)."""
    ids = jnp.asarray([[7, 100, 100, 100, 100, 100, 9]])
    embeds = jnp.zeros((1, 7, 4))
    vit = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4)
    out = F.scatter_image_embeds(ids, embeds, vit, 100)
    got = np.asarray(out[0])
    np.testing.assert_array_equal(got[1], vit[0, 0])
    np.testing.assert_array_equal(got[3], vit[0, 2])
    np.testing.assert_array_equal(got[4], vit[0, 0])  # wrapped
    np.testing.assert_array_equal(got[0], 0.0)


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16),
                    jnp.float32)
    y = F.pixel_shuffle(x, 0.5, "v2")
    assert y.shape == (2, 4, 4, 64)
    rt = F.pixel_unshuffle(y, 0.5, "v2")
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x))
