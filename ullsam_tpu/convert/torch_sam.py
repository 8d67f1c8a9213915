"""One-way converter: torch SAM/uLLSAM state dicts -> ullsam_tpu param trees.

Handles the reference's checkpoint layouts:
  * SAM .pth registry checkpoints with image_encoder./prompt_encoder./
    mask_decoder. prefixes (build_sam.py:103-107)
  * uLLSAM .pt training checkpoints where the vision tower key prefix is
    vision_model. (train_joint_v2.py:1466-1556)

Layout transforms applied once at load:
  * torch Linear [out, in]       -> kernel [in, out]
  * torch Conv2d [O, I, kh, kw]  -> kernel [kh, kw, I, O] (HWIO)
  * torch ConvTranspose2d [I, O, kh, kw] -> kernel [kh, kw, I, O]
  * NCHW buffers (pos_embed is already [1, H, W, C] in the reference)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ullsam_tpu.core.config import (MaskDecoderConfig, PromptEncoderConfig,
                                    SamConfig, ViTConfig)

ArrayDict = Mapping[str, np.ndarray]


def _lin(sd: ArrayDict, name: str) -> dict:
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv(sd: ArrayDict, name: str) -> dict:
    p = {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _convt(sd: ArrayDict, name: str) -> dict:
    p = {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 0, 1))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _ln(sd: ArrayDict, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def convert_image_encoder(sd: ArrayDict, cfg: ViTConfig,
                          prefix: str = "image_encoder.") -> dict:
    p = prefix
    blocks = []
    for i in range(cfg.depth):
        b = f"{p}blocks.{i}."
        attn = {
            "qkv": _lin(sd, f"{b}attn.qkv"),
            "proj": _lin(sd, f"{b}attn.proj"),
        }
        if cfg.use_rel_pos:
            attn["rel_pos_h"] = sd[f"{b}attn.rel_pos_h"]
            attn["rel_pos_w"] = sd[f"{b}attn.rel_pos_w"]
        blocks.append({
            "norm1": _ln(sd, f"{b}norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{b}norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}mlp.lin1"),
                    "fc2": _lin(sd, f"{b}mlp.lin2")},
        })
    out = {
        "patch_embed": _conv(sd, f"{p}patch_embed.proj"),
        "blocks": blocks,
        "neck": {
            "conv1": _conv(sd, f"{p}neck.0"),
            "ln1": _ln(sd, f"{p}neck.1"),
            "conv2": _conv(sd, f"{p}neck.2"),
            "ln2": _ln(sd, f"{p}neck.3"),
        },
    }
    if cfg.use_abs_pos:
        out["pos_embed"] = sd[f"{p}pos_embed"]
    return out


def convert_prompt_encoder(sd: ArrayDict, cfg: PromptEncoderConfig,
                           prefix: str = "prompt_encoder.") -> dict:
    p = prefix
    out = {
        "pe_gaussian": sd[f"{p}pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeds": np.concatenate(
            [sd[f"{p}point_embeddings.{i}.weight"] for i in range(4)], axis=0),
        "not_a_point": sd[f"{p}not_a_point_embed.weight"][0],
        "no_mask": sd[f"{p}no_mask_embed.weight"][0],
        "mask_downscaling": {
            "conv1": _conv(sd, f"{p}mask_downscaling.0"),
            "ln1": _ln(sd, f"{p}mask_downscaling.1"),
            "conv2": _conv(sd, f"{p}mask_downscaling.3"),
            "ln2": _ln(sd, f"{p}mask_downscaling.4"),
            "conv3": _conv(sd, f"{p}mask_downscaling.6"),
        },
    }
    # uLLSAM extension params; absent from vanilla SAM checkpoints
    out["llm_scale"] = sd.get(f"{p}llm_scale_factor", np.full((1,), 0.1, np.float32))
    out["llm_bias"] = sd.get(f"{p}llm_bias", np.zeros((1,), np.float32))
    return out


def convert_mask_decoder(sd: ArrayDict, cfg: MaskDecoderConfig,
                         prefix: str = "mask_decoder.") -> dict:
    p = prefix

    def attn(name: str) -> dict:
        return {"q": _lin(sd, f"{name}.q_proj"),
                "k": _lin(sd, f"{name}.k_proj"),
                "v": _lin(sd, f"{name}.v_proj"),
                "out": _lin(sd, f"{name}.out_proj")}

    layers = []
    for i in range(cfg.transformer_depth):
        t = f"{p}transformer.layers.{i}"
        layers.append({
            "self_attn": attn(f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "cross_attn_t2i": attn(f"{t}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{t}.mlp.lin1"),
                    "fc2": _lin(sd, f"{t}.mlp.lin2")},
            "norm3": _ln(sd, f"{t}.norm3"),
            "norm4": _ln(sd, f"{t}.norm4"),
            "cross_attn_i2t": attn(f"{t}.cross_attn_image_to_token"),
        })

    nm = cfg.num_mask_tokens

    def mlp_stack(name: str, n_layers: int) -> dict:
        return {"layers": [_lin(sd, f"{name}.layers.{j}")
                           for j in range(n_layers)]}

    return {
        "iou_token": sd[f"{p}iou_token.weight"],
        "mask_tokens": sd[f"{p}mask_tokens.weight"],
        "transformer": {
            "layers": layers,
            "final_attn_t2i": attn(f"{p}transformer.final_attn_token_to_image"),
            "norm_final": _ln(sd, f"{p}transformer.norm_final_attn"),
        },
        "upscale": {
            "convt1": _convt(sd, f"{p}output_upscaling.0"),
            "ln": _ln(sd, f"{p}output_upscaling.1"),
            "convt2": _convt(sd, f"{p}output_upscaling.3"),
        },
        "hyper_mlps": [mlp_stack(f"{p}output_hypernetworks_mlps.{i}", 3)
                       for i in range(nm)],
        "iou_head": mlp_stack(f"{p}iou_prediction_head", cfg.iou_head_depth),
    }


def convert_sam_state_dict(sd: ArrayDict, cfg: SamConfig,
                           vision_prefix: str = "image_encoder.") -> dict:
    """Full SAM state dict -> param tree."""
    return {
        "image_encoder": convert_image_encoder(sd, cfg.vit, vision_prefix),
        "prompt_encoder": convert_prompt_encoder(sd, cfg.prompt_encoder),
        "mask_decoder": convert_mask_decoder(sd, cfg.mask_decoder),
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt file into numpy without requiring CUDA."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]  # uLLSAM train checkpoints wrap the state dict
    return {k: v.detach().float().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def load_sam_checkpoint(path: str, cfg: SamConfig, init_params: dict) -> dict:
    """Load a SAM .pth checkpoint, falling back to init for missing keys
    (the reference loads strict=False, build_sam.py:106)."""
    sd = load_torch_state_dict(path)
    prefix = ("image_encoder." if any(k.startswith("image_encoder.") for k in sd)
              else "vision_model.")
    import jax.numpy as jnp
    converted = convert_sam_state_dict(sd, cfg, vision_prefix=prefix)
    import jax
    return jax.tree_util.tree_map(lambda i, c: jnp.asarray(c, dtype=i.dtype)
                                  if c is not None else i,
                                  init_params, converted)
