"""Typed, immutable model configurations.

Replaces the reference's mutable HF PretrainedConfig trio
(configuration_internvl_chat.py, configuration_intern_vit.py,
configuration_internlm2.py) and its on-disk config.json mutation
(train_joint_v2.py:1390-1410) with frozen dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """SAM ViTDet image encoder config (reference: build_sam.py:55-80)."""

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    ln_eps: float = 1e-6

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class PromptEncoderConfig:
    """SAM prompt encoder config (reference: modeling/prompt_encoder.py:16-63)."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    ln_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    """SAM mask decoder + TwoWayTransformer config
    (reference: modeling/mask_decoder.py:16-69, transformer.py:16-60)."""

    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    ln_eps: float = 1e-5  # torch nn.LayerNorm default used by the reference

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


@dataclasses.dataclass(frozen=True)
class SamConfig:
    """Composed SAM config (reference: build_sam.py:55-101)."""

    vit: ViTConfig = ViTConfig()
    prompt_encoder: PromptEncoderConfig = PromptEncoderConfig()
    mask_decoder: MaskDecoderConfig = MaskDecoderConfig()
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    mask_threshold: float = 0.0


def sam_vit_b() -> SamConfig:
    return SamConfig(
        vit=ViTConfig(embed_dim=768, depth=12, num_heads=12,
                      global_attn_indexes=(2, 5, 8, 11))
    )


def sam_vit_l() -> SamConfig:
    return SamConfig(
        vit=ViTConfig(embed_dim=1024, depth=24, num_heads=16,
                      global_attn_indexes=(5, 11, 17, 23))
    )


def sam_vit_h() -> SamConfig:
    return SamConfig(
        vit=ViTConfig(embed_dim=1280, depth=32, num_heads=16,
                      global_attn_indexes=(7, 15, 23, 31))
    )


SAM_REGISTRY = {
    "vit_b": sam_vit_b,
    "vit_l": sam_vit_l,
    "vit_h": sam_vit_h,
    "default": sam_vit_h,
}


@dataclasses.dataclass(frozen=True)
class InternLM2Config:
    """InternLM2 decoder config (reference: configuration_internlm2.py:77-150).

    Defaults are the InternVL2.5-2B deployment (1.8B LLM): hidden 2048,
    24 layers, GQA 16 heads / 8 kv heads, vocab 92553.
    """

    vocab_size: int = 92553
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    max_position_embeddings: int = 32768
    bias: bool = False  # wqkv/wo bias (configuration_internlm2.py:94)
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    rope_scaling_type: Optional[str] = None  # None | "linear" | "dynamic"
    rope_scaling_factor: float = 1.0
    tie_word_embeddings: bool = False
    pad_token_id: int = 2
    bos_token_id: int = 1
    eos_token_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads


def internlm2_1_8b() -> InternLM2Config:
    return InternLM2Config()


def internlm2_tiny(vocab_size: int = 256) -> InternLM2Config:
    """Tiny config for tests."""
    return InternLM2Config(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )


@dataclasses.dataclass(frozen=True)
class InternViTConfig:
    """InternViT vision config — CARRIED BUT UNUSED, matching the reference
    (configuration_intern_vit.py): the deployed uLLSAM vision tower is the
    SAM ViT; train_joint_v2.py:1372-1378 fabricates a stub vision config.
    Kept so converted InternVL checkpoints round-trip their config."""

    num_channels: int = 3
    patch_size: int = 14
    image_size: int = 448
    hidden_size: int = 1024
    num_attention_heads: int = 16
    num_hidden_layers: int = 24
    intermediate_size: int = 4096
    qk_normalization: bool = True
    qkv_bias: bool = False
    use_flash_attn: bool = True
    layer_norm_eps: float = 1e-6
    initializer_factor: float = 0.1
    drop_path_rate: float = 0.0


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """uLLSAM fusion model config (reference: modeling_internvl_sam.py:43-104).

    Vision tower is the SAM ViT; its 256x64x64 feature map is pixel-shuffled
    by `downsample_ratio` and projected through mlp1 into the LLM, and LLM
    hidden states over image-token positions are projected back through mlp2
    into a dense SAM prompt.
    """

    sam: SamConfig = dataclasses.field(default_factory=sam_vit_b)
    llm: InternLM2Config = dataclasses.field(default_factory=internlm2_1_8b)
    downsample_ratio: float = 0.5
    vit_feature_dim: int = 256      # SAM neck output channels
    template: str = "internlm2-chat"
    img_context_token_id: int = 92546
    img_start_token_id: int = 92544   # <img>
    img_end_token_id: int = 92545     # </img>
    ps_version: str = "v2"
    select_layer: int = -1
    ln_eps: float = 1e-5

    @property
    def feature_hw(self) -> int:
        """Spatial size of the SAM feature map (64 for 1024/16)."""
        return self.sam.vit.grid_size

    @property
    def shuffled_hw(self) -> int:
        """Spatial size after pixel shuffle (32 at ds=0.5)."""
        return int(self.feature_hw * self.downsample_ratio)

    @property
    def num_image_token(self) -> int:
        """Number of visual tokens fed to the LLM (1024 at ds=0.5)."""
        return self.shuffled_hw * self.shuffled_hw

    @property
    def vision_token_dim(self) -> int:
        """Channel dim of a shuffled visual token (1024 at ds=0.5)."""
        return int(self.vit_feature_dim / (self.downsample_ratio ** 2))
