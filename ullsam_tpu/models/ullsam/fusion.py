"""uLLSAM fusion model: SAM vision tower <-> InternLM2 LLM, TPU-native.

Behavioral reference: /root/reference/modeling/modeling_internvl_sam.py.
The SAM 64x64x256 feature map is pixel-shuffled (ds=0.5) to 1024 visual
tokens, projected by mlp1 into the LLM embedding space, and scattered into
the <IMG_CONTEXT> positions of the prompt; the LLM's final hidden states
over those positions are projected back by mlp2 + inverse pixel shuffle
into a 64x64x256 dense SAM prompt (text_aware_dense_feature).

TPU-first redesign notes:
  * The reference's boolean-mask scatter with a repeat-on-overflow fallback
    (modeling_internvl_sam.py:135-158) becomes a fully vectorized gather:
    index = (cumsum(is_context) - 1) mod n_vit_tokens — identical semantics
    (including overflow wraparound), no dynamic shapes.
  * The image-token hidden-state slice (reference slices min..max index,
    :194-200) becomes a per-row dynamic_slice of the static token count.
  * One jitted fused forward returns the dense prompt AND the raw SAM
    features, so training never recomputes the vision tower (the reference
    runs it twice per step, train_joint_v2.py:1014-1021).

Layouts: pixel_values NHWC [B, 1024, 1024, 3]; SAM features NHWC.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import FusionConfig
from ullsam_tpu.ops import layers as L
from ullsam_tpu.models.sam import sam as SAM
from ullsam_tpu.models.internlm2 import model as LLM

Array = jax.Array


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _proj_mlp_init(key, in_dim: int, mid_dim: int, out_dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "ln": L.layer_norm_init(in_dim),
        "fc1": L.linear_init(k1, in_dim, mid_dim),
        "fc2": L.linear_init(k2, mid_dim, out_dim),
    }


def _proj_mlp(params: dict, x: Array, eps: float) -> Array:
    """LN -> Linear -> GELU -> Linear (mlp1/mlp2, modeling_internvl_sam.py:88-100)."""
    x = L.layer_norm(params["ln"], x, eps=eps)
    return L.linear(params["fc2"], L.gelu(L.linear(params["fc1"], x)))


def fusion_init(key, cfg: FusionConfig) -> dict:
    k_sam, k_llm, k1, k2 = jax.random.split(key, 4)
    vd = cfg.vision_token_dim          # 1024
    hd = cfg.llm.hidden_size           # 2048
    return {
        "sam": SAM.sam_init(k_sam, cfg.sam),
        "llm": LLM.internlm2_init(k_llm, cfg.llm),
        "mlp1": _proj_mlp_init(k1, vd, hd, hd),
        "mlp2": _proj_mlp_init(k2, hd, vd, vd),
    }


# ---------------------------------------------------------------------------
# pixel shuffle (modeling_internvl_sam.py:226-240) and its inverse (:253-270)
# ---------------------------------------------------------------------------


def pixel_shuffle(x: Array, scale: float, ps_version: str = "v2") -> Array:
    """[N, H, W, C] -> [N, H*s, W*s, C/s^2] via the InternVL shuffle order."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, int(w * scale), int(c / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(w * scale), int(h * scale), int(c / (scale * scale)))
    if ps_version != "v1":
        x = x.transpose(0, 2, 1, 3)
    return x


def pixel_unshuffle(x: Array, scale: float, ps_version: str = "v2") -> Array:
    """Inverse of pixel_shuffle: [N, h, w, c] -> [N, h/s, w/s, c*s^2].

    Mirrors text_aware_dense_feature's reshape chain
    (modeling_internvl_sam.py:261-268) but returns NHWC.
    """
    if ps_version != "v1":
        x = x.transpose(0, 2, 1, 3)
    n, h, w, c = x.shape
    x = x.reshape(n, h, int(w / scale), int(c * scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(w / scale), int(h / scale), int(c * scale * scale))
    return x  # already NHWC (the reference permutes to NCHW here, :268)


# ---------------------------------------------------------------------------
# feature extraction + scatter
# ---------------------------------------------------------------------------


def extract_feature(params: dict, cfg: FusionConfig, pixel_values: Array,
                    stop_vision_gradient: bool = True,
                    remat: bool = False) -> Tuple[Array, Array]:
    """pixel_values [B, S, S, 3] -> (vit_tokens [B, T, llm_hidden],
    sam_features [B, 64, 64, 256]).

    Reference: modeling_internvl_sam.py:242-251 (vision tower under no_grad,
    pixel shuffle, mlp1).
    """
    # compute in the vision tower's PARAM dtype: f32 pixel inputs against
    # bf16 weights would promote every ViT matmul (fwd AND flash backward)
    # to f32 — measured 12.5 ms/step of f32 flash-bwd kernels alone on the
    # flagship train step. The reference trains the tower in bf16 autocast
    # (train_joint_v2.py deepspeed bf16); f32 params keep exact f32 parity.
    pe_dtype = params["sam"]["image_encoder"]["patch_embed"]["kernel"].dtype
    feats = SAM.encode_image(params["sam"], cfg.sam,
                             pixel_values.astype(pe_dtype), remat=remat)
    if stop_vision_gradient:
        feats = jax.lax.stop_gradient(feats)
    x = pixel_shuffle(feats, cfg.downsample_ratio, cfg.ps_version)
    B = x.shape[0]
    x = x.reshape(B, -1, x.shape[-1])          # [B, 1024, 1024]
    vit_tokens = _proj_mlp(params["mlp1"], x, cfg.ln_eps)
    return vit_tokens, feats


def scatter_image_embeds(input_ids: Array, input_embeds: Array,
                         vit_tokens: Array, context_token_id: int) -> Array:
    """Replace <IMG_CONTEXT> positions with visual tokens.

    input_ids [B, N]; input_embeds [B, N, C]; vit_tokens [B_img, T, C]
    (flattened across the image batch, consumed sequentially over the
    flattened token stream — identical to the reference's boolean scatter
    incl. the repeat-on-overflow fallback, modeling_internvl_sam.py:135-158).
    """
    B, N, C = input_embeds.shape
    flat_vit = vit_tokens.reshape(-1, C)
    sel = (input_ids.reshape(-1) == context_token_id)
    idx = (jnp.cumsum(sel) - 1) % flat_vit.shape[0]
    gathered = jnp.take(flat_vit, idx, axis=0).astype(input_embeds.dtype)
    out = jnp.where(sel[:, None], gathered, input_embeds.reshape(B * N, C))
    return out.reshape(B, N, C)


def gather_image_hidden(input_ids: Array, hidden: Array,
                        context_token_id: int, num_image_token: int) -> Array:
    """Per-row gather of the (contiguous) image-token hidden states.

    hidden [B, N, H] -> [B, num_image_token, H]. The chat template always
    emits the context tokens as one contiguous run (reference slices
    min..max index, modeling_internvl_sam.py:194-200).
    """
    sel = (input_ids == context_token_id)
    starts = jnp.argmax(sel, axis=-1)  # first image-token position per row

    def row(h, s):
        return jax.lax.dynamic_slice_in_dim(h, s, num_image_token, axis=0)

    return jax.vmap(row)(hidden, starts)


def text_aware_dense_feature(params: dict, cfg: FusionConfig,
                             image_hidden: Array) -> Array:
    """LLM hidden states over image tokens -> dense SAM prompt.

    image_hidden [B, T, llm_hidden] -> [B, 64, 64, 256] NHWC
    (reference returns NCHW, modeling_internvl_sam.py:253-270).
    """
    x = _proj_mlp(params["mlp2"], image_hidden, cfg.ln_eps)
    B, T, C = x.shape
    s = cfg.shuffled_hw
    x = x.reshape(B, s, s, C)
    return pixel_unshuffle(x, cfg.downsample_ratio, cfg.ps_version)


# ---------------------------------------------------------------------------
# fused forward
# ---------------------------------------------------------------------------


def fusion_forward(
    params: dict,
    cfg: FusionConfig,
    pixel_values: Array,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    labels: Optional[Array] = None,
    segment_ids: Optional[Array] = None,
    output_dense_prompt: bool = False,
    stop_vision_gradient: bool = True,
    remat: bool = False,
    remat_llm: Optional[bool] = None,
) -> dict:
    """One fused forward (reference forward, modeling_internvl_sam.py:106-224).

    Returns dict with:
      logits [B, N, V]
      loss (if labels given; CE with shift, ignore_index=-100)
      dense_prompt [B, 64, 64, 256] (if output_dense_prompt — the
        text_aware_dense_feature over image-token hidden states)
      image_embeddings [B, 64, 64, 256] raw SAM features (always — computed
        once, reused by the mask decoder; fixes the reference's duplicate
        vision pass, train_joint_v2.py:1014-1021)

    segment_ids [B, N] (0 = pad): PACKED rows — several samples per row,
    attention confined to each segment, RoPE restarting per segment, and
    the CE shift masked at segment boundaries. pixel_values then carries
    ALL packed images [total_imgs, ...] in flattened token-stream order
    (scatter_image_embeds consumes them sequentially). dense_prompt
    requires one image per row and is unavailable in packed mode.
    """
    vit_tokens, sam_feats = extract_feature(
        params, cfg, pixel_values, stop_vision_gradient=stop_vision_gradient,
        remat=remat)
    embeds = LLM.embed_tokens(params["llm"], input_ids)
    embeds = scatter_image_embeds(input_ids, embeds, vit_tokens,
                                  cfg.img_context_token_id)
    # remat_llm defaults to remat; at b=1 with a FROZEN LLM the saved
    # activations are small and rematerializing the 24-layer forward for
    # the activation-gradient backward wastes ~30 ms/step — segment-mode
    # training disables it (train/step.py)
    out = LLM.internlm2_forward(params["llm"], cfg.llm,
                                inputs_embeds=embeds,
                                attention_mask=attention_mask,
                                segment_ids=segment_ids,
                                remat=(remat if remat_llm is None
                                       else remat_llm))
    result = {"logits": out["logits"], "image_embeddings": sam_feats}

    if labels is not None:
        logits = out["logits"][:, :-1, :].astype(jnp.float32)
        targets = labels[:, 1:]
        valid = targets != -100
        if segment_ids is not None:
            # packed rows: never predict across a document boundary
            valid &= segment_ids[:, :-1] == segment_ids[:, 1:]
        safe_targets = jnp.where(valid, targets, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_targets[..., None],
                                   axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1)
        result["loss"] = jnp.sum(jnp.where(valid, nll, 0.0)) / denom

    if output_dense_prompt:
        image_hidden = gather_image_hidden(
            input_ids, out["last_hidden"], cfg.img_context_token_id,
            cfg.num_image_token)
        result["dense_prompt"] = text_aware_dense_feature(
            params, cfg, image_hidden)
    return result


def segment_with_prompts(
    params: dict,
    cfg: FusionConfig,
    sam_features: Array,
    dense_prompt: Optional[Array],
    point_coords: Array,
    point_labels: Array,
    multimask_output: bool = False,
) -> Tuple[Array, Array]:
    """SAM decode with the LLM-conditioned dense prompt.

    sam_features: [1, 64, 64, 256] (from fusion_forward); dense_prompt:
    [1, 64, 64, 256] or None (baseline mode, train_joint_v2_baseline.py:1010);
    point_coords [B, P, 2], point_labels [B, P] — prompts batched per
    instance. Returns (low-res mask logits [B, M, 256, 256], iou [B, M]).
    """
    from ullsam_tpu.models.sam import prompt_encoder as PE
    from ullsam_tpu.models.sam import mask_decoder as MD

    pe_params = params["sam"]["prompt_encoder"]
    pe_cfg = cfg.sam.prompt_encoder
    B = point_coords.shape[0]

    sparse, dense = PE.prompt_encoder_apply(
        pe_params, pe_cfg, points=(point_coords, point_labels))
    if dense_prompt is not None:
        llm_dense = PE.embed_llm_hidden(pe_params, pe_cfg, dense_prompt)
        dense = jnp.broadcast_to(llm_dense, (B,) + llm_dense.shape[1:])
    image_pe = PE.get_dense_pe(pe_params, pe_cfg)
    # decode in the feature dtype: the PE sin/cos math stays f32 for
    # precision but f32 prompt tensors would promote the whole decoder
    # (and send f32 cotangents into the bf16 conv backward — a dtype
    # error under grad, and 2x matmul cost in bf16 training)
    dt = sam_features.dtype
    sparse, dense, image_pe = (sparse.astype(dt), dense.astype(dt),
                               image_pe.astype(dt))
    return MD.mask_decoder_apply(
        params["sam"]["mask_decoder"], cfg.sam.mask_decoder,
        sam_features, image_pe, sparse, dense,
        multimask_output=multimask_output)
