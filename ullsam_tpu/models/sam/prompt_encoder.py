"""SAM prompt encoder, TPU-native.

Behavioral reference: /root/reference/modeling/prompt_encoder.py. The torch
version uses boolean-mask in-place adds per label (prompt_encoder.py:90-93);
here the label-conditional embedding is branchless one-hot arithmetic (the
same trick the reference's own ONNX export uses, utils/onnx.py:51-67), so a
single trace covers every prompt combination. Boxes are encoded as two
points with labels 2/3 (corner embeddings), unifying the sparse path.

Includes the uLLSAM extension: an LLM-hidden-state dense prompt with
parameter-free LayerNorm + learned scale/bias (prompt_encoder.py:131-151).

Layouts: dense outputs are NHWC [B, 64, 64, 256] (reference: NCHW).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import PromptEncoderConfig
from ullsam_tpu.ops import layers as L

Array = jax.Array

# label codes for the unified sparse path
LABEL_PAD = -1      # not-a-point (padding)
LABEL_NEG = 0       # negative click
LABEL_POS = 1       # positive click
LABEL_BOX_TL = 2    # box top-left corner
LABEL_BOX_BR = 3    # box bottom-right corner


def prompt_encoder_init(key, cfg: PromptEncoderConfig) -> dict:
    keys = jax.random.split(key, 8)
    d = cfg.embed_dim
    c = cfg.mask_in_chans
    return {
        # 2 x d/2 random Gaussian matrix buffer (prompt_encoder.py:215-218);
        # must be overwritten from a checkpoint for output parity.
        "pe_gaussian": jax.random.normal(keys[0], (2, d // 2)),
        # rows: [neg, pos, box_tl, box_br] (reference point_embeddings 0..3)
        "point_embeds": jax.random.normal(keys[1], (4, d)),
        "not_a_point": jax.random.normal(keys[2], (d,)),
        "no_mask": jax.random.normal(keys[3], (d,)),
        "llm_scale": jnp.full((1,), 0.1),
        "llm_bias": jnp.zeros((1,)),
        "mask_downscaling": {
            "conv1": L.conv_init(keys[4], 1, c // 4, (2, 2)),
            "ln1": L.layer_norm_init(c // 4),
            "conv2": L.conv_init(keys[5], c // 4, c, (2, 2)),
            "ln2": L.layer_norm_init(c),
            "conv3": L.conv_init(keys[6], c, d, (1, 1)),
        },
    }


# ---------------------------------------------------------------------------
# positional encoding (PositionEmbeddingRandom, prompt_encoder.py:206-251)
# ---------------------------------------------------------------------------


def _pe_encode(gaussian: Array, coords01: Array) -> Array:
    """Fourier-feature encode coords normalized to [0,1]^2 -> [..., embed]."""
    coords = (2.0 * coords01 - 1.0).astype(jnp.float32)
    proj = coords @ gaussian.astype(jnp.float32)
    proj = (2.0 * math.pi) * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def get_dense_pe(params: dict, cfg: PromptEncoderConfig) -> Array:
    """Dense grid PE: [1, H, W, embed] NHWC (reference returns 1xCxHxW)."""
    h, w = cfg.image_embedding_size
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [h,w,2] (x,y)
    return _pe_encode(params["pe_gaussian"], grid)[None]


def encode_coords(params: dict, cfg: PromptEncoderConfig, coords: Array) -> Array:
    """PE for pixel coords [..., 2] in (x, y) order in the input-image frame."""
    h, w = cfg.input_image_size
    scale = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
    return _pe_encode(params["pe_gaussian"], coords.astype(jnp.float32) * scale)


# ---------------------------------------------------------------------------
# sparse prompts
# ---------------------------------------------------------------------------


def embed_points(params: dict, cfg: PromptEncoderConfig,
                 coords: Array, labels: Array) -> Array:
    """coords [B,N,2] (x,y pixels), labels [B,N] in {-1,0,1,2,3} -> [B,N,d].

    Branchless equivalent of prompt_encoder.py:76-94 extended with box-corner
    labels: pad label -1 zeroes the PE and adds not_a_point; labels 0..3 add
    the corresponding learned embedding.
    """
    pe = encode_coords(params, cfg, coords + 0.5)  # pixel-center shift
    is_pad = (labels == LABEL_PAD)[..., None]
    pe = jnp.where(is_pad, 0.0, pe)
    pe = pe + jnp.where(is_pad, params["not_a_point"].astype(pe.dtype), 0.0)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, 3), 4, dtype=pe.dtype)
    onehot = jnp.where(is_pad, 0.0, onehot)
    pe = pe + onehot @ params["point_embeds"].astype(pe.dtype)
    return pe


def boxes_to_points(boxes: Array) -> Tuple[Array, Array]:
    """[B,4] (x0,y0,x1,y1) -> corner coords [B,2,2] + labels [B,2]=(2,3)."""
    corners = boxes.reshape(boxes.shape[0], 2, 2)
    labels = jnp.broadcast_to(
        jnp.asarray([LABEL_BOX_TL, LABEL_BOX_BR]), corners.shape[:2])
    return corners, labels


# ---------------------------------------------------------------------------
# dense prompts
# ---------------------------------------------------------------------------


def embed_masks(params: dict, cfg: PromptEncoderConfig, masks: Array) -> Array:
    """masks [B, 4H, 4W, 1] -> dense [B, H, W, d] (prompt_encoder.py:53-62)."""
    m = params["mask_downscaling"]
    x = L.conv2d(m["conv1"], masks, stride=(2, 2))
    x = L.gelu(L.layer_norm(m["ln1"], x, eps=cfg.ln_eps))
    x = L.conv2d(m["conv2"], x, stride=(2, 2))
    x = L.gelu(L.layer_norm(m["ln2"], x, eps=cfg.ln_eps))
    return L.conv2d(m["conv3"], x)


def no_mask_dense(params: dict, cfg: PromptEncoderConfig, batch: int) -> Array:
    """Broadcast no_mask embedding [B, H, W, d] (prompt_encoder.py:197-201)."""
    h, w = cfg.image_embedding_size
    return jnp.broadcast_to(params["no_mask"].reshape(1, 1, 1, -1),
                            (batch, h, w, params["no_mask"].shape[0]))


def embed_llm_hidden(params: dict, cfg: PromptEncoderConfig,
                     llm_hidden: Array) -> Array:
    """uLLSAM dense prompt from LLM hidden states.

    llm_hidden: [B, H, W, d] NHWC. Parameter-free LayerNorm over channels,
    then learned scalar scale (init 0.1) + bias (prompt_encoder.py:131-151).
    """
    x = L.layer_norm_noparam(llm_hidden, eps=1e-5)
    return x * params["llm_scale"].astype(x.dtype) + params["llm_bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# composed forward (static prompt-presence switches)
# ---------------------------------------------------------------------------


def prompt_encoder_apply(
    params: dict,
    cfg: PromptEncoderConfig,
    points: Optional[Tuple[Array, Array]] = None,
    boxes: Optional[Array] = None,
    masks: Optional[Array] = None,
    llm_hidden: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Returns (sparse [B,N,d], dense [B,H,W,d]).

    Presence of each prompt kind is a static (trace-time) decision, matching
    the reference's None checks (prompt_encoder.py:177-203). When points are
    given without boxes, a single pad point with label -1 is appended.
    """
    sparse_parts = []
    # batch size from the first present prompt (prompt_encoder.py:110-126)
    batch = 1
    for ref in (points[0] if points is not None else None, boxes, masks,
                llm_hidden):
        if ref is not None:
            batch = ref.shape[0]
            break
    if points is not None:
        coords, labels = points
        if boxes is None:
            coords = jnp.concatenate(
                [coords, jnp.zeros((batch, 1, 2), coords.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, jnp.full((batch, 1), LABEL_PAD, labels.dtype)], axis=1)
        sparse_parts.append(embed_points(params, cfg, coords, labels))
    if boxes is not None:
        corner_coords, corner_labels = boxes_to_points(boxes)
        sparse_parts.append(
            embed_points(params, cfg, corner_coords, corner_labels))
    if sparse_parts:
        sparse = jnp.concatenate(sparse_parts, axis=1)
    else:
        sparse = jnp.zeros((batch, 0, cfg.embed_dim))

    if masks is not None:
        dense = embed_masks(params, cfg, masks)
    elif llm_hidden is not None:
        dense = embed_llm_hidden(params, cfg, llm_hidden)
    else:
        dense = no_mask_dense(params, cfg, batch)
    return sparse, dense
