"""High-level chat / interactive-segmentation API over the fusion model.

Behavioral reference: InternVLSAMModel.chat / batch_chat / generate
(modeling_internvl_sam.py:272-442) and the app's interactive path
(app.py:497-656). Prompt lengths are padded to a bucket multiple so jit
compilations stay bounded.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ullsam_tpu.core.config import FusionConfig
from ullsam_tpu.models.internlm2 import model as LLM
from ullsam_tpu.models.internlm2.generate import GenerationConfig, generate
from ullsam_tpu.models.ullsam import fusion as F
from ullsam_tpu.models.ullsam.conversation import (build_chat_prompt,
                                                   get_conv_template)

Array = jax.Array


def _bucket(n: int, multiple: int = 128) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _tokenize_left_padded(tokenizer, prompts: List[str],
                          bucket_multiple: int = 128):
    ids, mask = tokenizer.encode_batch(prompts, pad_side="left")
    S = _bucket(len(ids[0]), bucket_multiple)
    pad = S - len(ids[0])
    ids = [[tokenizer.pad_token_id] * pad + row for row in ids]
    mask = [[0] * pad + row for row in mask]
    return jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _embeds_with_image(params, cfg: FusionConfig, input_ids, pixel_values):
    """Jitted: token embeds + visual-token scatter (one dispatch)."""
    embeds = LLM.embed_tokens(params["llm"], input_ids)
    if pixel_values is not None:
        vit_tokens, _ = F.extract_feature(params, cfg, pixel_values)
        embeds = F.scatter_image_embeds(input_ids, embeds, vit_tokens,
                                        cfg.img_context_token_id)
    return embeds


@functools.partial(jax.jit, static_argnames=("cfg",))
def _segment_prefill(params, cfg: FusionConfig, pixel_values, input_ids):
    """Jitted fused forward returning (dense_prompt, sam_features)."""
    out = F.fusion_forward(params, cfg, pixel_values, input_ids,
                           output_dense_prompt=True)
    return out["dense_prompt"], out["image_embeddings"]


@functools.partial(jax.jit, static_argnames=("cfg", "threshold"))
def _point_segment_jit(params, cfg: FusionConfig, sam_features,
                       dense_prompt, point_coords, point_labels,
                       threshold: float):
    low_res, iou = F.segment_with_prompts(
        params, cfg, sam_features, dense_prompt, point_coords, point_labels,
        multimask_output=False)
    from ullsam_tpu.ops.resize import bilinear_resize
    size = cfg.sam.vit.img_size
    up = bilinear_resize(low_res.astype(jnp.float32), size, size)
    probs = jax.nn.sigmoid(up)
    return probs > threshold, probs, iou


def chat(params: dict, cfg: FusionConfig, tokenizer, pixel_values: Array,
         question: str, gen: Optional[GenerationConfig] = None,
         history: Optional[List[Tuple[str, str]]] = None,
         rng: Optional[Array] = None,
         return_history: bool = False):
    """Single-image chat: returns the response string (and history).

    pixel_values: [1, S, S, 3] NHWC preprocessed image, or None for
    text-only chat.
    """
    responses, history = batch_chat(
        params, cfg, tokenizer, pixel_values,
        [question], gen=gen, histories=[history or []], rng=rng)
    if return_history:
        return responses[0], history[0]
    return responses[0]


def batch_chat(params: dict, cfg: FusionConfig, tokenizer,
               pixel_values: Optional[Array], questions: List[str],
               gen: Optional[GenerationConfig] = None,
               histories: Optional[List[List[Tuple[str, str]]]] = None,
               rng: Optional[Array] = None):
    """Batched chat with left padding (modeling_internvl_sam.py:337-392)."""
    template = get_conv_template(cfg.template)
    eos_id = tokenizer.convert_tokens_to_ids(template.sep.strip())
    if gen is None:
        gen = GenerationConfig()
    import dataclasses
    gen = dataclasses.replace(gen, eos_token_id=eos_id,
                              pad_token_id=tokenizer.pad_token_id)

    histories = histories or [[] for _ in questions]
    prompts = [
        build_chat_prompt(cfg.template, q, history=h,
                          num_image_token=cfg.num_image_token,
                          has_image=pixel_values is not None)
        for q, h in zip(questions, histories)
    ]
    input_ids, attention_mask = _tokenize_left_padded(tokenizer, prompts)

    embeds = _embeds_with_image(params, cfg, input_ids, pixel_values)

    tokens, lengths = generate(params["llm"], cfg.llm, gen, embeds,
                               attention_mask, rng=rng)
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    sep = template.sep.strip()
    responses = []
    for b in range(tokens.shape[0]):
        text = tokenizer.decode(tokens[b, :lengths[b]].tolist())
        responses.append(text.split(sep)[0].strip())
        histories[b].append((questions[b], responses[-1]))
    return responses, histories


def stream_chat(params: dict, cfg: FusionConfig, tokenizer,
                pixel_values: Optional[Array], question: str,
                gen: Optional[GenerationConfig] = None,
                history: Optional[List[Tuple[str, str]]] = None,
                rng: Optional[Array] = None):
    """Token-streaming chat generator (reference stream_chat,
    modeling_internlm2.py:1230-1292): yields text deltas.

    Host-stepped decode (one dispatch per token); for throughput serving
    use serve.engine.GenerationEngine.stream_caption instead.
    """
    import dataclasses

    from ullsam_tpu.models.internlm2.generate import sample_token

    template = get_conv_template(cfg.template)
    eos_id = tokenizer.convert_tokens_to_ids(template.sep.strip())
    gen = dataclasses.replace(gen or GenerationConfig(),
                              eos_token_id=eos_id,
                              pad_token_id=tokenizer.pad_token_id)
    prompt = build_chat_prompt(cfg.template, question, history=history,
                               num_image_token=cfg.num_image_token,
                               has_image=pixel_values is not None)
    ids = tokenizer.encode(prompt)
    input_ids = jnp.asarray([ids], jnp.int32)
    mask = jnp.ones_like(input_ids)
    embeds = LLM.embed_tokens(params["llm"], input_ids)
    if pixel_values is not None:
        vit_tokens, _ = F.extract_feature(params, cfg, pixel_values)
        embeds = F.scatter_image_embeds(input_ids, embeds, vit_tokens,
                                        cfg.img_context_token_id)
    max_len = len(ids) + gen.max_new_tokens
    cache = LLM.init_cache(cfg.llm, 1, max_len, dtype=embeds.dtype)
    out, cache = LLM.internlm2_prefill(params["llm"], cfg.llm, embeds, mask,
                                       cache)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng, srng = jax.random.split(rng)
    tok = int(np.asarray(sample_token(out["logits"][:, -1], gen, srng))[0])
    sep = template.sep.strip()
    toks, emitted = [tok], ""
    for _ in range(gen.max_new_tokens - 1):
        if tok == gen.eos_token_id:
            break
        text = tokenizer.decode(toks).split(sep)[0]
        if len(text) > len(emitted) and not text.endswith("\ufffd"):
            yield text[len(emitted):]
            emitted = text
        emb = LLM.embed_tokens(params["llm"],
                               jnp.asarray([tok]))[:, None, :].astype(embeds.dtype)
        logits, cache = LLM.internlm2_decode_step(params["llm"], cfg.llm,
                                                  emb, cache)
        rng, srng = jax.random.split(rng)
        tok = int(np.asarray(sample_token(logits, gen, srng))[0])
        toks.append(tok)
    text = tokenizer.decode(toks).split(sep)[0]
    if len(text) > len(emitted):
        yield text[len(emitted):]


def segment_forward(params: dict, cfg: FusionConfig, tokenizer,
                    pixel_values: Array,
                    question: str = "Describe the image in detail."):
    """The app's interactive-segmentation prefill (app.py:549-598): one fused
    forward with the fixed question, returning the LLM dense prompt and the
    SAM features for subsequent point decoding."""
    prompt = build_chat_prompt(cfg.template, question,
                               num_image_token=cfg.num_image_token)
    ids = tokenizer.encode(prompt)
    input_ids = jnp.asarray([ids], jnp.int32)
    return _segment_prefill(params, cfg, pixel_values, input_ids)


def point_segment(params: dict, cfg: FusionConfig, sam_features: Array,
                  dense_prompt: Optional[Array], point_coords: Array,
                  point_labels: Array, threshold: float = 0.5):
    """Interactive mask from clicks (app.py:617-644): decode + upsample +
    sigmoid threshold. Returns (binary mask [B,1,S,S], probs, iou)."""
    # NB: the app thresholds sigmoid>0.5 (app.py:644) while Sam.forward uses
    # logits>0.0 (sam.py:19,123) — numerically identical at 0.5/0.0.
    return _point_segment_jit(params, cfg, sam_features, dense_prompt,
                              point_coords, point_labels, threshold)
