"""Autoregressive generation: jitted prefill + lax.while_loop decode.

Replaces the reference's HF sampling loop with per-step tensor-concat KV
cache (modeling_internlm2.py:1112-1149, :383-388) with a fixed-shape cache
and an on-device while loop that exits early once every row hits EOS.

Logit warpers (temperature -> top-k -> top-p) follow HF semantics so
sampled outputs are comparable for the same random draws.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config
from ullsam_tpu.models.internlm2.model import (
    KVCache, embed_tokens, init_cache, internlm2_decode_step,
    internlm2_prefill)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0          # 0 = disabled
    top_p: float = 1.0      # 1.0 = disabled
    eos_token_id: int = 2
    pad_token_id: int = 2


def apply_warpers(logits: Array, gen: GenerationConfig) -> Array:
    """temperature -> top-k -> top-p, HF ordering. logits [B, V] fp32."""
    logits = logits.astype(jnp.float32)
    if gen.temperature != 1.0:
        logits = logits / gen.temperature
    if gen.top_k > 0:
        kth = jax.lax.top_k(logits, gen.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen.top_p < 1.0:
        sorted_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < gen.top_p  # always keeps the top token
        keep = jnp.zeros_like(keep_sorted)
        keep = keep.at[jnp.arange(logits.shape[0])[:, None], sorted_idx].set(
            keep_sorted)
        logits = jnp.where(keep, logits, -jnp.inf)
    return logits


def sample_token(logits: Array, gen: GenerationConfig, rng: Array) -> Array:
    """[B, V] -> [B] token ids."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1)
    warped = apply_warpers(logits, gen)
    return jax.random.categorical(rng, warped, axis=-1)


class SamplingParams(NamedTuple):
    """Per-row sampling knobs as ARRAYS, so one compiled decode step serves
    requests with different generation configs (the reference passes
    max_new_tokens/temperature/top_p/top_k/do_sample per caption call,
    app.py:443-459)."""
    temperature: Array  # [B] f32
    top_k: Array        # [B] i32; 0 = disabled
    top_p: Array        # [B] f32; 1.0 = disabled
    do_sample: Array    # [B] bool

    @staticmethod
    def from_configs(gens, pad_to: Optional[int] = None) -> "SamplingParams":
        """Build from a list of GenerationConfig (padded with greedy rows)."""
        n = pad_to or len(gens)
        t, k, p, s = ([1.0] * n, [0] * n, [1.0] * n, [False] * n)
        for i, g in enumerate(gens):
            if g is None:
                continue
            t[i], k[i], p[i], s[i] = (g.temperature, g.top_k, g.top_p,
                                      g.do_sample)
        return SamplingParams(jnp.asarray(t, jnp.float32),
                              jnp.asarray(k, jnp.int32),
                              jnp.asarray(p, jnp.float32),
                              jnp.asarray(s, bool))


def sample_token_dynamic(logits: Array, samp: SamplingParams,
                         rng: Array) -> Array:
    """[B, V] -> [B] with PER-ROW temperature/top-k/top-p/do_sample.

    HF warper semantics (temperature -> top-k -> top-p) expressed as
    per-row value thresholds over ONE descending value sort — no argsort
    or scatter, so rows with different configs share the compiled step.
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1)

    l = logits / jnp.clip(samp.temperature, 1e-6)[:, None]
    sorted_vals = -jnp.sort(-l, axis=-1)  # descending
    # top-k: keep values >= the k-th largest (k=0 disables)
    k = jnp.where(samp.top_k > 0, samp.top_k, V)
    kth = jnp.take_along_axis(sorted_vals,
                              jnp.clip(k - 1, 0, V - 1)[:, None], axis=-1)
    l = jnp.where(l < kth, -jnp.inf, l)
    # top-p on the post-top-k distribution: renormalize over the kept
    # prefix, find how many sorted entries the nucleus keeps, and threshold
    # at that value (prefix property of cumsum on a descending sort)
    in_k = jnp.arange(V)[None, :] < k[:, None]
    sorted_masked = jnp.where(in_k, sorted_vals, -jnp.inf)
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < samp.top_p[:, None]  # top token always kept
    n_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1), 1)
    pth = jnp.take_along_axis(sorted_masked, (n_keep - 1)[:, None], axis=-1)
    l = jnp.where(l < pth, -jnp.inf, l)

    sampled = jax.random.categorical(rng, l, axis=-1)
    return jnp.where(samp.do_sample, sampled, greedy)


def last_valid_index(attention_mask: Array) -> Array:
    """Index of the last 1 in each row of a [B, S] mask."""
    S = attention_mask.shape[-1]
    return S - 1 - jnp.argmax(attention_mask[:, ::-1], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "max_len"))
def generate(params: dict, cfg: InternLM2Config, gen: GenerationConfig,
             inputs_embeds: Array, attention_mask: Array,
             rng: Optional[Array] = None,
             max_len: Optional[int] = None) -> Tuple[Array, Array]:
    """Generate up to gen.max_new_tokens continuation tokens.

    inputs_embeds: [B, S, H] (callers scatter image embeddings in before
    calling — the fusion model path); attention_mask: [B, S].
    Returns (tokens [B, max_new_tokens] padded with pad_token_id, lengths [B]).
    """
    B, S, H = inputs_embeds.shape
    if max_len is None:
        max_len = S + gen.max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache = init_cache(cfg, B, max_len, dtype=inputs_embeds.dtype)
    out, cache = internlm2_prefill(params, cfg, inputs_embeds,
                                   attention_mask, cache)
    idx = last_valid_index(attention_mask)
    first_logits = out["logits"][jnp.arange(B), idx]  # [B, V]

    rng, step_rng = jax.random.split(rng)
    tok0 = sample_token(first_logits, gen, step_rng)
    done0 = tok0 == gen.eos_token_id
    buf = jnp.full((B, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    buf = buf.at[:, 0].set(tok0.astype(jnp.int32))

    def cond(state):
        step, _, _, done, _, _ = state
        return jnp.logical_and(step < gen.max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, buf, tok, done, cache, rng = state
        emb = embed_tokens(params, tok)[:, None, :].astype(inputs_embeds.dtype)
        logits, cache = internlm2_decode_step(params, cfg, emb, cache)
        rng, step_rng = jax.random.split(rng)
        nxt = sample_token(logits, gen, step_rng).astype(jnp.int32)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        buf = buf.at[:, step].set(nxt)
        done = jnp.logical_or(done, nxt == gen.eos_token_id)
        return step + 1, buf, nxt, done, cache, rng

    state = (jnp.asarray(1, jnp.int32), buf, tok0.astype(jnp.int32), done0,
             cache, rng)
    _, buf, _, done, _, _ = jax.lax.while_loop(cond, body, state)

    is_eos = buf == gen.eos_token_id
    any_eos = jnp.any(is_eos, axis=-1)
    lengths = jnp.where(any_eos,
                        jnp.argmax(is_eos, axis=-1) + 1,
                        gen.max_new_tokens).astype(jnp.int32)
    return buf, lengths


# ---------------------------------------------------------------------------
# beam search (fixed-shape; the reference gets this via HF generate +
# _reorder_cache, modeling_internlm2.py:1151-1158)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("cfg", "num_beams", "max_new_tokens",
                                    "eos_token_id", "pad_token_id",
                                    "length_penalty", "max_len"))
def beam_search(params: dict, cfg: InternLM2Config, inputs_embeds: Array,
                attention_mask: Array, num_beams: int = 4,
                max_new_tokens: int = 64, eos_token_id: int = 2,
                pad_token_id: int = 2, length_penalty: float = 1.0,
                max_len: Optional[int] = None) -> Tuple[Array, Array]:
    """Beam search for a SINGLE prompt (B=1 in, num_beams explored).

    Fixed shapes throughout: the prompt prefills once, the cache is
    replicated across beams, and each step reorders cache rows by parent
    (the _reorder_cache analog as a batched gather). Returns
    (tokens [max_new_tokens], score scalar) for the best finished (or
    best alive) hypothesis, eos included and pad after.
    """
    B, S, H = inputs_embeds.shape
    assert B == 1, "beam_search explores beams of one prompt"
    K = num_beams
    if max_len is None:
        max_len = S + max_new_tokens

    cache = init_cache(cfg, 1, max_len, dtype=inputs_embeds.dtype)
    out, cache = internlm2_prefill(params, cfg, inputs_embeds,
                                   attention_mask, cache)
    idx = last_valid_index(attention_mask)
    logp0 = jax.nn.log_softmax(
        out["logits"][jnp.arange(1), idx].astype(jnp.float32), axis=-1)[0]

    # replicate cache across beams
    cache = KVCache(k=jnp.repeat(cache.k, K, axis=1),
                    v=jnp.repeat(cache.v, K, axis=1),
                    mask=jnp.repeat(cache.mask, K, axis=0),
                    index=cache.index)

    top0 = jax.lax.top_k(logp0, K)
    tok0 = top0[1].astype(jnp.int32)              # [K]
    scores0 = top0[0]                             # [K]
    buf0 = jnp.full((K, max_new_tokens), pad_token_id, jnp.int32)
    buf0 = buf0.at[:, 0].set(tok0)
    fin_scores0 = jnp.full((K,), -jnp.inf)
    fin_buf0 = jnp.full((K, max_new_tokens), pad_token_id, jnp.int32)
    # beams that started with eos finish immediately
    is_eos0 = tok0 == eos_token_id
    fin_scores0 = jnp.where(is_eos0, scores0 / (1.0 ** length_penalty),
                            fin_scores0)
    fin_buf0 = jnp.where(is_eos0[:, None], buf0, fin_buf0)
    scores0 = jnp.where(is_eos0, -jnp.inf, scores0)

    def step(state, t):
        cache, tok, scores, buf, fin_scores, fin_buf = state
        emb = embed_tokens(params, tok)[:, None, :].astype(inputs_embeds.dtype)
        logits, cache = internlm2_decode_step(params, cfg, emb, cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total = scores[:, None] + logp                     # [K, V]
        V = total.shape[-1]
        flat = total.reshape(-1)
        cand_scores, cand_idx = jax.lax.top_k(flat, 2 * K)
        cand_beam = cand_idx // V
        cand_tok = (cand_idx % V).astype(jnp.int32)
        cand_eos = cand_tok == eos_token_id

        # finished pool: best eos candidate replaces the worst finished
        lp_den = ((t + 2).astype(jnp.float32)) ** length_penalty
        eos_scores = jnp.where(cand_eos, cand_scores, -jnp.inf) / lp_den
        best_eos = jnp.argmax(eos_scores)
        worst_fin = jnp.argmin(fin_scores)
        take = eos_scores[best_eos] > fin_scores[worst_fin]
        new_fin_row = buf[cand_beam[best_eos]].at[t + 1].set(eos_token_id)
        fin_scores = jnp.where(take,
                               fin_scores.at[worst_fin].set(
                                   eos_scores[best_eos]), fin_scores)
        fin_buf = jnp.where(take,
                            fin_buf.at[worst_fin].set(new_fin_row), fin_buf)

        # alive beams: best K non-eos candidates
        alive_scores = jnp.where(cand_eos, -jnp.inf, cand_scores)
        keep_scores, keep = jax.lax.top_k(alive_scores, K)
        parent = cand_beam[keep]
        new_tok = cand_tok[keep]
        # _reorder_cache analog: gather cache rows by parent beam
        cache = KVCache(k=jnp.take(cache.k, parent, axis=1),
                        v=jnp.take(cache.v, parent, axis=1),
                        mask=jnp.take(cache.mask, parent, axis=0),
                        index=cache.index)
        buf = jnp.take(buf, parent, axis=0).at[:, t + 1].set(new_tok)
        return (cache, new_tok, keep_scores, buf, fin_scores, fin_buf), None

    state = (cache, tok0, scores0, buf0, fin_scores0, fin_buf0)
    (cache, tok, scores, buf, fin_scores, fin_buf), _ = jax.lax.scan(
        step, state, jnp.arange(max_new_tokens - 1))

    # alive hypotheses compete with finished (length-penalized)
    alive_norm = scores / (float(max_new_tokens) ** length_penalty)
    all_scores = jnp.concatenate([fin_scores, alive_norm])
    all_bufs = jnp.concatenate([fin_buf, buf], axis=0)
    best = jnp.argmax(all_scores)
    return all_bufs[best], all_scores[best]
