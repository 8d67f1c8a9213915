"""InternLM2 decoder-only LLM, TPU-native.

Behavioral reference: /root/reference/modeling/modeling_internlm2.py
(RMSNorm fp32, RoPE w/ linear+dynamic-NTK scaling, GQA via fused wqkv
packing, SwiGLU MLP, fp32 softmax, untied output head).

TPU-first redesign, not a translation:
  * Layer params are stacked along a leading layer axis and the decoder is
    a single lax.scan — one compile of one layer body instead of 24 unrolls.
  * KV cache is preallocated fixed-shape [L, B, max_len, n_kv, hd] with an
    absolute write index, replacing the reference's per-step tensor concat
    (modeling_internlm2.py:383-388) that forces dynamic shapes.
  * GQA attention contracts grouped heads directly (no repeat_kv
    materialization, reference :268-277).
  * Padding is an additive mask built from a [B, S] validity mask; the
    flash-attention kernel path uses the same mask semantics.

Layouts: activations [B, S, H]; q/k/v [B, S, heads, head_dim].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config
from ullsam_tpu.ops import layers as L
from ullsam_tpu.ops.rope import apply_rope, rope_cos_sin

Array = jax.Array

NEG_INF = -1e9  # additive mask value (fp32 logits)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def internlm2_init(key, cfg: InternLM2Config, dtype=jnp.float32) -> dict:
    nl = cfg.num_hidden_layers
    H, I = cfg.hidden_size, cfg.intermediate_size
    qkv_out = (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * cfg.head_dim
    keys = jax.random.split(key, 8)

    def stacked(k, shape, scale):
        return (jax.random.normal(k, (nl,) + shape, dtype) * scale)

    layers = {
        "attention_norm": {"scale": jnp.ones((nl, H), dtype)},
        "wqkv": {"kernel": stacked(keys[0], (H, qkv_out), H ** -0.5)},
        "wo": {"kernel": stacked(keys[1], (H, H), H ** -0.5)},
        "ffn_norm": {"scale": jnp.ones((nl, H), dtype)},
        "w1": {"kernel": stacked(keys[2], (H, I), H ** -0.5)},
        "w3": {"kernel": stacked(keys[3], (H, I), H ** -0.5)},
        "w2": {"kernel": stacked(keys[4], (I, H), I ** -0.5)},
    }
    if cfg.bias:
        layers["wqkv"]["bias"] = jnp.zeros((nl, qkv_out), dtype)
        layers["wo"]["bias"] = jnp.zeros((nl, H), dtype)
    return {
        "tok_embeddings": jax.random.normal(keys[5], (cfg.vocab_size, H),
                                            dtype) * 0.02,
        "layers": layers,
        "norm": {"scale": jnp.ones((H,), dtype)},
        "output": {"kernel": jax.random.normal(keys[6], (H, cfg.vocab_size),
                                               dtype) * H ** -0.5},
    }


def embed_tokens(params: dict, input_ids: Array) -> Array:
    return jnp.take(params["tok_embeddings"], input_ids, axis=0)


# ---------------------------------------------------------------------------
# attention core
# ---------------------------------------------------------------------------


def _split_wqkv(qkv: Array, cfg: InternLM2Config) -> Tuple[Array, Array, Array]:
    """Unpack the fused wqkv output (modeling_internlm2.py:363-371 layout:
    [B, S, n_kv, groups + 2, hd] with q groups first, then k, then v)."""
    B, S, _ = qkv.shape
    g = cfg.num_kv_groups
    qkv = qkv.reshape(B, S, cfg.num_key_value_heads, g + 2, cfg.head_dim)
    q = qkv[:, :, :, :g, :].reshape(B, S, cfg.num_attention_heads, cfg.head_dim)
    k = qkv[:, :, :, -2, :]
    v = qkv[:, :, :, -1, :]
    return q, k, v


def gqa_attention(q: Array, k: Array, v: Array, mask: Array,
                  cfg: InternLM2Config, *, causal: bool = False,
                  seg: Optional[Tuple[Array, Array]] = None) -> Array:
    """Grouped-query attention without repeat_kv.

    q: [B, S, nh, hd]; k/v: [B, T, n_kv, hd]; mask additive [B, 1, S, T] /
    [B, 1, T] / broadcastable, or None. Softmax fp32 (reference :409).
    causal=True applies q_pos >= kv_pos via fused iotas (S and T must be
    position-aligned, i.e. full-sequence S == T); seg=(seg_q [B,S],
    seg_k [B,T]) restricts attention to matching packed segments. These
    replace materialized [S, T] additive masks so no mask tensor ever
    hits HBM. Returns [B, S, nh, hd].
    """
    B, S, nh, hd = q.shape
    T = k.shape[1]
    nkv, g = cfg.num_key_value_heads, cfg.num_kv_groups
    qg = q.reshape(B, S, nkv, g, hd)
    # s-major logits ("bsngt", not "bngst"): keeps q/logits in the layout
    # the rope/split chain produces, so no relayout copies form at the
    # dot boundaries (the head-major order cost ~14 ms/step of pure
    # layout-change fusions on the flagship backward trace).
    logits = jnp.einsum("bsngd,btnd->bsngt", qg, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (hd ** -0.5)
    if mask is not None:
        m = mask.reshape(B, 1, 1, mask.shape[-2], T)
        logits = logits + jnp.moveaxis(m, 3, 1)  # [B, S|1, 1, 1, T]
    if causal:
        # iota-compare causal masking fuses into the logits fusion for
        # free; a materialized [S, T] f32 additive mask costs a 4.7 MB
        # write+read per layer per pass (~1.5 ms/step re-expanded inside
        # the 24-layer scan on the flagship trace).
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        logits = jnp.where((q_pos >= kv_pos)[None, :, None, None, :],
                           logits, NEG_INF)
    if seg is not None:
        seg_q, seg_k = seg
        same = (seg_q[:, :, None, None, None] == seg_k[:, None, None, None, :])
        logits = jnp.where(same, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bsngt,btnd->bsngd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, S, nh, hd).astype(q.dtype)


def causal_mask(attention_mask: Array, q_len: int, kv_len: int,
                q_offset: Array | int = 0) -> Array:
    """Additive [B, q_len, kv_len] mask combining causality and padding.

    attention_mask: [B, kv_len] validity (1 = attendable). q_offset is the
    absolute position of the first query row (scalar or per-batch [B]).
    """
    q_pos = jnp.arange(q_len)[:, None] + jnp.asarray(q_offset)[..., None, None]
    kv_pos = jnp.arange(kv_len)[None, :]
    causal = q_pos >= kv_pos  # [B?, q, kv]
    valid = attention_mask[:, None, :].astype(bool)
    ok = jnp.logical_and(causal, valid)
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


# ---------------------------------------------------------------------------
# full-sequence forward (training / no-cache prefill)
# ---------------------------------------------------------------------------


def _layer_body(cfg: InternLM2Config, x: Array, lp: dict, cos: Array,
                sin: Array, mask,
                k_cache: Optional[Array] = None,
                v_cache: Optional[Array] = None,
                write_index: Optional[Array] = None,
                use_flash: bool = False):
    """One decoder layer (modeling_internlm2.py:609-681 semantics).

    If k_cache/v_cache are given ([B, max_len, n_kv, hd]) the new k/v are
    written at write_index and attention runs against the full cache.
    Returns (x_out, new_k, new_v) where new_k/new_v are either the updated
    cache slabs or the per-call k/v (cache-less mode).

    use_flash (cache-less mode only): mask is a (q_seg, kv_seg) tuple and
    attention dispatches to the Pallas causal GQA kernel. Cache-less XLA
    mode: mask is a (kmask [B, 1, T] additive, seg-pair-or-None) tuple —
    causality comes from fused iotas inside gqa_attention, never a
    materialized [S, T] tensor.
    """
    B, S = x.shape[:2]
    if use_flash and k_cache is None:
        from ullsam_tpu.ops.pallas.flash_attention import llm_flash_attention
        h = L.rms_norm(lp["attention_norm"], x, eps=cfg.rms_norm_eps)
        qkv = L.linear(lp["wqkv"], h)
        q, k, v = _split_wqkv(qkv, cfg)
        q, k = apply_rope(q, k, cos, sin)
        q_seg, kv_seg = mask
        attn = llm_flash_attention(q, k, v, q_seg, kv_seg,
                                   num_kv_heads=cfg.num_key_value_heads,
                                   causal=True)
        new_k, new_v = k, v
        x = x + L.linear(lp["wo"], attn.reshape(B, S, cfg.hidden_size))
    elif k_cache is not None:
        h = L.rms_norm(lp["attention_norm"], x, eps=cfg.rms_norm_eps)
        qkv = L.linear(lp["wqkv"], h)
        q, k, v = _split_wqkv(qkv, cfg)
        q, k = apply_rope(q, k, cos, sin)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k.astype(k_cache.dtype), write_index, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v.astype(v_cache.dtype), write_index, axis=1)
        attn = gqa_attention(q, k_cache.astype(q.dtype),
                             v_cache.astype(q.dtype), mask, cfg)
        new_k, new_v = k_cache, v_cache
        x = x + L.linear(lp["wo"], attn.reshape(B, S, cfg.hidden_size))
    else:
        # checkpoint the WHOLE attention half-layer (norm -> qkv -> rope ->
        # attention -> wo). Its only saved residual is x — which the scan
        # carries anyway — so neither the per-layer [S, nh, hd] q/k/v nor
        # the [n_kv, g, S, T] f32 logits are ever stacked for the backward
        # (1.35 GB/step at S=1088 on the flagship). Narrower boundaries
        # measured worse: checkpointing only gqa_attention saved q/k/v at
        # the seam in awkward [B, n_kv, S, g, hd]-family layouts and the
        # backward spent ~14 ms/step in pure relayout copies between the
        # rematted region and the surrounding rope/linear ops (round-4
        # trace: fusion.4694/4695/4669). The recompute adds one qkv
        # projection + rope per layer (~0.06 ms MXU).
        # Checkpoint-boundary A/B (round 4, measured on the flagship step):
        # "inner" (default) remats only the attention probs — 139.8 ms;
        # "half" remats the whole norm->qkv->rope->attn->wo half-layer —
        # 143.6-144.1 ms but drops ~215 MB/step of stacked q/k/v residuals
        # (the recompute re-pays the rope/einsum relayout copies in the
        # backward, which is where the 3-4 ms goes). Use "half" when
        # activation memory, not step time, is the binding constraint.
        kmask, seg = mask
        _ckpt = os.environ.get("ULLSAM_LLM_ATTN_CKPT", "inner")
        if _ckpt not in ("inner", "half"):
            raise ValueError(
                f"ULLSAM_LLM_ATTN_CKPT={_ckpt!r}: expected 'inner' or "
                "'half' (unrecognized values used to silently pick the "
                "slower 'half' path — advisor r4)")
        if _ckpt == "inner":
            h = L.rms_norm(lp["attention_norm"], x, eps=cfg.rms_norm_eps)
            qkv = L.linear(lp["wqkv"], h)
            q, k, v = _split_wqkv(qkv, cfg)
            q, k = apply_rope(q, k, cos, sin)
            attn = jax.checkpoint(
                lambda q_, k_, v_, m_: gqa_attention(q_, k_, v_, m_, cfg,
                                                     causal=True, seg=seg)
            )(q, k, v, kmask)
            x = x + L.linear(lp["wo"], attn.reshape(B, S, cfg.hidden_size))
            new_k, new_v = None, None
        else:
            def attn_half(x_, w_, cos_, sin_, kmask_, seg_):
                h_ = L.rms_norm(w_["attention_norm"], x_,
                                eps=cfg.rms_norm_eps)
                qkv_ = L.linear(w_["wqkv"], h_)
                q_, k_, v_ = _split_wqkv(qkv_, cfg)
                q_, k_ = apply_rope(q_, k_, cos_, sin_)
                a_ = gqa_attention(q_, k_, v_, kmask_, cfg, causal=True,
                                   seg=seg_)
                return L.linear(w_["wo"], a_.reshape(B, S, cfg.hidden_size))

            w = {"attention_norm": lp["attention_norm"], "wqkv": lp["wqkv"],
                 "wo": lp["wo"]}
            x = x + jax.checkpoint(attn_half)(x, w, cos, sin, kmask, seg)
            new_k, new_v = None, None

    h = L.rms_norm(lp["ffn_norm"], x, eps=cfg.rms_norm_eps)
    x = x + L.swiglu(lp, h)
    return x, new_k, new_v


def internlm2_forward(
    params: dict,
    cfg: InternLM2Config,
    input_ids: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    attention_mask: Optional[Array] = None,
    position_ids: Optional[Array] = None,
    segment_ids: Optional[Array] = None,
    output_hidden_states: bool = False,
    remat: bool = False,
) -> dict:
    """Full-sequence forward. Returns dict with 'logits' [B,S,V],
    'last_hidden' [B,S,H] (post final norm), and optionally
    'hidden_states' [n_layers+1, B, S, H] (per-layer inputs, HF ordering:
    hidden_states[i] is the input to layer i; last_hidden is the post-norm
    final, matching outputs.hidden_states[-1] semantics via select).

    segment_ids [B, S] int32 (0 = padding): PACKED-sequence mode — several
    documents share one row, tokens attend only within their own nonzero
    segment, and RoPE positions restart per segment. The flash kernel
    consumes segment ids natively; the XLA path builds the equivalent
    block-diagonal causal mask (replaces the reference's one-doc-per-row
    padding batches, modeling_internlm2.py:1131-1134)."""
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    x = inputs_embeds
    B, S, H = x.shape
    if segment_ids is not None:
        attention_mask = (segment_ids != 0).astype(jnp.int32)
        if position_ids is None:
            # restart positions at each packed-segment boundary
            same = (segment_ids[:, 1:] == segment_ids[:, :-1])
            run = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), same.astype(jnp.int32)],
                axis=-1)
            # position = index - (index of segment start)
            idx = jnp.arange(S)[None]
            start = idx * (1 - run)
            start = jax.lax.associative_scan(jnp.maximum, start, axis=-1)
            position_ids = (idx - start) * attention_mask
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    if position_ids is None:
        # position = cumsum of mask - 1, clamped (reference builds position
        # ids from the padding mask, modeling_internlm2.py:1131-1134)
        position_ids = jnp.maximum(
            jnp.cumsum(attention_mask, axis=-1) - 1, 0)

    cos, sin = rope_cos_sin(cfg, position_ids, ntk_seq_len=S)

    # XLA attention runs near-roofline at uLLSAM's ~1.2k sequences (bf16
    # 24-layer fwd measured ~146 TFLOP/s on v5e); the flash kernel wins
    # once the S^2 logits stop fitting in fused scratch — see the measured
    # crossover sweep in docs/BENCHMARKS.md (flash wins from S=2048 up).
    # ULLSAM_LLM_FLASH_MIN overrides the crossover for A/B experiments.
    from ullsam_tpu.ops.pallas import backend_ok
    use_flash = (backend_ok()
                 and S >= int(os.environ.get("ULLSAM_LLM_FLASH_MIN", "2048")))
    seg = (segment_ids.astype(jnp.int32) if segment_ids is not None
           else attention_mask.astype(jnp.int32))
    if use_flash:
        mask = (seg, seg)
    else:
        # factored mask: key-validity as a tiny [B, 1, T] additive term;
        # causality (and packed-segment blocking) fuse as iota/compare
        # terms inside gqa_attention — the [S, T] f32 mask tensor the
        # reference materializes (modeling_internlm2.py:937-969) never
        # exists.
        kmask = jnp.where(attention_mask.astype(bool), 0.0,
                          NEG_INF).astype(jnp.float32)[:, None, :]
        mask = (kmask, (seg, seg) if segment_ids is not None else None)

    stacked = params["layers"]

    def body(carry, lp):
        x = carry
        x_out, _, _ = _layer_body(cfg, x, lp, cos, sin, mask,
                                  use_flash=use_flash)
        return x_out, (x if output_hidden_states else None)

    if remat:
        body = jax.checkpoint(body)  # trade FLOPs for activation memory
    x, per_layer = jax.lax.scan(body, x, stacked)
    last_hidden = L.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    logits = L.linear(params["output"], last_hidden)
    out = {"logits": logits, "last_hidden": last_hidden}
    if output_hidden_states:
        out["hidden_states"] = per_layer  # [L, B, S, H] inputs to each layer
    return out


# ---------------------------------------------------------------------------
# KV-cache prefill / decode
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KVCache:
    k: Array          # [L, B, max_len, n_kv, hd]
    v: Array          # [L, B, max_len, n_kv, hd]
    mask: Array       # [B, max_len] int32 validity of cache slots
    index: Array      # scalar int32: next write slot


jax.tree_util.register_dataclass(
    KVCache, data_fields=["k", "v", "mask", "index"], meta_fields=[])


def init_cache(cfg: InternLM2Config, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   mask=jnp.zeros((batch, max_len), jnp.int32),
                   index=jnp.zeros((), jnp.int32))


def internlm2_prefill(params: dict, cfg: InternLM2Config,
                      inputs_embeds: Array, attention_mask: Array,
                      cache: KVCache,
                      output_hidden_states: bool = False) -> Tuple[dict, KVCache]:
    """Prefill the cache with a [B, S, H] prompt (S <= max_len).

    attention_mask: [B, S] validity (supports left- or right-padding).
    Writes k/v into slots [0, S); returns forward outputs + updated cache.
    """
    x = inputs_embeds
    B, S, H = x.shape
    max_len = cache.k.shape[2]
    position_ids = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    cos, sin = rope_cos_sin(cfg, position_ids, ntk_seq_len=max_len)

    cache_mask = jnp.pad(attention_mask, ((0, 0), (0, max_len - S)))
    mask = causal_mask(cache_mask, S, max_len)

    zero = jnp.zeros((), jnp.int32)

    def body(carry, xs):
        x = carry
        lp, kc, vc = xs
        x_out, kc, vc = _layer_body(cfg, x, lp, cos, sin, mask,
                                    k_cache=kc, v_cache=vc, write_index=zero)
        return x_out, ((x if output_hidden_states else None), kc, vc)

    x, (per_layer, new_k, new_v) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v))
    last_hidden = L.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    logits = L.linear(params["output"], last_hidden)
    out = {"logits": logits, "last_hidden": last_hidden}
    if output_hidden_states:
        out["hidden_states"] = per_layer
    new_cache = KVCache(k=new_k, v=new_v, mask=cache_mask,
                        index=jnp.asarray(S, jnp.int32))
    return out, new_cache


def internlm2_prefill_at(params: dict, cfg: InternLM2Config,
                         inputs_embeds: Array, chunk_mask: Array,
                         cache: KVCache, start: Array,
                         compute_logits: bool = True
                         ) -> Tuple[dict, KVCache]:
    """CHUNKED prefill: write a RIGHT-PACKED [B, C, H] prompt segment at
    cache slots [start, start+C) and attend over everything cached so far
    plus the causal prefix of the segment.

    `start` is a traced int32 scalar, so ONE compiled program serves every
    segment position — the serving engine interleaves these segments with
    decode chunks so a long (e.g. 1088-token image) prompt never occupies
    the chip for more than one segment at a time (chunked prefill; the
    reference's flash-attn varlen batching plays this role,
    modeling_internlm2.py:509-561). chunk_mask [B, C]: validity inside the
    segment (only a prompt's final segment may have a padded tail).
    compute_logits=False skips the [C, vocab] head matmul on non-final
    segments. Returns ({'last_hidden', 'logits'?}, cache)."""
    x = inputs_embeds
    B, C, H = x.shape
    max_len = cache.k.shape[2]
    qpos = start + jnp.arange(C)
    position_ids = jnp.broadcast_to(qpos[None], (B, C))
    cos, sin = rope_cos_sin(cfg, position_ids, ntk_seq_len=max_len)

    new_mask = jax.lax.dynamic_update_slice_in_dim(
        cache.mask, chunk_mask.astype(cache.mask.dtype), start, axis=1)
    slots = jnp.arange(max_len)
    causal = slots[None, None, :] <= qpos[None, :, None]     # [1, C, max]
    attn = jnp.where(new_mask[:, None, :].astype(bool) & causal,
                     0.0, NEG_INF)

    def body(carry, xs):
        x = carry
        lp, kc, vc = xs
        x_out, kc, vc = _layer_body(cfg, x, lp, cos, sin, attn,
                                    k_cache=kc, v_cache=vc,
                                    write_index=start)
        return x_out, (kc, vc)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v))
    last_hidden = L.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    out = {"last_hidden": last_hidden}
    if compute_logits:
        out["logits"] = L.linear(params["output"], last_hidden)
    new_cache = KVCache(k=new_k, v=new_v, mask=new_mask,
                        index=start + C)
    return out, new_cache


def internlm2_decode_step(params: dict, cfg: InternLM2Config,
                          token_embeds: Array, cache: KVCache,
                          attend_len: Optional[int] = None
                          ) -> Tuple[Array, KVCache]:
    """One decode step: token_embeds [B, 1, H] -> (logits [B, V], cache).

    The new token is written at slot cache.index for every row; its position
    id is the per-row count of valid tokens (correct under left-padding).

    attend_len (static): attention reads only cache slots [0, attend_len)
    — the caller guarantees index < attend_len. As in decode_step_multi,
    the layer scan consumes the cache WINDOW as xs and emits only each
    layer's new [B, n_kv, hd] entry; threading the full cache through
    xs/ys cost ~2x the window traffic regardless of the window.
    """
    B = token_embeds.shape[0]
    max_len = cache.k.shape[2]
    W = max_len if attend_len is None else min(attend_len, max_len)
    position_ids = jnp.sum(cache.mask, axis=-1, keepdims=True)  # [B, 1]
    cos, sin = rope_cos_sin(cfg, position_ids, ntk_seq_len=max_len)

    slot = cache.index
    new_mask = jax.lax.dynamic_update_slice_in_dim(
        cache.mask, jnp.ones((B, 1), jnp.int32), slot, axis=1)
    # attend to all valid cache slots incl. the new token (no causal row
    # constraint needed: one query at the end of the sequence)
    mask = jnp.where(new_mask[:, None, :W].astype(bool), 0.0, NEG_INF)

    x = token_embeds

    def body(carry, xs):
        x = carry
        lp, kc, vc = xs                      # [B, W, n_kv, hd] window
        h = L.rms_norm(lp["attention_norm"], x, eps=cfg.rms_norm_eps)
        qkv = L.linear(lp["wqkv"], h)
        q, k, v = _split_wqkv(qkv, cfg)
        q, k = apply_rope(q, k, cos, sin)
        k1 = k.astype(kc.dtype)              # [B, 1, n_kv, hd]
        v1 = v.astype(vc.dtype)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k1, slot, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v1, slot, axis=1)
        attn = gqa_attention(q, kc.astype(q.dtype), vc.astype(q.dtype),
                             mask, cfg)
        x = x + L.linear(lp["wo"], attn.reshape(B, 1, cfg.hidden_size))
        h = L.rms_norm(lp["ffn_norm"], x, eps=cfg.rms_norm_eps)
        x = x + L.swiglu(lp, h)
        return x, (k1[:, 0], v1[:, 0])

    x, (k_new, v_new) = jax.lax.scan(
        body, x, (params["layers"], cache.k[:, :, :W], cache.v[:, :, :W]))
    last_hidden = L.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    logits = L.linear(params["output"], last_hidden)[:, 0, :]
    new_k = jax.lax.dynamic_update_slice_in_dim(
        cache.k, k_new[:, :, None], slot, axis=2)
    new_v = jax.lax.dynamic_update_slice_in_dim(
        cache.v, v_new[:, :, None], slot, axis=2)
    return logits, KVCache(k=new_k, v=new_v, mask=new_mask, index=slot + 1)


def internlm2_decode_step_win(params: dict, cfg: InternLM2Config,
                              token_embeds: Array, k_win: Array,
                              v_win: Array, mask: Array, active: Array,
                              ntk_seq_len: Optional[int] = None
                              ) -> Tuple[Array, Array, Array, Array]:
    """One continuous-batching decode step over a KV WINDOW — no cache.

    The serving chunk loop (_engine_step) carries (k_win, v_win, mask) as
    scan state and splices the window back into the full cache ONCE per
    chunk. The per-step `cache.at[:, rows, pos].set` of decode_step_multi
    forced XLA to rebuild the full [L, B, max_len, n_kv, hd] cache pair
    every token (~2 GB of copy traffic per b8 step at max_len 2560 —
    measured: step time tracks max_len even at fixed attend_len).

    k_win/v_win [L, B, W, n_kv, hd]; mask [B, max_len] (only [:W] used for
    attention; the write position pos=sum(mask) must be < W). ntk_seq_len:
    the FULL cache length (rope NTK scaling must match the cache-based
    steps, which pass cache.k.shape[2]). Returns (logits [B, V],
    k_new [L, B, n_kv, hd], v_new, new_mask) — the caller scatters
    k_new/v_new into its carried window at [rows, pos].
    """
    B = token_embeds.shape[0]
    rows = jnp.arange(B)
    pos = jnp.sum(mask, axis=-1)                  # [B] next free slot
    W = k_win.shape[2]
    cos, sin = rope_cos_sin(cfg, pos[:, None],
                            ntk_seq_len=ntk_seq_len or W)

    new_mask = mask.at[rows, pos].set(jnp.where(active, 1, mask[rows, pos]))
    attn_mask = jnp.where(new_mask[:, None, :W].astype(bool), 0.0, NEG_INF)

    x = token_embeds

    def body(carry, xs):
        x = carry
        lp, kc, vc = xs                            # [B, W, n_kv, hd]
        h = L.rms_norm(lp["attention_norm"], x, eps=cfg.rms_norm_eps)
        qkv = L.linear(lp["wqkv"], h)
        q, k, v = _split_wqkv(qkv, cfg)
        q, k = apply_rope(q, k, cos, sin)
        k1 = k[:, 0].astype(kc.dtype)
        v1 = v[:, 0].astype(vc.dtype)
        kc = kc.at[rows, pos].set(k1)
        vc = vc.at[rows, pos].set(v1)
        attn = gqa_attention(q, kc.astype(q.dtype), vc.astype(q.dtype),
                             attn_mask, cfg)
        x = x + L.linear(lp["wo"], attn.reshape(B, 1, cfg.hidden_size))
        h = L.rms_norm(lp["ffn_norm"], x, eps=cfg.rms_norm_eps)
        x = x + L.swiglu(lp, h)
        return x, (k1, v1)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params["layers"], k_win,
                                               v_win))
    last_hidden = L.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    logits = L.linear(params["output"], last_hidden)[:, 0, :]
    return logits, k_new, v_new, new_mask


def gqa_attention_decode_split(q: Array, k_win: Array, v_win: Array,
                               k1: Array, v1: Array, mask_win: Array,
                               self_ok: Array, cfg: InternLM2Config) -> Array:
    """Single-query GQA over a FROZEN cache window + the step's own k/v.

    The new token's key/value never touch the cache inside the layer body:
    its score is a rank-1 correction merged into the softmax (flash-style
    two-piece merge). This lets decode read the cache window untouched —
    the in-body `kc.at[rows, pos].set` each layer otherwise forces XLA to
    materialize a fresh [B, W, n_kv, hd] window copy per layer (~400 MB of
    dead HBM writes per b8/W512 step, measured).

    q [B, 1, nh, hd]; k_win/v_win [B, W, n_kv, hd]; k1/v1 [B, n_kv, hd];
    mask_win additive [B, W] (EXCLUDING the new slot); self_ok [B] bool.
    """
    B, _, nh, hd = q.shape
    nkv, g = cfg.num_key_value_heads, cfg.num_kv_groups
    qg = q.reshape(B, nkv, g, hd)
    scale = hd ** -0.5
    s_win = jnp.einsum("bngd,btnd->bngt", qg, k_win.astype(q.dtype),
                       preferred_element_type=jnp.float32) * scale
    s_win = s_win + mask_win[:, None, None, :]
    s_self = jnp.einsum("bngd,bnd->bng", qg, k1.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    s_self = jnp.where(self_ok[:, None, None], s_self, NEG_INF)
    m = jnp.maximum(jnp.max(s_win, axis=-1), s_self)
    p_win = jnp.exp(s_win - m[..., None])
    p_self = jnp.exp(s_self - m)
    denom = jnp.sum(p_win, axis=-1) + p_self
    o = jnp.einsum("bngt,btnd->bngd", p_win.astype(v_win.dtype), v_win,
                   preferred_element_type=jnp.float32)
    o = (o + p_self[..., None] * v1.astype(jnp.float32)[:, :, None, :])
    o = o / denom[..., None]
    return o.reshape(B, 1, nh, hd).astype(q.dtype)


def internlm2_decode_step_multi(params: dict, cfg: InternLM2Config,
                                token_embeds: Array, cache: KVCache,
                                active: Array,
                                attend_len: Optional[int] = None,
                                unroll: bool = False,
                                split_attn: bool = False
                                ) -> Tuple[Array, KVCache]:
    """Continuous-batching decode step: PER-ROW write positions.

    Rows must be right-padded (tokens packed at slots [0, len)); each
    active row writes its token at slot len_b = sum(mask[b]). Inactive
    rows are ignored (their mask is not advanced, so a later admit can
    overwrite the slot). token_embeds [B, 1, H]; active [B] bool.

    attend_len (static): length-bucketed attention window — attention
    reads only cache slots [0, attend_len). Every row's valid length
    (including this step's write) must be <= attend_len; the serving
    engine picks the bucket from host-tracked positions. At b=4/L=24 the
    full 2560-slot read is ~1 GB/step of HBM traffic; short buckets
    reclaim most of it. Returns (logits [B, V], cache).
    """
    B = token_embeds.shape[0]
    rows = jnp.arange(B)
    pos = jnp.sum(cache.mask, axis=-1)            # [B] next free slot
    position_ids = pos[:, None]                   # rope positions
    max_len = cache.k.shape[2]
    W = max_len if attend_len is None else min(attend_len, max_len)
    cos, sin = rope_cos_sin(cfg, position_ids, ntk_seq_len=max_len)

    new_mask = cache.mask.at[rows, pos].set(
        jnp.where(active, 1, cache.mask[rows, pos]))
    if split_attn:
        # window mask EXCLUDES the new slot (handled as the self term)
        old_mask = jnp.where(cache.mask[:, :W].astype(bool), 0.0, NEG_INF
                             ).astype(jnp.float32)
    else:
        attn_mask = jnp.where(new_mask[:, None, :W].astype(bool), 0.0,
                              NEG_INF)

    x = token_embeds

    # The layer scan consumes only the [*, :W] cache WINDOW as xs and
    # emits just each layer's new [B, n_kv, hd] entries as ys; threading
    # the full cache through xs/ys read+wrote ~2 GB/step at max_len=2560
    # (more than the 1.9 GB of weights) and made the attention window
    # irrelevant. One batched scatter installs all layers' new k/v.
    def body(carry, xs):
        x = carry
        lp, kc, vc = xs                            # [B, W, n_kv, hd]
        h = L.rms_norm(lp["attention_norm"], x, eps=cfg.rms_norm_eps)
        qkv = L.linear(lp["wqkv"], h)
        q, k, v = _split_wqkv(qkv, cfg)
        q, k = apply_rope(q, k, cos, sin)
        k1 = k[:, 0].astype(kc.dtype)
        v1 = v[:, 0].astype(vc.dtype)
        if split_attn:
            attn = gqa_attention_decode_split(q, kc, vc, k1, v1, old_mask,
                                              active, cfg)
        else:
            kc = kc.at[rows, pos].set(k1)
            vc = vc.at[rows, pos].set(v1)
            attn = gqa_attention(q, kc.astype(q.dtype), vc.astype(q.dtype),
                                 attn_mask, cfg)
        x = x + L.linear(lp["wo"], attn.reshape(B, 1, cfg.hidden_size))
        h = L.rms_norm(lp["ffn_norm"], x, eps=cfg.rms_norm_eps)
        x = x + L.swiglu(lp, h)
        return x, (k1, v1)

    if unroll:
        # static python loop: every weight slab / cache window is a STATIC
        # slice XLA can fuse into its consumer read, where the scan's
        # per-iteration dynamic-slice of stacked [L, ...] xs materializes
        # a copy of each layer's operands (≈2x weight traffic at decode)
        k_list, v_list = [], []
        for li in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a: a[li], params["layers"])
            x, (k1, v1) = body(x, (lp, cache.k[li, :, :W],
                                   cache.v[li, :, :W]))
            k_list.append(k1)
            v_list.append(v1)
        k_new = jnp.stack(k_list)
        v_new = jnp.stack(v_list)
    else:
        x, (k_new, v_new) = jax.lax.scan(
            body, x, (params["layers"], cache.k[:, :, :W], cache.v[:, :, :W]))
    last_hidden = L.rms_norm(params["norm"], x, eps=cfg.rms_norm_eps)
    logits = L.linear(params["output"], last_hidden)[:, 0, :]
    new_k = cache.k.at[:, rows, pos].set(k_new)   # [L, B, n_kv, hd]
    new_v = cache.v.at[:, rows, pos].set(v_new)
    return logits, KVCache(k=new_k, v=new_v, mask=new_mask,
                           index=cache.index)
