"""InternLM2 sequence classification head.

Behavioral reference: InternLM2ForSequenceClassification
(modeling_internlm2.py:1311-1415): a bias-free linear score head over the
LAST NON-PAD token's hidden state (pad located via pad_token_id), with the
standard regression/single-/multi-label loss selection. Unused by uLLSAM
but part of the reference inventory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternLM2Config
from ullsam_tpu.models.internlm2.model import internlm2_forward
from ullsam_tpu.ops import layers as L

Array = jax.Array


def classification_head_init(key, cfg: InternLM2Config, num_labels: int) -> dict:
    return {"score": L.linear_init(key, cfg.hidden_size, num_labels,
                                   use_bias=False)}


def internlm2_classify(params: dict, head: dict, cfg: InternLM2Config,
                       input_ids: Array,
                       attention_mask: Optional[Array] = None,
                       labels: Optional[Array] = None,
                       problem_type: str = "single_label_classification"
                       ) -> dict:
    """Returns {'logits': [B, num_labels], 'loss': optional scalar}.

    Sequence logit = score(last non-pad hidden state), mirroring the
    reference's pad-token search (:1371-1381).
    """
    B, S = input_ids.shape
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    out = internlm2_forward(params, cfg, input_ids=input_ids,
                            attention_mask=attention_mask)
    # hidden at the last valid position per row
    last = S - 1 - jnp.argmax(attention_mask[:, ::-1], axis=-1)
    hidden = out["last_hidden"][jnp.arange(B), last]
    logits = L.linear(head["score"], hidden).astype(jnp.float32)

    result = {"logits": logits}
    if labels is not None:
        if problem_type == "regression":
            result["loss"] = jnp.mean((logits.squeeze(-1) - labels) ** 2)
        elif problem_type == "multi_label_classification":
            z = logits
            y = labels.astype(jnp.float32)
            bce = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            result["loss"] = jnp.mean(bce)
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            result["loss"] = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1))
    return result
