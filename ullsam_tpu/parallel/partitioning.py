"""Mesh construction and parameter sharding rules.

The reference scales with DDP-over-NCCL only (train_joint_v2.py:1267-1277,
1754-1761). Here parallelism is declarative: a Mesh with ('data', 'model')
axes, regex rules mapping parameter paths to PartitionSpecs (Megatron-style
tensor parallel for the LLM and ViT), and batch sharding over 'data'. XLA
inserts the collectives (psum over ICI) — no hand-written communication.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ullsam_tpu.core.tree import map_with_paths

# (path regex, spec). First match wins; default replicated.
# Paths are dotted: e.g. "llm.layers.wqkv.kernel", "sam.image_encoder...".
PARAM_RULES: List[Tuple[str, P]] = [
    # InternLM2 (stacked [L, ...]): Megatron TP — column-parallel in,
    # row-parallel out. wqkv's packed groups split cleanly when
    # num_key_value_heads % tp == 0.
    (r"llm\.layers\.wqkv\.kernel", P(None, None, "model")),
    (r"llm\.layers\.wqkv\.bias", P(None, "model")),
    (r"llm\.layers\.wo\.kernel", P(None, "model", None)),
    (r"llm\.layers\.w[13]\.kernel", P(None, None, "model")),
    (r"llm\.layers\.w2\.kernel", P(None, "model", None)),
    (r"llm\.tok_embeddings", P("model", None)),
    (r"llm\.output\.kernel", P(None, "model")),
    # SAM ViT blocks
    (r"sam\.image_encoder\.blocks\.\d+\.attn\.qkv\.kernel", P(None, "model")),
    (r"sam\.image_encoder\.blocks\.\d+\.attn\.qkv\.bias", P("model",)),
    (r"sam\.image_encoder\.blocks\.\d+\.attn\.proj\.kernel", P("model", None)),
    (r"sam\.image_encoder\.blocks\.\d+\.mlp\.fc1\.kernel", P(None, "model")),
    (r"sam\.image_encoder\.blocks\.\d+\.mlp\.fc1\.bias", P("model",)),
    (r"sam\.image_encoder\.blocks\.\d+\.mlp\.fc2\.kernel", P("model", None)),
    # fusion projectors
    (r"mlp[12]\.fc1\.kernel", P(None, "model")),
    (r"mlp[12]\.fc1\.bias", P("model",)),
    (r"mlp[12]\.fc2\.kernel", P("model", None)),
]

BATCH_SPEC = P("data")


def create_mesh(dp: int, tp: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """('data', 'model') mesh. dp*tp must equal the device count used."""
    devices = list(devices if devices is not None else jax.devices())[: dp * tp]
    if len(devices) != dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def param_spec(path: str, ndim: int) -> P:
    for pattern, spec in PARAM_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_specs(params) -> dict:
    """Pytree of PartitionSpecs matching `params` (fusion or sub-model)."""
    return map_with_paths(lambda p, x: param_spec(p, np.ndim(x)), params)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharded axes whose dimension isn't divisible by the mesh axis
    size (e.g. the 92553 vocab under tp=2) — replicate those dims instead."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis]
        if i < len(shape) and shape[i] % size == 0:
            out.append(axis)
        else:
            out.append(None)
    return P(*out)


def shard_params(params, mesh: Mesh):
    """device_put each param with its NamedSharding."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _fit_spec(s, np.shape(x), mesh))),
        params, specs)


def shard_batch(batch, mesh: Mesh):
    """Shard every batch leaf over the 'data' axis (leading dim)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, BATCH_SPEC)), batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
