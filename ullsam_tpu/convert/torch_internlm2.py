"""Converter: InternLM2 HF/torch state dicts -> stacked ullsam_tpu params.

Reference layouts (modeling_internlm2.py): model.tok_embeddings.weight,
model.layers.{i}.attention.{wqkv,wo}.weight, .feed_forward.{w1,w2,w3}.weight,
.attention_norm/.ffn_norm.weight, model.norm.weight, output.weight.
Also handles the uLLSAM checkpoint prefix "language_model."
(train_joint_v2.py:1490-1556 remaps that prefix when loading safetensors).

Our layers are stacked along a leading layer axis for lax.scan.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ullsam_tpu.core.config import InternLM2Config

ArrayDict = Mapping[str, np.ndarray]


def convert_internlm2_state_dict(sd: ArrayDict, cfg: InternLM2Config,
                                 prefix: str = "") -> dict:
    p = prefix
    nl = cfg.num_hidden_layers

    def stack(fmt: str, transpose: bool) -> np.ndarray:
        arrs = [sd[fmt.format(i=i)] for i in range(nl)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.ascontiguousarray(np.stack(arrs, axis=0))

    layers = {
        "attention_norm": {
            "scale": stack(p + "model.layers.{i}.attention_norm.weight", False)},
        "wqkv": {"kernel": stack(p + "model.layers.{i}.attention.wqkv.weight", True)},
        "wo": {"kernel": stack(p + "model.layers.{i}.attention.wo.weight", True)},
        "ffn_norm": {
            "scale": stack(p + "model.layers.{i}.ffn_norm.weight", False)},
        "w1": {"kernel": stack(p + "model.layers.{i}.feed_forward.w1.weight", True)},
        "w3": {"kernel": stack(p + "model.layers.{i}.feed_forward.w3.weight", True)},
        "w2": {"kernel": stack(p + "model.layers.{i}.feed_forward.w2.weight", True)},
    }
    if cfg.bias:
        layers["wqkv"]["bias"] = stack(
            p + "model.layers.{i}.attention.wqkv.bias", False)
        layers["wo"]["bias"] = stack(
            p + "model.layers.{i}.attention.wo.bias", False)
    return {
        "tok_embeddings": sd[p + "model.tok_embeddings.weight"],
        "layers": layers,
        "norm": {"scale": sd[p + "model.norm.weight"]},
        "output": {"kernel": np.ascontiguousarray(sd[p + "output.weight"].T)},
    }


def load_internlm2_safetensors(model_dir: str, cfg: InternLM2Config,
                               prefix: str = "") -> dict:
    """Load from a HF model directory of .safetensors shards."""
    import glob
    import json
    import os

    from safetensors import safe_open

    sd: Dict[str, np.ndarray] = {}
    for shard in sorted(glob.glob(os.path.join(model_dir, "*.safetensors"))):
        with safe_open(shard, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    return convert_internlm2_state_dict(sd, cfg, prefix=prefix)
