"""Deterministic synthetic weights shared by golden generation and tests.

Flagship-shape parity goldens (full-size SAM ViT-B, real-dims InternLM2)
would need hundreds of MB if the weights were stored. Instead the golden
records only a (key, shape) manifest plus reference OUTPUTS, and both sides
— the torch reference at generation time and the JAX test at run time —
synthesize bit-identical weights from the key name alone:

  seed  = crc32(key)
  base  = RandomState(seed).standard_normal(shape)
  value = 1 + 0.02*base   if the key is a 1-D "*weight" (norm gains)
          0.02*base       otherwise
rounded through fp16 so both frameworks load the exact same floats.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Sequence, Tuple

import numpy as np


def synth_array(key: str, shape: Sequence[int]) -> np.ndarray:
    seed = zlib.crc32(key.encode()) & 0xFFFFFFFF
    base = np.random.RandomState(seed).standard_normal(shape)
    if key.endswith("weight") and len(shape) == 1:
        arr = 1.0 + 0.02 * base  # norm gains stay near identity
    else:
        arr = 0.02 * base
    return arr.astype(np.float16).astype(np.float32)


def synth_state_dict(manifest: Sequence[Tuple[str, Sequence[int]]]
                     ) -> Dict[str, np.ndarray]:
    return {k: synth_array(k, s) for k, s in manifest}


# -- manifest <-> npz encoding (no pickle) ----------------------------------


def manifest_to_arrays(manifest: Sequence[Tuple[str, Sequence[int]]]):
    keys = np.asarray([k for k, _ in manifest])
    rank = max(len(s) for _, s in manifest)
    shapes = np.full((len(manifest), rank), -1, np.int64)
    for i, (_, s) in enumerate(manifest):
        shapes[i, :len(s)] = s
    return keys, shapes


def manifest_from_arrays(keys: np.ndarray, shapes: np.ndarray
                         ) -> List[Tuple[str, Tuple[int, ...]]]:
    return [(str(k), tuple(int(d) for d in row if d >= 0))
            for k, row in zip(keys, shapes)]
