"""Parameter-pytree utilities: path flattening, dtype casting, counting."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_with_paths(tree: Any, sep: str = ".") -> Dict[str, Any]:
    """Flatten a pytree into {dotted/indexed path: leaf}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                keys.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                keys.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        flat[sep.join(keys)] = leaf
    return flat


def map_with_paths(fn: Callable[[str, Any], Any], tree: Any, sep: str = ".") -> Any:
    """tree_map where fn also receives the dotted path of each leaf."""

    def _fn(path, leaf):
        keys = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                keys.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                keys.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        return fn(sep.join(keys), leaf)

    return jax.tree_util.tree_map_with_path(_fn, tree)


def param_count(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def cast_floating(tree: Any, dtype: jnp.dtype) -> Any:
    """Cast floating-point leaves to `dtype`, leaving ints/bools untouched."""

    def _cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
