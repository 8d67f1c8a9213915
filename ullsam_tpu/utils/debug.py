"""Debugging utilities: NaN/Inf detection, pytree diffing, shape dumps.

The reference has no sanitizers (SURVEY §5); its closest artifacts are
DDP static-graph workarounds and cuda empty_cache hygiene. The JAX-native
equivalents: deterministic PRNG everywhere, jit-boundary checks here, and
`jax.config.update("jax_debug_nans", True)` for hard failures.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ullsam_tpu.core.tree import flatten_with_paths


def find_nonfinite(tree: Any) -> List[str]:
    """Paths of leaves containing NaN/Inf (host sync; use in debugging)."""
    bad = []
    for path, leaf in flatten_with_paths(tree).items():
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(path)
    return bad


def assert_finite(tree: Any, name: str = "tree") -> None:
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def check_finite_jit(tree: Any) -> jax.Array:
    """Trace-safe: scalar bool (all leaves finite); combine with
    jax.debug.print or lax.cond inside jitted steps."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)]
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok &= jnp.all(jnp.isfinite(leaf))
    return ok


def tree_summary(tree: Any, max_rows: int = 0) -> str:
    """Human-readable param table: path, shape, dtype, norm."""
    rows = []
    for path, leaf in flatten_with_paths(tree).items():
        arr = np.asarray(leaf)
        norm = float(np.linalg.norm(arr.astype(np.float64))) \
            if np.issubdtype(arr.dtype, np.floating) else float("nan")
        rows.append((path, tuple(arr.shape), str(arr.dtype), norm))
    if max_rows:
        rows = rows[:max_rows]
    width = max((len(r[0]) for r in rows), default=4)
    lines = [f"{p:<{width}} {str(s):>18} {d:>9} |x|={n:.4g}"
             for p, s, d, n in rows]
    return "\n".join(lines)


def tree_diff(a: Any, b: Any, atol: float = 0.0) -> Dict[str, float]:
    """Max abs difference per leaf path where it exceeds atol."""
    fa, fb = flatten_with_paths(a), flatten_with_paths(b)
    out = {}
    for path in fa:
        if path not in fb:
            out[path] = float("inf")
            continue
        d = float(np.max(np.abs(np.asarray(fa[path], np.float64)
                                - np.asarray(fb[path], np.float64))))
        if d > atol:
            out[path] = d
    return out
