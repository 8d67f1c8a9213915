"""Pallas TPU kernels (flash attention, fused SAM decoder).

Shared backend predicate: every kernel gate in the package must use
`backend_ok()` so that a platform reporting 'axon' (the TPU relay) gets
the same kernel selection as plain 'tpu' (ADVICE r2: inconsistent gating
silently disabled the windowed ViT kernel on the relay).
"""
import jax


def backend_ok() -> bool:
    """True when the default backend is a real TPU (incl. the axon relay)."""
    return jax.default_backend() in ("tpu", "axon")
