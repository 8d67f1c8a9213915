"""Test environment: force CPU with an 8-device virtual mesh.

The axon sitecustomize registers the TPU backend in every python process
regardless of JAX_PLATFORMS, so the env var alone is not enough — we must
also flip jax_platforms after import. TPU compiles are slow and single-chip;
distributed tests shard over the fake CPU mesh instead.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="session")
def goldens():
    """Load golden .npz fixtures generated from the torch reference."""

    def _load(name: str) -> dict:
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name} not generated")
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    return _load
