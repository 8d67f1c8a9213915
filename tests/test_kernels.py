"""Pallas kernel numerics in interpreter mode (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ullsam_tpu.ops.pallas.flash_attention import (_vit_attention_xla,
                                                   llm_flash_attention,
                                                   reference_attention,
                                                   vit_flash_attention)


def test_llm_flash_attention_segments_and_causal():
    rng = np.random.RandomState(0)
    B, S, nh, nkv, D = 2, 300, 8, 4, 64
    q = jnp.asarray(rng.randn(B, S, nh, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, nkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, nkv, D), jnp.float32)
    seg = np.ones((B, S), np.int32)
    seg[0, :50] = 0       # left padding
    seg[1, 200:] = 2      # packed second segment
    seg = jnp.asarray(seg)
    ref = reference_attention(q, k, v, seg, seg, nkv, causal=True)
    with pltpu.force_tpu_interpret_mode():
        out = llm_flash_attention(q, k, v, seg, seg, nkv, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vit_flash_attention_and_grads():
    rng = np.random.RandomState(1)
    B, KH, KW, D = 2, 16, 16, 64
    N = KH * KW
    args = [jnp.asarray(rng.randn(B, N, D), jnp.float32) for _ in range(3)]
    args += [jnp.asarray(rng.randn(B, N, KH) * 0.3, jnp.float32),
             jnp.asarray(rng.randn(B, N, KW) * 0.3, jnp.float32)]
    with pltpu.force_tpu_interpret_mode():
        out = vit_flash_attention(*args, 128, 128)
        ref = _vit_attention_xla(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-6)
        g = jax.grad(lambda *a: jnp.sum(vit_flash_attention(*a, 128, 128)
                                        ** 2), argnums=(0, 1, 2, 3, 4)
                     )(*args)
        gref = jax.grad(lambda *a: jnp.sum(_vit_attention_xla(*a) ** 2),
                        argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(["dq", "dk", "dv", "drel_h", "drel_w"],
                              g, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, err_msg=name)


def test_vit_flash_fused_backward_optin():
    """The fused pallas backward (opt-in) matches the XLA backward."""
    import ullsam_tpu.ops.pallas.flash_attention as FA

    rng = np.random.RandomState(2)
    B, KH, KW, D = 2, 16, 16, 64
    N = KH * KW
    args = [jnp.asarray(rng.randn(B, N, D) * 0.3, jnp.float32)
            for _ in range(3)]
    args += [jnp.asarray(rng.randn(B, N, KH) * 0.2, jnp.float32),
             jnp.asarray(rng.randn(B, N, KW) * 0.2, jnp.float32)]
    old = FA.USE_FUSED_BWD
    FA.USE_FUSED_BWD = True
    try:
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda *a: jnp.sum(
                FA.vit_flash_attention(*a, 128, 128) ** 2),
                argnums=(0, 1, 2, 3, 4))(*args)
            gref = jax.grad(lambda *a: jnp.sum(
                FA._vit_attention_xla(*a) ** 2),
                argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(["dq", "dk", "dv", "drel_h", "drel_w"],
                              g, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, err_msg=name)
    finally:
        FA.USE_FUSED_BWD = old
