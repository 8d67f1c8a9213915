"""InternViT encoder shape/numerics smoke (no reference modeling code
exists to golden against — the reference carries only the config)."""

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import InternViTConfig
from ullsam_tpu.models.internvit import internvit_apply, internvit_init


def test_internvit_forward():
    cfg = InternViTConfig(image_size=56, patch_size=14, hidden_size=64,
                          num_attention_heads=4, num_hidden_layers=2,
                          intermediate_size=128)
    params = internvit_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 56, 56, 3), jnp.float32)
    out = internvit_apply(params, x, cfg)
    assert out.shape == (2, 1 + 16, 64)
    assert bool(jnp.isfinite(out).all())
    # qk-norm off still works
    cfg2 = InternViTConfig(image_size=56, patch_size=14, hidden_size=64,
                           num_attention_heads=4, num_hidden_layers=2,
                           intermediate_size=128, qk_normalization=False)
    p2 = internvit_init(jax.random.PRNGKey(1), cfg2)
    out2 = internvit_apply(p2, x, cfg2)
    assert out2.shape == (2, 17, 64)
