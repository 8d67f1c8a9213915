"""On-chip A/B of the kernel GELU variants inside the decode megakernel.

The fused decode chunk pushes ~805M GELU activations through the VPU
(4x upscale u1 [4096,256] + u2 [4096,512] per prompt x 256 prompts); the
tanh intrinsic is transcendental microcode, the `poly` variant
(ops/pallas/decoder._gelu) is a transcendental-free odd minimax
polynomial (max |err| 4.9e-4 vs the tanh form). `id` replaces GELU with
identity to expose the ceiling (NOT numerically valid — timing only).

The gate is read at trace time, so each variant gets its own jit.

Usage: python benchmarks/ablate_gelu.py [ppb] [reps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from profile_twt_kernel import time_chained  # noqa: E402


def main():
    ppb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from ullsam_tpu.core.config import SamConfig
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.sam import mask_decoder as MD
    from ullsam_tpu.ops.pallas import decoder as PD

    cfg = SamConfig()
    mcfg = cfg.mask_decoder
    dec = cast_floating(MD.mask_decoder_init(jax.random.PRNGKey(0), mcfg),
                        jnp.bfloat16)
    rng = np.random.RandomState(0)
    N, C = 4096, 256
    src = jnp.asarray(rng.randn(1, N, C), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, N, C), jnp.bfloat16)
    toks = jnp.asarray(rng.randn(ppb, 7, C), jnp.bfloat16)
    views = MD._upscale_weight_views(dec["upscale"])
    packed = PD.pack_hyper_mlps([dec["hyper_mlps"][i] for i in (1, 2, 3)],
                                dtype=jnp.bfloat16)

    def run(toks, tw, src, pe):
        return PD.fused_decode_masks(
            tw, views, packed, src, pe, toks,
            heads=mcfg.transformer_num_heads,
            mlp_dim=mcfg.transformer_mlp_dim, eps=mcfg.ln_eps,
            W=64, nm=3, thr=0.0, off=1.0, m_lo=1)

    base = {}
    for mode in ("tanh", "poly", "id", "tanh"):
        os.environ["ULLSAM_KERNEL_GELU"] = mode
        try:
            t = time_chained(run, reps, toks, dec["transformer"], src, pe)
            tag = ""
            if mode in base:
                tag = f"  (repeat; drift {t - base[mode]:+.2f})"
            else:
                base[mode] = t
            print(f"decode chunk gelu={mode:4s}: {t:8.2f} ms{tag}",
                  flush=True)
        except Exception as e:  # pragma: no cover
            print(f"decode chunk gelu={mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    os.environ["ULLSAM_KERNEL_GELU"] = "tanh"

    # numerics: poly vs tanh on the real chunk outputs
    for mode in ("tanh", "poly"):
        os.environ["ULLSAM_KERNEL_GELU"] = mode
        q, cols, counts, _, _ = jax.jit(run)(toks, dec["transformer"],
                                             src, pe)
        if mode == "tanh":
            ref_cols = np.asarray(cols[:4], np.float32)
        else:
            dev = np.abs(np.asarray(cols[:4], np.float32) - ref_cols)
            print(f"cols max |poly - tanh| = {dev.max():.4f} "
                  f"(logit scale; bf16 eps at |x|=1 is 0.0039)")
    os.environ["ULLSAM_KERNEL_GELU"] = "tanh"


if __name__ == "__main__":
    main()
