"""Stage-level timing of the AMG decode chunk on the real TPU.

Times (each separately jitted, so boundaries differ slightly from the fused
sweep, but the split shows where the ms go):
  - full chunk: decode_masks(256 prompts) + stability/boxes at low res
  - two-way transformer only
  - upscale+hypernet only
  - iou head + prompt encoding (tiny)

Usage: python benchmarks/profile_decode.py [vit_h] [ppb]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import SamConfig
from ullsam_tpu.core.tree import cast_floating
from ullsam_tpu.models.sam import build_sam
from ullsam_tpu.models.sam import sam as S
from ullsam_tpu.models.sam import mask_decoder as MD
from ullsam_tpu.models.sam import prompt_encoder as PE
from ullsam_tpu.models.sam.two_way_transformer import two_way_transformer_apply
from ullsam_tpu.inference.amg import calculate_stability_score, batched_mask_to_box


def sync(x):
    leaves = jax.tree.leaves(x)
    return np.asarray(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    ppb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg, params = build_sam(variant)
    params = cast_floating(params, jnp.bfloat16)
    dec = params["mask_decoder"]
    mcfg = cfg.mask_decoder

    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(1, 64, 64, 256), jnp.bfloat16)
    pts = jnp.asarray(rng.rand(ppb, 1, 2) * 1024, jnp.float32)
    labels = jnp.ones((ppb, 1), jnp.int32)

    @functools.partial(jax.jit, static_argnames=())
    def full_chunk(params, emb, pts, labels):
        low_res, iou = S.decode_masks(params, cfg, emb,
                                      points=(pts, labels),
                                      multimask_output=True)
        M = low_res.shape[1]
        flat = low_res.reshape(ppb * M, *low_res.shape[2:])
        stability = calculate_stability_score(flat, cfg.mask_threshold, 1.0)
        boxes = batched_mask_to_box(flat > cfg.mask_threshold)
        return flat.astype(jnp.bfloat16), iou.reshape(-1), stability, boxes

    @jax.jit
    def decode_only(params, emb, pts, labels):
        low_res, iou = S.decode_masks(params, cfg, emb,
                                      points=(pts, labels),
                                      multimask_output=True)
        return low_res.astype(jnp.bfloat16), iou

    # building blocks
    sparse, dense = PE.prompt_encoder_apply(
        params["prompt_encoder"], cfg.prompt_encoder,
        points=(pts, labels))
    dense = dense[:1]
    image_pe = PE.get_dense_pe(params["prompt_encoder"], cfg.prompt_encoder)
    d = mcfg.transformer_dim
    nm = mcfg.num_mask_tokens
    output_tokens = jnp.concatenate(
        [dec["iou_token"], dec["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (ppb, 1 + nm, d))
    tokens = jnp.concatenate(
        [output_tokens.astype(sparse.dtype), sparse], axis=1)
    src = emb + dense.astype(emb.dtype)

    @jax.jit
    def twt_only(dec, src, image_pe, tokens):
        hs, keys = two_way_transformer_apply(dec["transformer"], mcfg, src,
                                             image_pe, tokens)
        return hs, keys

    hs, keys = jax.block_until_ready(twt_only(dec, src, image_pe, tokens))
    from ullsam_tpu.ops import layers as L
    hyper_in = jnp.stack(
        [L.mlp_stack(dec["hyper_mlps"][i], hs[:, 1 + i, :])
         for i in range(nm)], axis=1)

    @jax.jit
    def upscale_only(dec, hyper_in, keys):
        return MD._upscale_hypernet_block(dec["upscale"], hyper_in, keys,
                                          64, 64)

    @jax.jit
    def stats_only(flat):
        stability = calculate_stability_score(flat, cfg.mask_threshold, 1.0)
        boxes = batched_mask_to_box(flat > cfg.mask_threshold)
        return stability, boxes

    flat = jnp.asarray(rng.randn(ppb * 3, 256, 256), jnp.bfloat16)

    print(f"variant={variant} ppb={ppb} dtype=bf16")
    print(f"full chunk (decode+stats): {timeit(full_chunk, params, emb, pts, labels):8.2f} ms")
    print(f"decode only:               {timeit(decode_only, params, emb, pts, labels):8.2f} ms")
    print(f"two-way transformer:       {timeit(twt_only, dec, src, image_pe, tokens):8.2f} ms")
    print(f"upscale+hypernet:          {timeit(upscale_only, dec, hyper_in, keys):8.2f} ms")
    print(f"stats (stability+boxes):   {timeit(stats_only, flat):8.2f} ms")


if __name__ == "__main__":
    main()
