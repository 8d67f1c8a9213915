"""Stage-level timing of the ViT-H image encoder on the real TPU.

Times the full encode plus isolated pieces of one windowed block run,
each repeated K times INSIDE one jit (carry-chained so XLA cannot dead-
code or overlap across iterations) — single-dispatch timing is hopeless
through the relay (30-400 ms round trips).

Usage: python benchmarks/profile_encode.py [vit_h] [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.core.tree import cast_floating
from ullsam_tpu.models.sam import build_sam
from ullsam_tpu.models.sam import sam as S
from ullsam_tpu.models.sam import image_encoder as IE
from ullsam_tpu.ops import layers as L


def sync(x):
    leaves = jax.tree.leaves(x)
    return np.asarray(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters * 1000


def chained(fn, reps):
    """Repeat fn K times with a data dependency between iterations."""
    def run(x, *args):
        def body(i, c):
            y = fn(c, *args)
            # keep shapes: fold the output back into the carry shape
            return c * 0.0 + y if y.shape == c.shape else c + jnp.sum(
                y.astype(c.dtype)) * 1e-9
        return jax.lax.fori_loop(0, reps, body, x)
    return jax.jit(run)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg, params = build_sam(variant)
    vcfg = cfg.vit
    params = cast_floating(params, jnp.bfloat16)
    enc = params["image_encoder"]
    C, nh, hd = vcfg.embed_dim, vcfg.num_heads, vcfg.head_dim
    ws = vcfg.window_size

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 1024, 1024, 3), jnp.bfloat16)

    @jax.jit
    def full_encode(params, img):
        return IE.image_encoder_apply(params, img, vcfg)

    print(f"variant={variant} C={C} nh={nh} depth={vcfg.depth} reps={reps}")
    t_full = timeit(full_encode, enc, img)
    print(f"full encode:               {t_full:8.2f} ms")

    # windowed-layout activation: [nw, ws, ws, C], 64x64 grid, pad to 70
    nw = (70 // ws) ** 2
    xw = jnp.asarray(rng.randn(nw, ws, ws, C), jnp.bfloat16)
    blk = jax.tree.map(lambda a: a, enc["blocks"][0])

    # one full windowed block
    pm = None
    blk_fn = chained(lambda y, p: IE._block_windowed_prepartitioned(
        p, y, vcfg, pm), reps)
    print(f"windowed block:            {timeit(blk_fn, xw, blk) / reps:8.3f} ms/layer")

    # LN only
    ln_fn = chained(lambda y, p: L.layer_norm(p, y, eps=vcfg.ln_eps), reps)
    print(f"layer_norm:                {timeit(ln_fn, xw, blk['norm1']) / reps:8.3f} ms/call")

    # attention only (packed window kernel)
    at_fn = chained(lambda y, p: IE._vit_attention(p, y, vcfg), reps)
    print(f"window attention(+qkv+pr): {timeit(at_fn, xw, blk['attn']) / reps:8.3f} ms/call")

    # MLP only, exact erf
    mlp_fn = chained(lambda y, p: L.mlp_block(p, y), reps)
    print(f"mlp (exact erf):           {timeit(mlp_fn, xw, blk['mlp']) / reps:8.3f} ms/call")

    # MLP, tanh approx
    mlp_t = chained(lambda y, p: L.mlp_block(
        p, y, act=lambda a: jax.nn.gelu(a, approximate=True)), reps)
    print(f"mlp (tanh):                {timeit(mlp_t, xw, blk['mlp']) / reps:8.3f} ms/call")

    # MLP matmuls only (no act) = matmul roofline proxy
    mlp_n = chained(lambda y, p: L.linear(p["fc2"], L.linear(p["fc1"], y)), reps)
    print(f"mlp (no act):              {timeit(mlp_n, xw, blk['mlp']) / reps:8.3f} ms/call")

    # global block (4096 tokens)
    xg = jnp.asarray(rng.randn(1, 64, 64, C), jnp.bfloat16)
    gi = vcfg.global_attn_indexes[0]
    gblk = jax.tree.map(lambda a: a, enc["blocks"][gi])
    gb_fn = chained(lambda y, p: IE._block_apply(p, y, vcfg, 0), max(reps // 4, 1))
    print(f"global block:              {timeit(gb_fn, xg, gblk) / max(reps // 4, 1):8.3f} ms/layer")

    # neck
    nreps = max(reps // 4, 1)
    nk_fn = chained(lambda y, n: (
        L.layer_norm(n["ln2"], L.conv2d(n["conv2"], L.layer_norm(
            n["ln1"], L.conv2d(n["conv1"], y), eps=1e-6),
            padding="SAME"), eps=1e-6)).astype(y.dtype), nreps)
    # carry shape mismatch (C->256): wrap via sum-fold path in chained
    print(f"neck:                      {timeit(nk_fn, xg, enc['neck']) / nreps:8.3f} ms")

    # patch embed
    pe_fn = chained(lambda y, p: L.conv2d(
        p, y, stride=(vcfg.patch_size, vcfg.patch_size)), 4)
    print(f"patch embed (x4):          {timeit(pe_fn, img, enc['patch_embed']) / 4:8.3f} ms")


if __name__ == "__main__":
    main()
