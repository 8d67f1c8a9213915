"""Stage-level timing of the ViT GLOBAL attention layer on the real TPU.

The 4 ViT-H global blocks cost ~4 ms/layer (profile_encode.py) against a
~1.2 ms matmul floor; this isolates where: qkv projection, head-split
relayout, decomposed rel-pos expansion, the flash kernel itself, the
output merge + proj.

Usage: python benchmarks/profile_global_attn.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache
from ullsam_tpu.core.config import sam_vit_h
from ullsam_tpu.models.sam import image_encoder as IE
from ullsam_tpu.ops import layers as L
from ullsam_tpu.ops import attention as A

enable_compilation_cache()


def chained(fn, reps):
    @jax.jit
    def run(x, *args):
        def body(i, c):
            y = fn(c, *args)
            if y.shape == c.shape and y.dtype == c.dtype:
                return c * 0.0 + y
            return c + (jnp.sum(y.astype(jnp.float32)) * 1e-9).astype(c.dtype)
        return jax.lax.fori_loop(0, reps, body, x)
    return run


def timeit(fn, *args, iters=3):
    r = fn(*args)
    np.asarray(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main(reps=16):
    cfg = sam_vit_h().vit
    C, nh, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    H = W = cfg.grid_size
    N = H * W
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    params = IE._attn_init(key, cfg, (H, W))
    params = jax.tree.map(
        lambda a: (jnp.asarray(rng.randn(*a.shape) * 0.02, jnp.bfloat16)
                   if a.dtype != jnp.int32 else a), params)
    x = jnp.asarray(rng.randn(1, H, W, C) * 0.1, jnp.bfloat16)
    print(f"vit_h global: N={N} nh={nh} hd={hd} reps={reps}")

    # full attention layer (what _block_apply calls)
    fn = chained(lambda y, p: IE._vit_attention(p, y, cfg), reps)
    print(f"full _vit_attention:     {timeit(fn, x, params) / reps:7.3f} ms")

    # qkv projection only
    fn = chained(lambda y, p: L.linear(p["qkv"], y), reps)
    print(f"qkv linear:              {timeit(fn, x, params) / reps:7.3f} ms")

    # qkv + head-split relayout
    def qkv_split(y, p):
        qkv = L.linear(p["qkv"], y).reshape(1, N, 3, nh, hd)
        return qkv.transpose(2, 0, 3, 1, 4).reshape(3, nh, N, hd)
    fn = chained(qkv_split, reps)
    print(f"qkv + head split:        {timeit(fn, x, params) / reps:7.3f} ms")

    q = jnp.asarray(rng.randn(nh, N, hd) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(nh, N, hd) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(nh, N, hd) * 0.1, jnp.bfloat16)

    # rel-pos expansion only
    def rel(qq, p):
        rel_h, rel_w = A.decomposed_rel_pos_terms(
            qq, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W))
        return rel_h.reshape(nh, N, H) + 0.0 * rel_w.sum()
    fn = chained(rel, reps)
    print(f"rel-pos expansion:       {timeit(fn, q, params) / reps:7.3f} ms")

    # flash kernel only (rel factors precomputed)
    from ullsam_tpu.ops.pallas.flash_attention import vit_flash_attention
    rh = jnp.asarray(rng.randn(nh, N, H) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.randn(nh, N, W) * 0.1, jnp.float32)
    fn = chained(lambda qq, kk, vv, a, b: vit_flash_attention(qq, kk, vv, a, b), reps)
    print(f"flash kernel only:       {timeit(fn, q, k, v, rh, rw) / reps:7.3f} ms")

    # flash at block 512
    fn = chained(lambda qq, kk, vv, a, b: vit_flash_attention(
        qq, kk, vv, a, b, 512, 512), reps)
    print(f"flash kernel bq=bk=512:  {timeit(fn, q, k, v, rh, rw) / reps:7.3f} ms")

    # merge + out proj
    def merge(o, p):
        y = o.reshape(1, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(1, H, W, C)
        return L.linear(p["proj"], y)
    fn = chained(merge, reps)
    print(f"merge + out proj:        {timeit(fn, q, params) / reps:7.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
