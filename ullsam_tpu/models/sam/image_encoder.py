"""SAM ViTDet image encoder, TPU-native.

Behavioral reference: /root/reference/modeling/image_encoder.py (ViT with
windowed attention except at global layers, decomposed relative-position
bias, conv neck to 256ch). Re-designed for XLA: NHWC layouts, static window
partition as reshape/transpose, rel-pos gathers folded to trace-time
constants, attention pluggable (XLA einsum fallback or Pallas flash kernel).

Input:  [B, img, img, 3]  (NHWC, already normalized)
Output: [B, grid, grid, out_chans]  (NHWC; reference returns NCHW)
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ullsam_tpu.core.config import ViTConfig
from ullsam_tpu.ops import layers as L
from ullsam_tpu.ops import attention as A

Array = jax.Array


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _attn_init(key, cfg: ViTConfig, input_size: Tuple[int, int]) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "qkv": L.linear_init(k1, cfg.embed_dim, cfg.embed_dim * 3,
                             use_bias=cfg.qkv_bias),
        "proj": L.linear_init(k2, cfg.embed_dim, cfg.embed_dim),
    }
    if cfg.use_rel_pos:
        # zero-init per reference (rel_pos_zero_init=True, build_sam.py:76)
        p["rel_pos_h"] = jnp.zeros((2 * input_size[0] - 1, cfg.head_dim))
        p["rel_pos_w"] = jnp.zeros((2 * input_size[1] - 1, cfg.head_dim))
    return p


def _block_init(key, cfg: ViTConfig, window_size: int) -> dict:
    k1, k2 = jax.random.split(key)
    input_size = ((cfg.grid_size, cfg.grid_size) if window_size == 0
                  else (window_size, window_size))
    return {
        "norm1": L.layer_norm_init(cfg.embed_dim),
        "attn": _attn_init(k1, cfg, input_size),
        "norm2": L.layer_norm_init(cfg.embed_dim),
        "mlp": L.mlp_block_init(k2, cfg.embed_dim,
                                int(cfg.embed_dim * cfg.mlp_ratio)),
    }


def image_encoder_init(key, cfg: ViTConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 3)
    params = {
        "patch_embed": L.conv_init(keys[0], cfg.in_chans, cfg.embed_dim,
                                   (cfg.patch_size, cfg.patch_size)),
        "blocks": [
            _block_init(keys[1 + i], cfg,
                        0 if i in cfg.global_attn_indexes else cfg.window_size)
            for i in range(cfg.depth)
        ],
        "neck": {
            "conv1": L.conv_init(keys[-2], cfg.embed_dim, cfg.out_chans, (1, 1),
                                 use_bias=False),
            "ln1": L.layer_norm_init(cfg.out_chans),
            "conv2": L.conv_init(keys[-1], cfg.out_chans, cfg.out_chans, (3, 3),
                                 use_bias=False),
            "ln2": L.layer_norm_init(cfg.out_chans),
        },
    }
    if cfg.use_abs_pos:
        params["pos_embed"] = jnp.zeros(
            (1, cfg.grid_size, cfg.grid_size, cfg.embed_dim))
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def window_partition(x: Array, window_size: int) -> Tuple[Array, Tuple[int, int]]:
    """[B,H,W,C] -> [B*nw, ws, ws, C] with zero pad to a window multiple."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size,
                  window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return x, (Hp, Wp)


def window_unpartition(windows: Array, window_size: int,
                       pad_hw: Tuple[int, int], hw: Tuple[int, int]) -> Array:
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size,
                        window_size, window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def _use_flash(cfg: ViTConfig, n_tokens: int) -> bool:
    """Use the Pallas kernel for large global-attention grids on TPU."""
    from ullsam_tpu.ops.pallas import backend_ok
    if not backend_ok():
        return False
    return n_tokens >= 1024 and n_tokens % 512 == 0


def _use_window_kernel(cfg: ViTConfig, H: int, W: int) -> bool:
    """Whole-window Pallas attention for small windowed grids on TPU."""
    from ullsam_tpu.ops.pallas import backend_ok
    if not backend_ok():
        return False
    return 4 <= H * W < 1024 and H <= 32 and W <= 32


def _rel_tables_packed(params: dict, H: int, W: int, hd: int, dtype):
    """Gathered rel-pos tables in the packed-kernel layout: rhf [128, H*H]
    with rhf[d, r*W + i] = Rh[r, i, d] (pad rows zero), likewise rwf."""
    from ullsam_tpu.ops.pallas.flash_attention import _HP
    Rh = A.get_rel_pos(H, H, params["rel_pos_h"]).astype(dtype)
    rhf = jnp.pad(jnp.transpose(Rh, (2, 0, 1)).reshape(hd, H * H),
                  ((0, _HP - hd), (0, 0)))
    Rw = A.get_rel_pos(W, W, params["rel_pos_w"]).astype(dtype)
    rwf = jnp.pad(jnp.transpose(Rw, (2, 0, 1)).reshape(hd, W * W),
                  ((0, _HP - hd), (0, 0)))
    return rhf, rwf


def _vit_attention_window_packed(params: dict, x: Array,
                                 cfg: ViTConfig) -> Array:
    """Windowed attention with NO head-split layout in HBM.

    The qkv projection is emitted head-major with each head's hd channels
    padded to 128 lanes (a weight-side pad/reshape, so per-head q/k/v are
    aligned lane slices inside the Pallas kernel), the decomposed rel-pos
    bias is rebuilt in-kernel from the shared gathered tables, and the
    output projection consumes the padded layout directly. Replaces the
    XLA windowed path whose [B, N, 3, nh, hd] head split + f32 [400, N, N]
    logits chain cost ~1 ms/layer of relayout copies on ViT-H.
    """
    from ullsam_tpu.ops.pallas.flash_attention import (
        vit_window_attention_packed)
    B, H, W, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkvp = _qkv_packed(params, x.reshape(B, H * W, C), nh, hd)
    rhf, rwf = _rel_tables_packed(params, H, W, hd, x.dtype)
    out = vit_window_attention_packed(qkvp, rhf, rwf, nh, hd, H, W)
    return _proj_packed(params, out, nh, hd, C).reshape(B, H, W, C)


def _qkv_packed(params: dict, x2: Array, nh: int, hd: int) -> Array:
    """qkv projection emitted head-major with hd padded to 128 lanes:
    [B, N, C] -> [B, N, 3*nh*128] (weight-side pad/reshape, so per-head
    q/k/v are aligned lane slices inside the Pallas kernels)."""
    from ullsam_tpu.ops.pallas.flash_attention import _HP
    C = x2.shape[-1]
    wq = params["qkv"]["kernel"].astype(x2.dtype)           # [C, 3C]
    wp = jnp.pad(wq.reshape(C, 3, nh, hd),
                 ((0, 0), (0, 0), (0, 0), (0, _HP - hd)))
    qkvp = jnp.dot(x2, wp.reshape(C, 3 * nh * _HP),
                   preferred_element_type=jnp.float32)
    if "bias" in params["qkv"]:
        bb = params["qkv"]["bias"].astype(jnp.float32)
        qkvp = qkvp + jnp.pad(bb.reshape(3, nh, hd),
                              ((0, 0), (0, 0), (0, _HP - hd))).reshape(-1)
    return qkvp.astype(x2.dtype)


def _proj_packed(params: dict, out: Array, nh: int, hd: int,
                 C: int) -> Array:
    """Output projection consuming the padded head-major layout directly
    (zero pad rows in the weight absorb the pad lanes)."""
    from ullsam_tpu.ops.pallas.flash_attention import _HP
    wo = params["proj"]["kernel"].astype(out.dtype)         # [nh*hd, C]
    wop = jnp.pad(wo.reshape(nh, hd, C),
                  ((0, 0), (0, _HP - hd), (0, 0))).reshape(nh * _HP, C)
    y = jnp.dot(out, wop, preferred_element_type=jnp.float32)
    if "bias" in params["proj"]:
        y = y + params["proj"]["bias"].astype(jnp.float32)
    return y.astype(out.dtype)  # match L.linear's cast


def _vit_attention_global_packed(params: dict, x: Array,
                                 cfg: ViTConfig) -> Array:
    """Global attention with the packed head-major layout end to end.

    Kills the [B, N, 3, nh, hd] qkv head-split and the output
    merge-transpose around the global flash kernel: heads ride the
    Pallas grid as 128-lane slices of one packed projection
    (ops/pallas/flash_attention._vit_kernel_packed). Only q is unpacked
    — the rel-pos factor dots are per-head (image_encoder.py:325-361)
    and consume [B*nh, N, 128] with zero-padded tables."""
    from ullsam_tpu.ops.pallas.flash_attention import (
        _HP, vit_flash_attention_packed)
    B, H, W, C = x.shape
    N = H * W
    nh, hd = cfg.num_heads, cfg.head_dim
    qkvp = _qkv_packed(params, x.reshape(B, N, C), nh, hd)
    qh = qkvp[..., :nh * _HP].reshape(B, N, nh, _HP)
    qh = qh.transpose(0, 2, 1, 3).reshape(B * nh, N, _HP)
    rel_h, rel_w = A.decomposed_rel_pos_terms(
        qh, params["rel_pos_h"], params["rel_pos_w"], (H, W), (H, W))
    rel_h = rel_h.reshape(B * nh, N, H)
    rel_w = rel_w.reshape(B * nh, N, W)
    out = vit_flash_attention_packed(qkvp, rel_h, rel_w, nh, hd)
    return _proj_packed(params, out, nh, hd, C).reshape(B, H, W, C)


def _vit_attention(params: dict, x: Array, cfg: ViTConfig,
                   allow_window_kernel: bool = True) -> Array:
    """Multi-head self-attention over an [B,H,W,C] token grid.

    Heads are folded into the batch dim ([B*nh, N, hd]) so the decomposed
    rel-pos einsums apply per-head exactly as the reference
    (image_encoder.py:224-240). Large global grids dispatch to the Pallas
    flash kernel with the bias kept in factored (rel_h, rel_w) form;
    windowed grids use the packed whole-window kernel.
    """
    B, H, W, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    if (allow_window_kernel and cfg.use_rel_pos and H == W and hd <= 128
            and _use_window_kernel(cfg, H, W)):
        return _vit_attention_window_packed(params, x, cfg)
    if (allow_window_kernel and cfg.use_rel_pos and hd <= 128
            and _use_flash(cfg, H * W) and H * W % 1024 == 0
            and 1024 % W == 0
            and os.environ.get("ULLSAM_PACKED_GLOBAL", "0") == "1"):
        # MEASURED DEAD END (round 5, default OFF): packed layout for the
        # 4 global layers was encode-neutral-to-worse (64.50 vs 63.96 ms
        # ViT-H) and train-step-worse (127.1 vs 125.3 ms) — the head-split
        # relayouts it removes were not a measurable cost at global-layer
        # counts. Kept opt-in for re-evaluation on deeper global stacks.
        return _vit_attention_global_packed(params, x, cfg)
    qkv = L.linear(params["qkv"], x)  # [B,H,W,3C]
    qkv = qkv.reshape(B, H * W, 3, nh, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * nh, H * W, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    if cfg.use_rel_pos and _use_flash(cfg, H * W):
        from ullsam_tpu.ops.pallas.flash_attention import vit_flash_attention
        rel_h, rel_w = A.decomposed_rel_pos_terms(
            q, params["rel_pos_h"], params["rel_pos_w"], (H, W), (H, W))
        rel_h = rel_h.reshape(B * nh, H * W, H)
        rel_w = rel_w.reshape(B * nh, H * W, W)
        out = vit_flash_attention(q, k, v, rel_h, rel_w)
    else:
        bias = None
        if cfg.use_rel_pos:
            bias = A.decomposed_rel_pos_bias(
                q, params["rel_pos_h"], params["rel_pos_w"], (H, W), (H, W))
        out = A.attention(q, k, v, bias=bias, scale=hd ** -0.5)
    out = out.reshape(B, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
    return L.linear(params["proj"], out)


def _ln_mlp_half(params: dict, x: Array, cfg: ViTConfig,
                 allow_kernels: bool) -> Array:
    """x + mlp(LN2(x)) — fused Pallas chain on TPU, XLA otherwise."""
    if allow_kernels:
        from ullsam_tpu.ops.pallas import vit_block as VB
        C = x.shape[-1]
        F = params["mlp"]["fc1"]["kernel"].shape[1]
        if VB.ln_mlp_supported(x.size // C, C, F):
            return VB.fused_ln_mlp(x, params["norm2"], params["mlp"],
                                   eps=cfg.ln_eps)
    return x + L.mlp_block(params["mlp"], L.layer_norm(params["norm2"], x,
                                                       eps=cfg.ln_eps))


def _block_apply(params: dict, x: Array, cfg: ViTConfig, window_size: int,
                 allow_window_kernel: bool = True) -> Array:
    shortcut = x
    h = L.layer_norm(params["norm1"], x, eps=cfg.ln_eps)
    if window_size > 0:
        H, W = h.shape[1], h.shape[2]
        h, pad_hw = window_partition(h, window_size)
    h = _vit_attention(params["attn"], h, cfg,
                       allow_window_kernel=allow_window_kernel)
    if window_size > 0:
        h = window_unpartition(h, window_size, pad_hw, (H, W))
    x = shortcut + h
    return _ln_mlp_half(params, x, cfg, allow_window_kernel)


def _block_windowed_prepartitioned(params: dict, x: Array, cfg: ViTConfig,
                                   pad_mask,
                                   allow_window_kernel: bool = True,
                                   geom=None) -> Array:
    """Window block operating on an ALREADY-partitioned [B*nw, ws, ws, C]
    grid. Matches the reference exactly: it zero-pads the normed
    activations before each block's attention (image_encoder.py:166-182),
    which here is a multiply by the pad mask — all other ops are pointwise,
    so the partitioned layout persists across consecutive window blocks and
    the 6-D partition/unpartition transposes (20% of encode time) happen
    once per RUN instead of once per block.

    On TPU both block halves run as fused Pallas kernels
    (ops/pallas/vit_block.py): LN1+qkv+window-attention+proj+residual and
    LN2+MLP+residual; `geom` = (nwx, nwy, Hv, Wv, masked) supplies the
    window-grid geometry so the pad mask is rebuilt in-kernel."""
    Bw, wsh, wsw, C = x.shape
    n = wsh * wsw
    if allow_window_kernel and geom is not None and cfg.use_rel_pos:
        from ullsam_tpu.ops.pallas import vit_block as VB
        if (wsh == wsw and cfg.head_dim <= 128
                and VB.window_attn_supported(n, C, cfg.num_heads,
                                             cfg.head_dim)):
            nwx, nwy, Hv, Wv, masked = geom
            rhf, rwf = _rel_tables_packed(params["attn"], wsh, wsw,
                                          cfg.head_dim, x.dtype)
            h = VB.fused_window_attn(
                x.reshape(Bw, n, C), params, rhf, rwf,
                nh=cfg.num_heads, hd=cfg.head_dim, kh=wsh, kw=wsw,
                eps=cfg.ln_eps, nwx=nwx, nwy=nwy, Hv=Hv, Wv=Wv,
                masked=masked)
            h = _ln_mlp_half(params, h, cfg, True)
            return h.reshape(Bw, wsh, wsw, C)
    shortcut = x
    h = L.layer_norm(params["norm1"], x, eps=cfg.ln_eps)
    if pad_mask is not None:
        h = h * pad_mask
    h = _vit_attention(params["attn"], h, cfg,
                       allow_window_kernel=allow_window_kernel)
    x = shortcut + h
    return _ln_mlp_half(params, x, cfg, allow_window_kernel)


def _patch_embed(params: dict, x: Array, cfg: ViTConfig) -> Array:
    """Non-overlapping k=s patch embed as reshape+matmul.

    XLA lowers the k16 s16 conv (image_encoder.py:364-395) to a ~3.5 ms
    convolution on a 1024^2 image; the same op as an im2col reshape +
    one [B*g*g, k*k*3] x [k*k*3, C] matmul runs at matmul speed (the
    patch pixels are contiguous, so im2col is a pure transpose).
    """
    p = cfg.patch_size
    B, H, W, Cin = x.shape
    g_h, g_w = H // p, W // p
    k = params["patch_embed"]["kernel"]  # HWIO [p, p, Cin, C]
    cols = x.reshape(B, g_h, p, g_w, p, Cin).transpose(0, 1, 3, 2, 4, 5)
    cols = cols.reshape(B, g_h, g_w, p * p * Cin)
    y = jnp.dot(cols, k.reshape(p * p * Cin, -1).astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "bias" in params["patch_embed"]:
        y = y + params["patch_embed"]["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def image_encoder_apply(params: dict, x: Array, cfg: ViTConfig,
                        remat: bool = False) -> Array:
    """x: [B, img, img, 3] NHWC -> [B, grid, grid, out_chans] NHWC."""
    x = _patch_embed(params, x, cfg)  # [B, g, g, C]
    if cfg.use_abs_pos:
        x = x + params["pos_embed"].astype(x.dtype)

    depth = cfg.depth
    ws = cfg.window_size
    is_global = [i in cfg.global_attn_indexes for i in range(depth)]

    def wrap(fn):
        return jax.checkpoint(fn) if remat else fn

    i = 0
    while i < depth:
        if is_global[i] or ws == 0:
            blk = params["blocks"][i]
            x = wrap(lambda p, y: _block_apply(
                p, y, cfg, 0, allow_window_kernel=not remat))(blk, x)
            i += 1
            continue
        # run of consecutive windowed blocks: partition once
        j = i
        while j < depth and not is_global[j]:
            j += 1
        B, H, W, _ = x.shape
        xw, pad_hw = window_partition(x, ws)
        pad_mask = None
        if pad_hw != (H, W):
            ones = jnp.ones((1, H, W, 1), x.dtype)
            pad_mask, _ = window_partition(ones, ws)  # [nw, ws, ws, 1]
            pad_mask = jnp.tile(pad_mask, (B, 1, 1, 1))
        geom = (pad_hw[1] // ws, pad_hw[0] // ws, H, W, pad_hw != (H, W))
        for k in range(i, j):
            blk = params["blocks"][k]
            xw = wrap(lambda p, y: _block_windowed_prepartitioned(
                p, y, cfg, pad_mask, allow_window_kernel=not remat,
                geom=geom))(blk, xw)
        x = window_unpartition(xw, ws, pad_hw, (H, W))
        i = j
    # neck: 1x1 conv -> LN(channel) -> 3x3 conv(same) -> LN(channel)
    n = params["neck"]
    x = L.conv2d(n["conv1"], x)
    x = L.layer_norm(n["ln1"], x, eps=1e-6)
    x = L.conv2d(n["conv2"], x, padding="SAME")
    x = L.layer_norm(n["ln2"], x, eps=1e-6)
    return x
