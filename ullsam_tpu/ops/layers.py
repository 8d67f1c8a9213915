"""Core NN building blocks as pure functions over param pytrees.

Every module here is a pair of functions:
  * ``<name>_init(key, ...) -> params``   (plain nested dict of jnp arrays)
  * ``<name>(params, x, ...) -> y``       (pure apply)

Layout conventions (TPU-first):
  * Linear kernels are stored [in, out] (jnp.dot(x, k) — no transpose at
    apply time; the torch converter transposes once at load).
  * Convs take/return NHWC; kernels are HWIO.
  * Norm statistics are computed in float32 and cast back.

Reference semantics mirrored (behavior, not code):
  * MLPBlock (GELU, exact erf form): /root/reference/modeling/common.py:13-26
  * LayerNorm2d (channelwise norm): /root/reference/modeling/common.py:31-43.
    In NHWC the channel axis is last, so it reduces to plain LayerNorm.
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# initializers (match torch defaults so from-scratch training behaves alike)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
                dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: kaiming-uniform(a=sqrt(5)) ~ U(+-1/sqrt(in))."""
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": _uniform(kkey, (in_dim, out_dim), bound, dtype)}
    if use_bias:
        p["bias"] = _uniform(bkey, (out_dim,), bound, dtype)
    return p


def linear(params: dict, x: Array, *, dtype=None) -> Array:
    if "qweight" in params:
        # weight-only int8 (W8A16): the int8 weight converts to the
        # activation dtype inside the matmul's operand stream (XLA keeps
        # the HBM read at 1 byte/weight) and the per-output-channel scale
        # applies on the f32 accumulator — exact w.r.t. the quantized
        # weights. See models/internlm2/quant.py.
        # ULLSAM_INT8_PALLAS=1 (trace-time) routes eligible dots through
        # the explicit Pallas W8A16 kernel (ops/pallas/int8_matmul.py):
        # guaranteed single int8 HBM read + fused scale epilogue.
        # MEASURED DEAD END as the decode default (round 5): in the real
        # b8 scan decode loop the Pallas route was SLOWER (int8 window
        # chunk 1541 -> 1296 tok/s) — XLA already streams the int8
        # weights once and fuses the dequant; the kernel only pays off
        # in isolation on w2-shaped dots. Stays opt-in.
        qw = params["qweight"]
        if (_os.environ.get("ULLSAM_INT8_PALLAS", "0") == "1"
                and qw.ndim == 2 and qw.shape[1] % 128 == 0):
            from ullsam_tpu.ops.pallas.int8_matmul import w8a16_matmul
            N = qw.shape[1]
            bn = next(b for b in (512, 256, 128) if N % b == 0)
            xf = x.reshape(-1, x.shape[-1])
            y = w8a16_matmul(xf, qw, params["qscale"], block_n=bn)
            y = y.reshape(x.shape[:-1] + (N,))
        else:
            y = jnp.dot(x, qw.astype(x.dtype),
                        preferred_element_type=jnp.float32)
            y = y * params["qscale"].astype(jnp.float32)
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    kernel = params["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    else:
        kernel = kernel.astype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def embedding_init(key, num: int, dim: int, dtype=jnp.float32) -> dict:
    return {"embedding": jax.random.normal(key, (num, dim), dtype)}


def embedding_lookup(params: dict, ids: Array) -> Array:
    return jnp.take(params["embedding"], ids, axis=0)


def conv_init(key, in_chans: int, out_chans: int,
              kernel_size: Tuple[int, int], use_bias: bool = True,
              dtype=jnp.float32) -> dict:
    kkey, bkey = jax.random.split(key)
    fan_in = in_chans * kernel_size[0] * kernel_size[1]
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": _uniform(kkey, kernel_size + (in_chans, out_chans), bound, dtype)}
    if use_bias:
        p["bias"] = _uniform(bkey, (out_chans,), bound, dtype)
    return p


def conv2d(params: dict, x: Array, *, stride: Tuple[int, int] = (1, 1),
           padding="VALID") -> Array:
    """NHWC conv with HWIO kernel.

    For low-precision inputs the conv emits x.dtype directly (the MXU
    still accumulates in f32 internally): forcing a f32 output dtype
    makes jax's conv vjp pair an upcast f32 cotangent with the bf16
    kernel, which lax.conv rejects (bf16 training path, round 3)."""
    kernel = params["kernel"].astype(x.dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv_transpose2d(params: dict, x: Array, *, stride: Tuple[int, int]) -> Array:
    """NHWC transposed conv for the kernel_size == stride case.

    Both SAM uses (mask_decoder.py:53-58 output upscaling) have k == s == 2,
    where the transposed conv has no output overlap and reduces to a per-
    pixel matmul + block expand: out[si+di, sj+dj, o] = sum_c x[i,j,c] *
    W[di,dj,c,o]. Kernel stored HWIO ([kh, kw, in, out]).
    """
    kh, kw = stride
    kernel = params["kernel"].astype(x.dtype)
    assert kernel.shape[:2] == (kh, kw), "conv_transpose2d requires k == s"
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    y = jnp.einsum("bhwc,klco->bhkwlo", x, kernel,
                   preferred_element_type=jnp.float32)
    y = y.reshape(B, H * kh, W * kw, O)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: Array, *, eps: float = 1e-6) -> Array:
    """LayerNorm over the last axis; statistics in fp32.

    Also serves as the reference's LayerNorm2d (common.py:31-43) since our
    feature maps are NHWC with channels last. Single-pass statistics
    (E[x], E[x^2] fused into one reduction sweep): the two-pass form cost
    ~28% of ViT-H encode time in unfused fp32 reductions.
    """
    x32 = x.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=-1, keepdims=True)
    if x.shape[-1] >= 32:
        m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    else:
        # two-pass for tiny channel counts: the one-pass form loses
        # precision to cancellation when few elements are averaged
        var = jnp.mean(jnp.square(x32 - m1), axis=-1, keepdims=True)
    y = (x32 - m1) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_noparam(x: Array, *, eps: float = 1e-5) -> Array:
    """F.layer_norm with no affine params (prompt_encoder.py:142-145)."""
    x32 = x.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return ((x32 - m1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rms_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype)}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rms_norm(scale: Array, x: Array, eps: float) -> Array:
    return _rms_norm_fwd(scale, x, eps)[0]


def _rms_norm_fwd(scale, x, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    # residuals: input + scale ONLY (input dtype, typically bf16). The
    # autodiff rule otherwise saves the fp32 upcast per call — on a
    # 24-layer lax.scan that is two fp32 [L, B, S, H] stacks of dead HBM
    # traffic per train step (measured ~10 ms/step on the flagship).
    return (y * scale.astype(jnp.float32)).astype(x.dtype), (scale, x)


def _rms_norm_bwd(eps, res, g):
    scale, x = res
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    g32 = g.astype(jnp.float32)
    gs = g32 * scale.astype(jnp.float32)
    dx = rstd * gs - x32 * (rstd ** 3) * jnp.mean(
        gs * x32, axis=-1, keepdims=True)
    dscale = jnp.sum((g32 * x32 * rstd).reshape(-1, x.shape[-1]), axis=0)
    return dscale.astype(scale.dtype), dx.astype(x.dtype)


_rms_norm.defvjp(_rms_norm_fwd, _rms_norm_bwd)


def rms_norm(params: dict, x: Array, *, eps: float = 1e-5) -> Array:
    """RMSNorm in fp32, cast back (modeling_internlm2.py:129-143 semantics)."""
    return _rms_norm(params["scale"], x, eps)


# ---------------------------------------------------------------------------
# activations / MLPs
# ---------------------------------------------------------------------------


def gelu(x: Array) -> Array:
    """GELU matching torch nn.GELU (exact erf form) in fp32.

    In bf16 the tanh approximation is used instead: its max deviation
    (~1.5e-3 abs) is below bf16 resolution at typical activation
    magnitudes, while the exact-erf rational-polynomial tail measurably
    costs MXU overlap (ViT-H MLP 1.33 -> 1.05 ms/layer, see
    benchmarks/profile_encode.py) — and it matches the Pallas decoder
    kernel, which is tanh-form on TPU (Mosaic has no erf).
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def mlp_block_init(key, dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, dtype=dtype),
        "fc2": linear_init(k2, hidden, dim, dtype=dtype),
    }


def mlp_block(params: dict, x: Array, act=gelu) -> Array:
    """Linear -> act -> Linear (common.py:13-26)."""
    return linear(params["fc2"], act(linear(params["fc1"], x)))


def mlp_stack_init(key, dims: Sequence[int], dtype=jnp.float32) -> dict:
    """N-layer ReLU MLP (mask_decoder.py:154-176 hypernetwork/IoU head)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [
            linear_init(k, dims[i], dims[i + 1], dtype=dtype)
            for i, k in enumerate(keys)
        ]
    }


def mlp_stack(params: dict, x: Array, *, sigmoid_output: bool = False) -> Array:
    layers = params["layers"]
    for i, lp in enumerate(layers):
        x = linear(lp, x)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def swiglu_init(key, dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": linear_init(k1, dim, hidden, use_bias=False, dtype=dtype),
        "w3": linear_init(k2, dim, hidden, use_bias=False, dtype=dtype),
        "w2": linear_init(k3, hidden, dim, use_bias=False, dtype=dtype),
    }


@jax.custom_vjp
def _swiglu(w1: Array, w3: Array, w2: Array, x: Array) -> Array:
    return _swiglu_fwd(w1, w3, w2, x)[0]


# Backward residual mode: "ab" saves the two [*, hidden] projections per
# layer (no recompute in the backward); "x" saves only the input and
# re-projects a/b in the backward (two extra hidden-width dots, ~0.37 ms
# per flagship LLM layer, in exchange for dropping ~36 MB/layer of scan
# residual stacking). A/B via ULLSAM_SWIGLU_SAVE=x (read at TRACE time,
# like the attn-ckpt knob, so setting it after import still takes effect
# — advisor r4).
def _swiglu_save_mode() -> str:
    mode = _os.environ.get("ULLSAM_SWIGLU_SAVE", "ab")
    if mode not in ("ab", "x"):
        raise ValueError(
            f"ULLSAM_SWIGLU_SAVE={mode!r}: expected 'ab' or 'x'")
    return mode


def _swiglu_fwd(w1, w3, w2, x):
    a = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32
                ).astype(x.dtype)
    b = jnp.dot(x, w3.astype(x.dtype), preferred_element_type=jnp.float32
                ).astype(x.dtype)
    p = (jax.nn.silu(a.astype(jnp.float32)).astype(x.dtype)) * b
    y = jnp.dot(p, w2.astype(x.dtype), preferred_element_type=jnp.float32
                ).astype(x.dtype)
    # residuals: (x, a, b) at input dtype. Autodiff additionally stacks
    # silu(a), the gate product, and fp32 sigmoid intermediates per scan
    # layer ([L, B, S, 4H] each on the flagship LLM); silu and its
    # derivative are cheap VPU recomputes.
    if _swiglu_save_mode() == "x":
        return y, (w1, w3, w2, x, None, None)
    return y, (w1, w3, w2, x, a, b)


def _swiglu_bwd(res, g):
    w1, w3, w2, x, a, b = res
    dt = x.dtype
    if a is None:
        a = jnp.dot(x, w1.astype(dt), preferred_element_type=jnp.float32
                    ).astype(dt)
        b = jnp.dot(x, w3.astype(dt), preferred_element_type=jnp.float32
                    ).astype(dt)
    a32 = a.astype(jnp.float32)
    sa = jax.nn.sigmoid(a32)
    silu_a = (a32 * sa).astype(dt)
    dsilu = (sa * (1.0 + a32 * (1.0 - sa))).astype(dt)
    gp = jnp.dot(g, w2.astype(dt).T, preferred_element_type=jnp.float32
                 ).astype(dt)
    da = gp * b * dsilu
    db = gp * silu_a
    dx = (jnp.dot(da, w1.astype(dt).T, preferred_element_type=jnp.float32)
          + jnp.dot(db, w3.astype(dt).T, preferred_element_type=jnp.float32)
          ).astype(dt)
    x2 = x.reshape(-1, x.shape[-1])
    dw1 = jnp.dot(x2.T, da.reshape(-1, da.shape[-1]),
                  preferred_element_type=jnp.float32).astype(w1.dtype)
    dw3 = jnp.dot(x2.T, db.reshape(-1, db.shape[-1]),
                  preferred_element_type=jnp.float32).astype(w3.dtype)
    dw2 = jnp.dot((silu_a * b).reshape(-1, b.shape[-1]).T,
                  g.reshape(-1, g.shape[-1]),
                  preferred_element_type=jnp.float32).astype(w2.dtype)
    return dw1, dw3, dw2, dx


_swiglu.defvjp(_swiglu_fwd, _swiglu_bwd)


def swiglu(params: dict, x: Array) -> Array:
    """SwiGLU MLP: w2(silu(w1 x) * w3 x) (modeling_internlm2.py:250-264)."""
    if "qweight" in params["w1"]:  # int8 inference path: no custom vjp
        return linear(params["w2"],
                      jax.nn.silu(linear(params["w1"], x))
                      * linear(params["w3"], x))
    return _swiglu(params["w1"]["kernel"], params["w3"]["kernel"],
                   params["w2"]["kernel"], x)
