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


def test_llm_flash_attention_grads():
    """Fused LLM flash backward (dq/dkv kernels) vs the XLA reference —
    the packed-training varlen path runs this under jax.grad on TPU."""
    rng = np.random.RandomState(2)
    B, S, nh, nkv, D = 2, 300, 8, 4, 64   # S=300 exercises tile padding
    q = jnp.asarray(rng.randn(B, S, nh, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, nkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, nkv, D), jnp.float32)
    seg = np.ones((B, S), np.int32)
    seg[0, :50] = 0       # left padding
    seg[1, 200:] = 2      # packed second segment
    seg = jnp.asarray(seg)
    for causal in (True, False):
        def loss_flash(a, b, c):
            return jnp.sum(llm_flash_attention(a, b, c, seg, seg, nkv,
                                               causal=causal) ** 2)

        def loss_ref(a, b, c):
            return jnp.sum(reference_attention(a, b, c, seg, seg, nkv,
                                               causal=causal) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            gref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip(["dq", "dk", "dv"], g, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4,
                                       err_msg=f"{name} causal={causal}")


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


def test_fused_upscale_hypernet_kernel_matches_xla():
    """Pallas upscale+hypernet kernel (interpret mode) vs the XLA
    block-column reference. The kernel uses tanh-GELU (Mosaic has no erf),
    so tolerance covers the <=1.5e-3 gelu deviation on top of bf16."""
    from ullsam_tpu.ops import layers as L
    from ullsam_tpu.models.sam.mask_decoder import (_upscale_hypernet_cols,
                                                    _upscale_weight_views)
    from ullsam_tpu.ops.pallas import decoder as PD

    C = 256
    k = jax.random.PRNGKey(0)
    up = {"convt1": L.conv_init(jax.random.PRNGKey(1), C, C // 4, (2, 2)),
          "ln": L.layer_norm_init(C // 4),
          "convt2": L.conv_init(jax.random.PRNGKey(2), C // 4, C // 8,
                                (2, 2))}
    B, N = 2, 1024
    keys = jax.random.normal(k, (B, N, C), jnp.float32).astype(jnp.bfloat16)
    hyper = jax.random.normal(jax.random.PRNGKey(3), (B, 4, C // 8),
                              jnp.float32) * 0.1
    ref = _upscale_hypernet_cols(up, hyper, keys)
    w1c, b1t, lns, lnb, w2bd, b2t = _upscale_weight_views(up)
    out = PD.fused_upscale_hypernet(keys, hyper, w1c, b1t, lns, lnb, w2bd,
                                    b2t, block_n=512, interpret=True)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).max()
    assert d.max() <= 0.02 * scale, (d.max(), scale)


def test_decode_masks_cols_matches_decode_masks():
    """Block-column decode (AMG fast path) is a pure relayout of
    decode_masks: identical mask values, iou, stability, and boxes."""
    from ullsam_tpu.core.config import (MaskDecoderConfig,
                                        PromptEncoderConfig, SamConfig,
                                        ViTConfig)
    from ullsam_tpu.models.sam import sam as S
    from ullsam_tpu.models.sam.mask_decoder import cols_to_spatial
    from ullsam_tpu.inference import amg as A

    cfg = SamConfig(
        vit=ViTConfig(img_size=64, patch_size=8, embed_dim=16, depth=2,
                      num_heads=2, mlp_ratio=2.0, out_chans=16,
                      window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoderConfig(embed_dim=16,
                                           image_embedding_size=(8, 8),
                                           input_image_size=(64, 64),
                                           mask_in_chans=8),
        mask_decoder=MaskDecoderConfig(transformer_dim=16,
                                       transformer_mlp_dim=32,
                                       transformer_num_heads=2,
                                       iou_head_hidden_dim=8))
    params = S.sam_init(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (5, 1, 2)) * 64
    labels = jnp.ones((5, 1), jnp.int32)
    for mm in (True, False):
        low, iou1 = S.decode_masks(params, cfg, emb, points=(pts, labels),
                                   multimask_output=mm)
        cols, iou2 = S.decode_masks_cols(params, cfg, emb,
                                         points=(pts, labels),
                                         multimask_output=mm)
        M = iou1.shape[1]
        sp = cols_to_spatial(cols, M, 8, 8)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(low),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(iou1), np.asarray(iou2))
        st1 = A.calculate_stability_score(
            low.reshape(-1, 32, 32), 0.0, 1.0)
        st2 = A.stability_score_cols(cols, M, 0.0, 1.0).reshape(-1)
        np.testing.assert_allclose(np.asarray(st1), np.asarray(st2))
        b1 = A.batched_mask_to_box(low.reshape(-1, 32, 32) > 0.0)
        b2 = A.mask_to_box_cols(cols > 0.0, M, 8, 8).reshape(-1, 4)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_fused_two_way_transformer_matches_xla(monkeypatch):
    """Per-prompt fused TwoWayTransformer kernel (interpret mode) vs the
    XLA reference at production head/dim layout (C=256, Cd=128, 8 heads),
    at P=1 and P=2 prompts/program (P=2 takes the concatenated
    image-side-projection path)."""
    from ullsam_tpu.core.config import MaskDecoderConfig
    from ullsam_tpu.models.sam.two_way_transformer import (
        two_way_transformer_init, two_way_transformer_apply)
    from ullsam_tpu.ops.pallas import decoder as PD

    cfg = MaskDecoderConfig()
    tw = two_way_transformer_init(jax.random.PRNGKey(0), cfg)
    B, T, C = 2, 7, cfg.transformer_dim
    Hh = Ww = 16
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, Hh, Ww, C)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, Hh, Ww, C)) * 0.5
    toks = jax.random.normal(jax.random.PRNGKey(3), (B, T, C)) * 0.5

    hs_ref, keys_ref = two_way_transformer_apply(tw, cfg, emb, pe, toks)
    q, k = PD.fused_two_way_transformer(
        tw, emb.reshape(1, -1, C), pe.reshape(1, -1, C), toks,
        heads=cfg.transformer_num_heads, mlp_dim=cfg.transformer_mlp_dim,
        eps=cfg.ln_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(q, np.float32),
                               np.asarray(hs_ref, np.float32),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(k, np.float32),
                               np.asarray(keys_ref, np.float32),
                               atol=2e-5, rtol=2e-5)
    # odd batch exercises the single-prompt-per-program fallback (P=1)
    q1, k1 = PD.fused_two_way_transformer(
        tw, emb.reshape(1, -1, C), pe.reshape(1, -1, C), toks[:1],
        heads=cfg.transformer_num_heads, mlp_dim=cfg.transformer_mlp_dim,
        eps=cfg.ln_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(q1, np.float32),
                               np.asarray(hs_ref[:1], np.float32),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(k1, np.float32),
                               np.asarray(keys_ref[:1], np.float32),
                               atol=2e-5, rtol=2e-5)
    # P=2: both prompts in one program, concat image-side projections
    monkeypatch.setenv("ULLSAM_TWT_P", "2")
    q2, k2 = PD.fused_two_way_transformer(
        tw, emb.reshape(1, -1, C), pe.reshape(1, -1, C), toks,
        heads=cfg.transformer_num_heads, mlp_dim=cfg.transformer_mlp_dim,
        eps=cfg.ln_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(q2, np.float32),
                               np.asarray(hs_ref, np.float32),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(k2, np.float32),
                               np.asarray(keys_ref, np.float32),
                               atol=2e-5, rtol=2e-5)


def test_vit_window_attention_packed_matches_xla():
    """Packed whole-window kernel (interpret mode) vs the XLA reference on
    the packed layout, plus gradient parity through the custom vjp."""
    from ullsam_tpu.ops.pallas import flash_attention as FA

    nh, hd, kh, kw = 4, 80, 6, 6
    N = kh * kw
    B = 3
    HP = FA._HP
    rng = np.random.RandomState(0)
    qkvp = np.zeros((B, N, 3 * nh * HP), np.float32)
    for s in range(3):
        for h in range(nh):
            qkvp[:, :, (s * nh + h) * HP:(s * nh + h) * HP + hd] = \
                rng.randn(B, N, hd) * 0.3
    rhf = np.zeros((HP, kh * kh), np.float32)
    rwf = np.zeros((HP, kw * kw), np.float32)
    rhf[:hd] = rng.randn(hd, kh * kh) * 0.2
    rwf[:hd] = rng.randn(hd, kw * kw) * 0.2
    args = (jnp.asarray(qkvp), jnp.asarray(rhf), jnp.asarray(rwf))

    ref = FA._window_packed_xla(*args, nh, hd, kh, kw)
    with pltpu.force_tpu_interpret_mode():
        out = FA.vit_window_attention_packed(*args, nh, hd, kh, kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda *a: jnp.sum(
            FA.vit_window_attention_packed(*a, nh, hd, kh, kw) ** 2))(*args)
    gref = jax.grad(lambda *a: jnp.sum(
        FA._window_packed_xla(*a, nh, hd, kh, kw) ** 2))(*args)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-3)


def test_fused_upscale_stats_kernel_matches_xla():
    """The stats-emitting upscale kernel's hi/lo counts and occupancy
    bitmaps (interpret mode) match the XLA stability/box chain on the
    same logits (round-2 verdict item 2: the stats chain re-read the
    cols tensor several times per chunk)."""
    from ullsam_tpu.ops import layers as L
    from ullsam_tpu.models.sam.mask_decoder import (_upscale_hypernet_cols,
                                                    _upscale_weight_views)
    from ullsam_tpu.ops.pallas import decoder as PD
    from ullsam_tpu.inference.amg import (mask_to_box_cols,
                                          stability_score_cols)

    C, B, N, W, nm = 256, 2, 1024, 32, 3   # H = 32, W = 32 grid
    up = {"convt1": L.conv_init(jax.random.PRNGKey(1), C, C // 4, (2, 2)),
          "ln": L.layer_norm_init(C // 4),
          "convt2": L.conv_init(jax.random.PRNGKey(2), C // 4, C // 8,
                                (2, 2))}
    keys = jax.random.normal(jax.random.PRNGKey(0), (B, N, C),
                             jnp.float32).astype(jnp.bfloat16)
    hyper = jax.random.normal(jax.random.PRNGKey(3), (B, nm, C // 8),
                              jnp.float32) * 0.1
    w1c, b1t, lns, lnb, w2bd, b2t = _upscale_weight_views(up)
    thr, off = 0.0, 1.0
    cols, counts, rowany, colany = PD.fused_upscale_hypernet_stats(
        keys, hyper, w1c, b1t, lns, lnb, w2bd, b2t, W=W, nm=nm,
        thr=thr, off=off, block_n=512, interpret=True)

    H = N // W
    ref_cols = _upscale_hypernet_cols(up, hyper, keys)
    d = np.abs(np.asarray(cols, np.float32) - np.asarray(ref_cols,
                                                         np.float32))
    assert d.max() <= 0.02 * np.abs(np.asarray(ref_cols)).max()

    # stats computed from the KERNEL's own cols (bit-identical logits)
    stab_ref = np.asarray(stability_score_cols(cols, nm, thr, off))
    hi = np.asarray(counts)[:, 0, :nm]
    lo = np.asarray(counts)[:, 1, :nm]
    np.testing.assert_allclose(hi / np.maximum(lo, 1.0), stab_ref,
                               atol=1e-6)
    box_ref = np.asarray(mask_to_box_cols(cols > thr, nm, H, W))
    any_row = np.asarray(rowany)[:, :nm, :] > 0
    any_col = np.asarray(colany)[:, :nm, :] > 0
    rows = np.arange(4 * H)
    cols_i = np.arange(4 * W)
    top = np.min(np.where(any_row, rows, 4 * H), axis=-1)
    bottom = np.max(np.where(any_row, rows, -1), axis=-1)
    left = np.min(np.where(any_col, cols_i, 4 * W), axis=-1)
    right = np.max(np.where(any_col, cols_i, -1), axis=-1)
    empty = ~any_row.any(axis=-1)
    box = np.stack([left, top, right, bottom], axis=-1).astype(np.float32)
    box[empty] = 0
    np.testing.assert_array_equal(box, box_ref)


def test_fused_decode_masks_matches_xla(monkeypatch):
    """The one-dispatch decode megakernel (TWT + hypernet MLPs + upscale
    + stats, interpret mode) matches the composed XLA reference chain at
    production layout (C=256, Cd=128, 8 heads, multimask M=3); B=3 runs
    P=1, then a B=2 rerun at P=2 covers the multi-prompt program."""
    from ullsam_tpu.core.config import MaskDecoderConfig
    from ullsam_tpu.ops import layers as L
    from ullsam_tpu.models.sam.mask_decoder import (
        _upscale_hypernet_cols, _upscale_weight_views, mask_decoder_init)
    from ullsam_tpu.models.sam.two_way_transformer import (
        two_way_transformer_apply)
    from ullsam_tpu.ops.pallas import decoder as PD
    from ullsam_tpu.inference.amg import (mask_to_box_cols,
                                          stability_score_cols)

    cfg = MaskDecoderConfig()
    dec = mask_decoder_init(jax.random.PRNGKey(0), cfg)
    B, T, C = 3, 7, cfg.transformer_dim
    Hh = Ww = 32
    N = Hh * Ww
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, Hh, Ww, C)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, Hh, Ww, C)) * 0.5
    toks = jax.random.normal(jax.random.PRNGKey(3), (B, T, C)) * 0.5

    # XLA reference chain (multimask: heads 1..3 of nm=4)
    hs_ref, keys_ref = two_way_transformer_apply(dec["transformer"], cfg,
                                                 emb, pe, toks)
    m_idx = range(1, cfg.num_mask_tokens)
    hyper = jnp.stack(
        [L.mlp_stack(dec["hyper_mlps"][i], hs_ref[:, 1 + i, :])
         for i in m_idx], axis=1)
    ref_cols = _upscale_hypernet_cols(dec["upscale"], hyper, keys_ref)

    M = len(m_idx)
    thr, off = 0.0, 1.0
    assert PD.decode_shapes_ok(
        C, C // cfg.attention_downsample_rate, cfg.transformer_num_heads,
        cfg.transformer_depth, T, N, M)
    q, cols, counts, rowany, colany = PD.fused_decode_masks(
        dec["transformer"], _upscale_weight_views(dec["upscale"]),
        PD.pack_hyper_mlps([dec["hyper_mlps"][i] for i in m_idx],
                           dtype=jnp.float32),
        emb.reshape(1, N, C), pe.reshape(1, N, C), toks,
        heads=cfg.transformer_num_heads, mlp_dim=cfg.transformer_mlp_dim,
        eps=cfg.ln_eps, W=Ww, nm=M, thr=thr, off=off, m_lo=m_idx.start,
        interpret=True)

    np.testing.assert_allclose(np.asarray(q, np.float32),
                               np.asarray(hs_ref, np.float32),
                               atol=2e-5, rtol=2e-5)
    d = np.abs(np.asarray(cols, np.float32)
               - np.asarray(ref_cols, np.float32))
    assert d.max() <= 0.02 * np.abs(np.asarray(ref_cols)).max()

    # stats vs the KERNEL's own cols (bit-identical logits in f32)
    stab_ref = np.asarray(stability_score_cols(cols, M, thr, off))
    hi = np.asarray(counts)[:, 0, :M]
    lo = np.asarray(counts)[:, 1, :M]
    np.testing.assert_allclose(hi / np.maximum(lo, 1.0), stab_ref,
                               atol=1e-6)
    box_ref = np.asarray(mask_to_box_cols(cols > thr, M, Hh, Ww))
    any_row = np.asarray(rowany)[:, :M, :] > 0
    any_col = np.asarray(colany)[:, :M, :] > 0
    rows = np.arange(4 * Hh)
    cols_i = np.arange(4 * Ww)
    top = np.min(np.where(any_row, rows, 4 * Hh), axis=-1)
    bottom = np.max(np.where(any_row, rows, -1), axis=-1)
    left = np.min(np.where(any_col, cols_i, 4 * Ww), axis=-1)
    right = np.max(np.where(any_col, cols_i, -1), axis=-1)
    empty = ~any_row.any(axis=-1)
    box = np.stack([left, top, right, bottom], axis=-1).astype(np.float32)
    box[empty] = 0
    np.testing.assert_array_equal(box, box_ref)

    # P=2: two prompts per program (concat image-side projections)
    monkeypatch.setenv("ULLSAM_DECODE_P", "2")
    q2, cols2, counts2, _, _ = PD.fused_decode_masks(
        dec["transformer"], _upscale_weight_views(dec["upscale"]),
        PD.pack_hyper_mlps([dec["hyper_mlps"][i] for i in m_idx],
                           dtype=jnp.float32),
        emb.reshape(1, N, C), pe.reshape(1, N, C), toks[:2],
        heads=cfg.transformer_num_heads, mlp_dim=cfg.transformer_mlp_dim,
        eps=cfg.ln_eps, W=Ww, nm=M, thr=thr, off=off, m_lo=m_idx.start,
        interpret=True)
    np.testing.assert_allclose(np.asarray(q2, np.float32),
                               np.asarray(hs_ref[:2], np.float32),
                               atol=2e-5, rtol=2e-5)
    d2 = np.abs(np.asarray(cols2, np.float32)
                - np.asarray(ref_cols[:2], np.float32))
    assert d2.max() <= 0.02 * np.abs(np.asarray(ref_cols)).max()
    np.testing.assert_allclose(np.asarray(counts2),
                               np.asarray(counts)[:2], atol=1e-6)


def test_fused_vit_block_kernels_match_xla_block(monkeypatch):
    """fused_window_attn + fused_ln_mlp (interpret mode) vs the XLA block
    on a PADDED window grid with batch 2, at P=1 and P=2 windows/program,
    plus gradient parity through the custom vjps."""
    from ullsam_tpu.core.config import ViTConfig
    from ullsam_tpu.models.sam import image_encoder as IE
    from ullsam_tpu.ops.pallas import vit_block as VB

    cfg = ViTConfig(img_size=40, patch_size=4, embed_dim=128, depth=1,
                    num_heads=2, window_size=4, global_attn_indexes=(),
                    use_abs_pos=False)
    ws = cfg.window_size
    key = jax.random.PRNGKey(0)
    blk = IE._block_init(key, cfg, ws)
    # zero-init rel-pos would hide bias bugs: randomize
    blk["attn"]["rel_pos_h"] = jax.random.normal(
        jax.random.PRNGKey(1), blk["attn"]["rel_pos_h"].shape) * 0.2
    blk["attn"]["rel_pos_w"] = jax.random.normal(
        jax.random.PRNGKey(2), blk["attn"]["rel_pos_w"].shape) * 0.2

    B, H, W = 2, 10, 10                     # grid 10x10 pads to 12x12
    x = (jax.random.normal(jax.random.PRNGKey(3), (B, H, W, cfg.embed_dim))
         * 0.5).astype(jnp.bfloat16)
    xw, pad_hw = IE.window_partition(x, ws)
    ones = jnp.ones((1, H, W, 1), x.dtype)
    pad_mask, _ = IE.window_partition(ones, ws)
    pad_mask = jnp.tile(pad_mask, (B, 1, 1, 1))
    geom = (pad_hw[1] // ws, pad_hw[0] // ws, H, W, True)

    ref = IE._block_windowed_prepartitioned(blk, xw, cfg, pad_mask,
                                            allow_window_kernel=False)

    monkeypatch.setattr("ullsam_tpu.ops.pallas.backend_ok", lambda: True)
    monkeypatch.setenv("ULLSAM_FUSED_VIT_MLP", "1")
    monkeypatch.setenv("ULLSAM_FUSED_VIT_ATTN", "1")
    for P in ("1", "2"):
        monkeypatch.setenv("ULLSAM_VIT_ATTN_P", P)
        with pltpu.force_tpu_interpret_mode():
            out = IE._block_windowed_prepartitioned(
                blk, xw, cfg, None, allow_window_kernel=True, geom=geom)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=5e-2, rtol=5e-2)

    # f32 gradient parity of each fused half against its exact XLA math
    Bw, _, _, C = xw.shape
    n = ws * ws
    x3 = jnp.asarray(np.asarray(xw, np.float32)).reshape(Bw, n, C)
    qkvw, bqkv, wo, bo = VB.pack_window_attn_weights(
        blk, cfg.num_heads, cfg.head_dim, jnp.float32)
    rhf, rwf = IE._rel_tables_packed(blk["attn"], ws, ws, cfg.head_dim,
                                     jnp.float32)
    lns = blk["norm1"]["scale"][None]
    lnb = blk["norm1"]["bias"][None]
    nwx, nwy = geom[0], geom[1]
    wm = (jnp.arange(Bw)[:, None] % (nwy * nwx))
    t = jnp.arange(n)[None, :]
    mask = (((wm // nwx) * ws + t // ws < H)
            & ((wm % nwx) * ws + t % ws < W)).astype(jnp.float32)[..., None]

    def f_kernel(a):
        return jnp.sum(VB._window_attn_call(
            a, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf, 1, cfg.num_heads,
            cfg.head_dim, ws, ws, cfg.ln_eps, nwx, nwy, H, W, True) ** 2)

    def f_ref(a):
        return jnp.sum(VB._window_attn_xla(
            a, lns, lnb, qkvw, bqkv, wo, bo, rhf, rwf, mask,
            cfg.num_heads, cfg.head_dim, ws, ws, cfg.ln_eps) ** 2)

    with pltpu.force_tpu_interpret_mode():
        out_k = VB._window_attn_call(x3, lns, lnb, qkvw, bqkv, wo, bo,
                                     rhf, rwf, 1, cfg.num_heads,
                                     cfg.head_dim, ws, ws, cfg.ln_eps,
                                     nwx, nwy, H, W, True)
        g_k = jax.grad(f_kernel)(x3)
    np.testing.assert_allclose(
        np.asarray(out_k),
        np.asarray(VB._window_attn_xla(x3, lns, lnb, qkvw, bqkv, wo, bo,
                                       rhf, rwf, mask, cfg.num_heads,
                                       cfg.head_dim, ws, ws, cfg.ln_eps)),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(jax.grad(f_ref)(x3)),
                               atol=1e-3, rtol=1e-3)

    # fused_ln_mlp half: f32 value + grad parity (with row padding: 75
    # rows forces the pad-to-block path)
    x2 = jax.random.normal(jax.random.PRNGKey(4), (75, C)) * 0.5
    mlns = blk["norm2"]["scale"][None]
    mlnb = blk["norm2"]["bias"][None]
    w1 = blk["mlp"]["fc1"]["kernel"]
    b1 = blk["mlp"]["fc1"]["bias"][None]
    w2 = blk["mlp"]["fc2"]["kernel"]
    b2 = blk["mlp"]["fc2"]["bias"][None]

    def m_kernel(a):
        ap = jnp.pad(a, ((0, 128 - 75), (0, 0)))
        return jnp.sum(VB._ln_mlp_call(ap, mlns, mlnb, w1, b1, w2, b2,
                                       cfg.ln_eps, 128)[:75] ** 2)

    def m_ref(a):
        return jnp.sum(VB._ln_mlp_xla(a, mlns, mlnb, w1, b1, w2, b2,
                                      cfg.ln_eps) ** 2)

    with pltpu.force_tpu_interpret_mode():
        ap = jnp.pad(x2, ((0, 128 - 75), (0, 0)))
        val_k = VB._ln_mlp_call(ap, mlns, mlnb, w1, b1, w2, b2,
                                cfg.ln_eps, 128)[:75]
        gm_k = jax.grad(m_kernel)(x2)
    np.testing.assert_allclose(
        np.asarray(val_k),
        np.asarray(VB._ln_mlp_xla(x2, mlns, mlnb, w1, b1, w2, b2,
                                  cfg.ln_eps)),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gm_k),
                               np.asarray(jax.grad(m_ref)(x2)),
                               atol=1e-3, rtol=1e-3)


def test_rms_norm_and_swiglu_custom_vjp_match_autodiff():
    """The minimal-residual custom VJPs (ops/layers._rms_norm/_swiglu)
    match plain-jnp autodiff in value and all gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ullsam_tpu.ops import layers as L

    rng = np.random.RandomState(7)
    B, S, H, M = 2, 6, 16, 40
    x = jnp.asarray(rng.randn(B, S, H), jnp.float32)
    scale = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)

    def ref_rms(s, xx):
        x32 = xx.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        return ((x32 * jax.lax.rsqrt(var + 1e-5))
                * s.astype(jnp.float32)).astype(xx.dtype)

    def loss_ref(s, xx):
        return jnp.sum(jnp.sin(ref_rms(s, xx)))

    def loss_new(s, xx):
        return jnp.sum(jnp.sin(L.rms_norm({"scale": s}, xx, eps=1e-5)))

    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(scale, x)
    v_n, g_n = jax.value_and_grad(loss_new, argnums=(0, 1))(scale, x)
    np.testing.assert_allclose(float(v_r), float(v_n), rtol=1e-6)
    for a, b in zip(g_r, g_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    p = L.swiglu_init(jax.random.PRNGKey(0), H, M)

    def ref_swiglu(pp, xx):
        return L.linear(pp["w2"], jax.nn.silu(L.linear(pp["w1"], xx))
                        * L.linear(pp["w3"], xx))

    def loss_sw(fn, pp, xx):
        return jnp.sum(jnp.cos(fn(pp, xx)))

    v_r, g_r = jax.value_and_grad(
        lambda pp, xx: loss_sw(ref_swiglu, pp, xx), argnums=(0, 1))(p, x)
    v_n, g_n = jax.value_and_grad(
        lambda pp, xx: loss_sw(L.swiglu, pp, xx), argnums=(0, 1))(p, x)
    np.testing.assert_allclose(float(v_r), float(v_n), rtol=1e-6)
    flat_r = jax.tree.leaves(g_r)
    flat_n = jax.tree.leaves(g_n)
    assert len(flat_r) == len(flat_n)
    for a, b in zip(flat_r, flat_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

def test_vit_window_packed_bwd_kernel_matches_xla_vjp():
    """Pallas window backward (interpret mode) vs the XLA-math vjp on all
    three cotangents (dqkvp, drhf, drwf), f32 exact and bf16 within
    rounding noise."""
    from ullsam_tpu.ops.pallas import flash_attention as FA

    nh, hd, kh, kw = 3, 64, 4, 4
    N = kh * kw
    B = 5
    HP = FA._HP
    rng = np.random.RandomState(1)
    qkvp = np.zeros((B, N, 3 * nh * HP), np.float32)
    for s in range(3):
        for h in range(nh):
            qkvp[:, :, (s * nh + h) * HP:(s * nh + h) * HP + hd] = \
                rng.randn(B, N, hd) * 0.3
    rhf = np.zeros((HP, kh * kh), np.float32)
    rwf = np.zeros((HP, kw * kw), np.float32)
    rhf[:hd] = rng.randn(hd, kh * kh) * 0.2
    rwf[:hd] = rng.randn(hd, kw * kw) * 0.2
    g = np.zeros((B, N, nh * HP), np.float32)
    for h in range(nh):
        g[:, :, h * HP:h * HP + hd] = rng.randn(B, N, hd) * 0.5

    for dt, tol in ((jnp.float32, 2e-3), (jnp.bfloat16, 3e-2)):
        args = (jnp.asarray(qkvp).astype(dt), jnp.asarray(rhf),
                jnp.asarray(rwf))
        gj = jnp.asarray(g).astype(dt)
        _, vjp = jax.vjp(
            lambda a, b, c: FA._window_packed_xla(a, b, c, nh, hd, kh, kw),
            *args)
        ref = vjp(gj)
        with pltpu.force_tpu_interpret_mode():
            got = FA._vit_window_packed_bwd_impl(*args, gj, nh, hd, kh, kw)
        for name, a, b in zip(("dqkvp", "drhf", "drwf"), got, ref):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
            assert err < tol, (name, dt, err)

def test_w8a16_matmul_kernel_matches_xla():
    """Pallas W8A16 decode matmul (interpret mode) is exact vs the XLA
    int8 path (same convert-then-dot semantics, fused scale)."""
    from ullsam_tpu.ops.pallas.int8_matmul import w8a16_matmul

    rng = np.random.RandomState(2)
    for M, K, N in [(8, 512, 1024), (1, 256, 384)]:
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        qw = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
        qs = jnp.asarray(rng.rand(N) * 0.01 + 0.001, jnp.float32)
        ref = (jnp.dot(x, qw.astype(x.dtype),
                       preferred_element_type=jnp.float32) * qs)
        bn = next(b for b in (512, 256, 128) if N % b == 0)
        with pltpu.force_tpu_interpret_mode():
            got = w8a16_matmul(x, qw, qs, block_n=bn)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

def test_vit_global_packed_attention_matches_xla():
    """Packed-global flash path (interpret mode) vs the XLA bias path:
    forward and every parameter gradient (exercises the packed custom
    vjp: unpack + fused flash backward + repack)."""
    from ullsam_tpu.core.config import ViTConfig
    from ullsam_tpu.models.sam import image_encoder as IE

    cfg = ViTConfig(img_size=512, patch_size=16, embed_dim=128, depth=1,
                    num_heads=2, window_size=0, global_attn_indexes=(0,))
    H = W = 32  # N=1024: one default-size kernel block
    rng = np.random.RandomState(0)
    params = IE._attn_init(jax.random.PRNGKey(0), cfg, (H, W))
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape) * 0.05, jnp.float32),
        params)
    x = jnp.asarray(rng.randn(1, H, W, cfg.embed_dim) * 0.2, jnp.float32)

    ref = IE._vit_attention(params, x, cfg, allow_window_kernel=False)
    with pltpu.force_tpu_interpret_mode():
        got = IE._vit_attention_global_packed(params, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def loss_packed(p, xx):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(IE._vit_attention_global_packed(p, xx, cfg) ** 2)

    def loss_ref(p, xx):
        return jnp.sum(IE._vit_attention(p, xx, cfg,
                                         allow_window_kernel=False) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_packed)(params, x)
    g2 = jax.grad(loss_ref)(params, x)
    g2map = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in jax.tree_util.tree_leaves_with_path(g1):
        b = g2map[path]
        err = (np.max(np.abs(np.asarray(a) - np.asarray(b)))
               / (np.max(np.abs(np.asarray(b))) + 1e-9))
        assert err < 5e-3, (path, err)
