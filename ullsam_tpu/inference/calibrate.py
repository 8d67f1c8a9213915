"""Closed-form synthetic-weight calibration for realistic-config AMG.

Under random init the AMG production config (pred_iou 0.88, stability
0.95, box NMS 0.7 — upstream defaults, SURVEY §2.13) commits ~zero
masks: the untrained IoU head passes nothing and every prompt's mask is
an unlocalized noise field whose bounding box spans the image, so NMS
collapses the lot. That leaves the NMS-survivor gather + selective
upscale path unexercised by any recorded benchmark (round-2 verdict).

`calibrate_amg_weights` rewrites a random param tree IN CLOSED FORM (no
training) so the genuine decode math produces localized, high-stability,
bf16-robust masks around each prompt. Construction:

  * the neck's final LN is zeroed -> image embedding == 0, so all
    spatial structure in the decoder comes from the Fourier position
    kernel K(x, p) = <pe(x), pe(p)> (PositionEmbeddingRandom,
    prompt_encoder.py:206-228), which peaks at the prompt p;
  * BOTH TwoWayTransformer image->token cross-attentions become
    position-matched injectors. Their q/k projections give every head
    the SAME 15 projection dims, each summing a GROUP of 8 sin-feature
    dims (identical heads avoid 8 per-head annuli whose staircase makes
    thresholds land on flat plateaus; group-mixing keeps all 120 sin
    frequencies in one coherent kernel). The point token's attention
    logit over image positions is then ~K(x, p), sharply peaked.
  * a SINK: projection dim 15 of every head carries a constant q-side
    bias B against a k-side spike on the first mask token's identifier
    channel. B is probed to ~`cut_level` of the per-prompt logit peak,
    so the softmax w_point(x) = sigmoid(l(x) - B) saturates to 1 only
    NEAR the peak (without the sink the transition sits at l ~ log 6,
    i.e. where K ~ 0, and masks degenerate to half-image blobs);
  * only the point token carries attention value (v reads the label
    channel that the positive-point embedding spikes; every other token
    self-identifies via cos-region identifier spikes under a sharp
    pass-through self-attention, so nothing smears into their values);
  * each injector writes its saturated field A_i(x) ~ w_point(x) along
    its own cos-region direction r_i into the image stream; all other
    out-projections/MLPs that could contaminate the token stream or the
    keys are zeroed; the FINAL token->image attention keeps its random
    init so the IoU head sees prompt-dependent variation;
  * the hypernetworks output a constant matched-filter read-out
    (h = mean[U at prompt - median U] from a one-shot probe of every
    upscale channel through the exact production math), thresholded
    at `cut` of the way from the far-field plateau to the at-prompt
    plateau: INTERSECTION semantics over the two injected fields, so
    false positives need both independent group-mixings to fire, and
    surviving boundaries are single-step logistic edges a fraction of a
    cell wide (large margins everywhere else -> bf16-stable masks,
    stability ~1);
  * channel C8-1 of the second upscale conv is made constant (kernel
    slice zeroed, bias 1 -> GELU(1)) to carry the threshold, and the
    2x2 taps of both transposed convs are averaged so all 16 output
    sub-pixels of an embedding cell respond identically;
  * the IoU head's final layer is rescaled/retargeted from the probe so
    predictions spread around iou_center (most pass 0.88, some don't).

The AMG machinery itself — fused Pallas TWT/upscale kernels, block-column
sweep, device NMS, survivor gather — is untouched: calibrated weights are
ordinary data flowing through the production path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def calibrate_amg_weights(params, cfg, *, seed: int = 0, kappa: float = 8.0,
                          self_beta: float = 4.0, inject_rho: float = 8.0,
                          steepness: float = 30.0,
                          pe_scale: float = 1.0,
                          cut: float = 0.7,
                          cut_level: float = 0.75,
                          iou_center: float = 0.91,
                          iou_spread: float = 0.025,
                          n_probe: int = 16):
    """Return a calibrated copy of a random-init SAM param tree."""
    import copy
    params = copy.deepcopy(jax.device_get(params))
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.RandomState(seed)

    enc = params["image_encoder"]
    pe_p = params["prompt_encoder"]
    dec = params["mask_decoder"]
    d = cfg.mask_decoder.transformer_dim            # 256
    internal = d // cfg.mask_decoder.attention_downsample_rate  # 128
    nm = cfg.mask_decoder.num_mask_tokens
    heads = cfg.mask_decoder.transformer_num_heads
    hd = internal // heads                          # 16
    n_feat = d // 2                                 # sin dims (128)
    emb_h = cfg.prompt_encoder.image_embedding_size[0]
    n_group = hd - 1                                # kernel proj dims/head
    # each injector gets a DISJOINT half of the sin dims: sharing them
    # makes the two kernels correlated (identical diagonal signal), and
    # the shared kernel's secondary maxima then fire BOTH injectors,
    # defeating the intersection suppression of false positives
    g_size = max((n_feat // 4) // n_group, 1)       # sin dims per group
    sink_cos = n_feat + 40                          # mask_token[0] identifier

    # 0. Fourier features: pe_scale tuned for the production 64x64 grid;
    #    smaller grids get higher frequencies to keep the bump radius
    #    similar in CELLS
    pe_eff = pe_scale * float(np.sqrt(64.0 / emb_h))
    pe_p["pe_gaussian"] = jnp.asarray(
        rng.randn(2, n_feat).astype(np.float32) * pe_eff)

    # 1. image embedding == 0: zero the neck's final LN affine
    enc["neck"]["ln2"]["scale"] = jnp.zeros_like(enc["neck"]["ln2"]["scale"])
    enc["neck"]["ln2"]["bias"] = jnp.zeros_like(enc["neck"]["ln2"]["bias"])

    # 2. prompt encoder: positive-label embed marks the point token on
    #    channel d-1; pads get a cos-region identifier spike; the no_mask
    #    dense vector keeps the keys' sin region pure PE
    lab = np.zeros((4, d), np.float32)
    lab[1, d - 1] = 2.0
    pe_p["point_embeds"] = jnp.asarray(lab)
    # identifier vectors span the whole cos region: the self-attention
    # splits tokens into `heads` dim-slices, so a single-spike identifier
    # self-identifies in only ONE head while the others uniform-mix and
    # smear the point's label into every token (the round-3 "1.81 leak")
    protected = np.array([sink_cos, d - 1])

    def cos_ident(mag=2.0):
        v = np.zeros((d,), np.float32)
        v[n_feat:] = rng.randn(d - n_feat).astype(np.float32) * mag
        v[protected] = 0.0
        return v

    pe_p["not_a_point"] = jnp.asarray(cos_ident())
    nm_vec = np.array(pe_p["no_mask"], np.float32) * 0.1
    nm_vec[:n_feat] = 0.0
    pe_p["no_mask"] = jnp.asarray(nm_vec)

    # 3. TwoWayTransformer rewiring
    tw = dec["transformer"]

    def zero_out(attn):
        attn["out"]["kernel"] = jnp.zeros_like(attn["out"]["kernel"])
        attn["out"]["bias"] = jnp.zeros_like(attn["out"]["bias"])

    def zero_mlp(layer):
        layer["mlp"]["fc2"]["kernel"] = jnp.zeros_like(
            layer["mlp"]["fc2"]["kernel"])
        layer["mlp"]["fc2"]["bias"] = jnp.zeros_like(
            layer["mlp"]["fc2"]["bias"])

    def make_injector(attn, perms, r_hat: np.ndarray):
        """Two head-GROUPS per injector, each group's heads identical:
        group g's kernel proj dim j (< n_group) sums sin-dim group
        perms[g][j*gs:(j+1)*gs]; proj dim hd-1 is the sink (k reads the
        first mask token's identifier spike; the q bias lands there once
        probed). v reads the label channel; out writes A(x) along r_hat.
        A(x) = mean of the two group fields, so full amplitude needs BOTH
        independent kernels to fire — with two injectors that is a 4-way
        intersection, collapsing kernel-coincidence false positives."""
        wq = np.zeros((d, internal), np.float32)
        wk = np.zeros((d, internal), np.float32)
        for h in range(heads):
            perm = perms[0] if h < heads // 2 else perms[1]
            for j in range(n_group):
                for s_dim in perm[j * g_size:(j + 1) * g_size]:
                    wq[s_dim, h * hd + j] = kappa
                    wk[s_dim, h * hd + j] = 1.0
            wk[sink_cos, h * hd + hd - 1] = 1.0
        attn["q"]["kernel"] = jnp.asarray(wq)
        attn["k"]["kernel"] = jnp.asarray(wk)
        wv = np.zeros((d, internal), np.float32)
        wv[d - 1, :] = 1.0
        attn["v"]["kernel"] = jnp.asarray(wv)
        wo = np.tile((inject_rho / internal) * r_hat[None, :], (internal, 1))
        attn["out"]["kernel"] = jnp.asarray(wo)
        for k in ("q", "k", "v", "out"):
            attn[k]["bias"] = jnp.zeros_like(attn[k]["bias"])

    def set_sink_bias(attn, B: float):
        b = np.zeros((internal,), np.float32)
        for h in range(heads):
            b[h * hd + hd - 1] = B
        attn["q"]["bias"] = jnp.asarray(b)

    # injection directions: cos region only, orthogonal, avoiding the
    # label/identifier channels
    cos_span = np.arange(n_feat, d - 1)
    cos_span = cos_span[cos_span != sink_cos]
    basis = rng.randn(len(cos_span), 2).astype(np.float32)
    q_mat, _ = np.linalg.qr(basis)
    r1 = np.zeros((d,), np.float32)
    r2 = np.zeros((d,), np.float32)
    r1[cos_span] = q_mat[:, 0]
    r2[cos_span] = q_mat[:, 1]

    l1, l2 = tw["layers"][0], tw["layers"][1]
    eye_d = jnp.eye(d, dtype=jnp.float32)
    sa = l1["self_attn"]
    sa["q"]["kernel"] = self_beta * eye_d
    sa["k"]["kernel"] = self_beta * eye_d
    sa["v"]["kernel"] = eye_d
    sa["out"]["kernel"] = eye_d
    for k in ("q", "k", "v", "out"):
        sa[k]["bias"] = jnp.zeros_like(sa[k]["bias"])
    zero_out(l1["cross_attn_t2i"])
    zero_mlp(l1)
    perm = rng.permutation(n_feat)
    quarter = n_feat // 4
    qs = [perm[i * quarter:(i + 1) * quarter][:n_group * g_size]
          for i in range(4)]
    make_injector(l1["cross_attn_i2t"], (qs[0], qs[1]), r1)

    zero_out(l2["self_attn"])
    zero_out(l2["cross_attn_t2i"])
    zero_mlp(l2)
    make_injector(l2["cross_attn_i2t"], (qs[2], qs[3]), r2)
    # final token->image attention keeps its random init (IoU variation)

    # token identifiers: full-spectrum cos-region patterns; mask token 0
    # additionally spikes the sink channel (the sink key the q-side bias
    # dots against); iou token gets one too (sin region + label stay 0)
    ident = np.stack([cos_ident() for _ in range(nm)])
    ident[0, sink_cos] = 3.0
    dec["mask_tokens"] = jnp.asarray(ident)
    dec["iou_token"] = jnp.asarray(cos_ident()[None])

    # 4. upscale convs: tap-average both transposed convs (all 16 output
    #    sub-pixels respond identically) + constant channel C8-1
    k1 = np.array(dec["upscale"]["convt1"]["kernel"], np.float32)
    k1[:] = k1.mean(axis=(0, 1), keepdims=True)
    dec["upscale"]["convt1"]["kernel"] = jnp.asarray(k1)
    c8 = dec["upscale"]["convt2"]["kernel"].shape[-1]
    k2 = np.array(dec["upscale"]["convt2"]["kernel"], np.float32)
    k2[:] = k2.mean(axis=(0, 1), keepdims=True)
    k2[..., c8 - 1] = 0.0
    dec["upscale"]["convt2"]["kernel"] = jnp.asarray(k2)
    b2 = np.array(dec["upscale"]["convt2"].get(
        "bias", np.zeros((c8,), np.float32)), np.float32)
    b2[c8 - 1] = 1.0
    dec["upscale"]["convt2"]["bias"] = jnp.asarray(b2)

    # --- probes ----------------------------------------------------------
    from ullsam_tpu.models.sam import mask_decoder as MD
    from ullsam_tpu.models.sam import prompt_encoder as PEm
    from ullsam_tpu.models.sam.two_way_transformer import (
        _proj_attn, two_way_transformer_apply)
    from ullsam_tpu.ops import layers as L

    h, w = cfg.prompt_encoder.image_embedding_size
    emb = jnp.zeros((1, h, w, d), jnp.float32)
    g = int(np.ceil(np.sqrt(n_probe)))
    # interior span, EVEN grid count: the Fourier sin features vanish at
    # the image center (coords map to 2c-1, zero at c=0.5), so a probe at
    # the exact center has a dead kernel and would collapse the
    # min-anchored sink bias to ~0. Border prompts have the weakest
    # kernels; anchoring
    # the sink to them would lower every prompt's cut and raise false-fire
    # rates globally. Border prompts may fire partially and get dropped by
    # the stability/IoU filters — exactly how AMG treats weak prompts.
    pts = (np.stack(np.meshgrid(np.linspace(0.15, 0.85, g),
                                np.linspace(0.15, 0.85, g)), -1)
           .reshape(-1, 2)[:n_probe] * cfg.vit.img_size)
    pts_j = jnp.asarray(pts[:, None, :], jnp.float32)
    labels = jnp.ones((pts_j.shape[0], 1), jnp.int32)
    P = pts_j.shape[0]

    sparse, dense = PEm.prompt_encoder_apply(pe_p, cfg.prompt_encoder,
                                             points=(pts_j, labels))
    image_pe = PEm.get_dense_pe(pe_p, cfg.prompt_encoder)
    pe_flat = image_pe.reshape(1, h * w, d)
    out_tok = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (P, 1 + nm, d)), sparse], axis=1)
    src = (emb + dense[:1].astype(emb.dtype))
    src_flat = src.reshape(1, h * w, d)
    pt_idx = 1 + nm                                  # point token position

    def tok_chain(layer, t):
        t = L.layer_norm(layer["norm1"], t, eps=cfg.mask_decoder.ln_eps)
        t = L.layer_norm(layer["norm2"], t, eps=cfg.mask_decoder.ln_eps)
        return L.layer_norm(layer["norm3"], t, eps=cfg.mask_decoder.ln_eps)

    def i2t_point_peak(attn, keys_base, toks):
        """(median point-token peak logit, sink logit per unit q-bias).
        Heads are identical by construction; mean over heads."""
        q = np.asarray(L.linear(attn["q"], keys_base + pe_flat), np.float32)
        k = np.asarray(L.linear(attn["k"], toks + tokens), np.float32)
        qh = q.reshape(-1, h * w, heads, hd)[0]       # [N, heads, hd]
        kh = k.reshape(P, -1, heads, hd)
        lg = np.einsum("xhd,phd->pxh", qh, kh[:, pt_idx]) * (hd ** -0.5)
        # both head-groups must fire at the prompt: anchor to the weaker
        # group's peak, and to the MINIMUM over probe prompts (a median
        # anchor leaves the weaker half of prompts with their peak near
        # the cut, where the whole mask is numerically marginal and
        # flips under bf16)
        ga = lg[:, :, :heads // 2].mean(axis=2).max(axis=1)
        gb = lg[:, :, heads // 2:].mean(axis=2).max(axis=1)
        peak = float(np.minimum(ga, gb).min() * 0.95)
        # sink token = mask token 0 (stream position 1): its k at the
        # sink projection dim scales the q-side bias into the logit
        sink_gain = float(np.median(kh[:, 1, :, hd - 1])) * (hd ** -0.5)
        return peak, sink_gain

    # sink bias for injector 1: cut the softmax at cut_level of the
    # per-prompt logit peak
    t_sa = _proj_attn(l1["self_attn"], tokens, tokens, tokens, heads)
    t1 = tok_chain(l1, t_sa)
    peak1, gain1 = i2t_point_peak(l1["cross_attn_i2t"], src_flat, t1)
    B1 = cut_level * peak1 / max(gain1, 1e-6)
    set_sink_bias(l1["cross_attn_i2t"], B1)

    # replicate layer-1's keys update (with the sink in place) to probe
    # injector 2 against its actual queries
    upd = _proj_attn(l1["cross_attn_i2t"], src_flat + pe_flat,
                     t1 + tokens, t1, heads)
    keys_l1 = L.layer_norm(l1["norm4"], src_flat + upd,
                           eps=cfg.mask_decoder.ln_eps)
    t2 = tok_chain(l2, t1)
    peak2, gain2 = i2t_point_peak(l2["cross_attn_i2t"], keys_l1, t2)
    B2 = cut_level * peak2 / max(gain2, 1e-6)
    set_sink_bias(l2["cross_attn_i2t"], B2)

    # four-state intersection read-out. The injected amplitudes are
    # measured at the prompt cell, then the four key states (neither/
    # either/both injectors firing) are pushed through the exact upscale
    # math. The read-out direction separates BOTH-on from the best
    # single-on state and the threshold sits midway between them, so a
    # site where only one random kernel false-fires lands below cut by
    # half that margin BY CONSTRUCTION (a global matched filter can end
    # up dominated by one injector, letting its false fires through).
    cx = np.clip((pts[:, 0] / cfg.vit.img_size * w).astype(int), 0, w - 1)
    cy = np.clip((pts[:, 1] / cfg.vit.img_size * h).astype(int), 0, h - 1)
    n_at = cy * w + cx

    lam1 = float(np.median(
        np.asarray(upd, np.float32)[np.arange(P), n_at] @ r1))
    upd2 = _proj_attn(l2["cross_attn_i2t"], keys_l1 + pe_flat,
                      t2 + tokens, t2, heads)
    lam2 = float(np.median(
        np.asarray(upd2, np.float32)[np.arange(P), n_at] @ r2))

    c_vec = jnp.asarray(nm_vec)[None, None, :]        # src constant
    eps_ln = cfg.mask_decoder.ln_eps

    def key_state(on1, on2):
        k = c_vec + float(on1) * lam1 * jnp.asarray(r1)
        k = L.layer_norm(l1["norm4"], k, eps=eps_ln)
        k = k + float(on2) * lam2 * jnp.asarray(r2)
        return L.layer_norm(l2["norm4"], k, eps=eps_ln)

    eye1 = jnp.eye(c8, dtype=jnp.float32)[None]
    def u_of(kst):
        u = MD._upscale_hypernet_cols(dec["upscale"], eye1, kst)
        return np.asarray(u, np.float32).reshape(c8, 16)[:, 0]

    U00, U10 = u_of(key_state(False, False)), u_of(key_state(True, False))
    U01, U11 = u_of(key_state(False, True)), u_of(key_state(True, True))

    alpha = U11 - 0.5 * (U10 + U01)
    alpha[c8 - 1] = 0.0
    alpha /= np.linalg.norm(alpha) + 1e-9
    f11 = float(U11 @ alpha)
    f_single = max(float(U10 @ alpha), float(U01 @ alpha),
                   float(U00 @ alpha))
    margin = f11 - f_single                           # > 0 by construction

    g1 = float(jax.nn.gelu(jnp.float32(1.0), approximate=False))
    for m in range(nm):
        rho = f_single + margin * (cut - 0.06 * m)
        s_m = steepness / (abs(margin) + 1e-9)
        mlp = dec["hyper_mlps"][m]["layers"][-1]
        mlp["kernel"] = jnp.zeros_like(mlp["kernel"])
        b = alpha * s_m
        b[c8 - 1] = -(s_m * rho) / g1
        mlp["bias"] = jnp.asarray(b)

    # IoU-head probe still needs the real token-side outputs
    hs, _ = two_way_transformer_apply(
        dec["transformer"], cfg.mask_decoder, src, image_pe, tokens)
    iou = np.asarray(L.mlp_stack(dec["iou_head"], hs[:, 0, :]), np.float32)
    head = dec["iou_head"]["layers"][-1]
    k_old = np.asarray(head["kernel"], np.float32)
    b_old = np.asarray(head["bias"], np.float32)
    med = np.median(iou, axis=0)
    spread = np.std(iou, axis=0) + 1e-6
    scale = iou_spread / spread
    head["kernel"] = jnp.asarray(k_old * scale[None, :])
    head["bias"] = jnp.asarray(iou_center - scale * (med - b_old))

    return params
