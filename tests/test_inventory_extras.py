"""Inventory-completion components: classification head, stream_chat,
batched dict Sam.forward."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TOKENIZER_DIR = "/root/reference/modeling/tokenizer"


def test_sequence_classification():
    from ullsam_tpu.core.config import internlm2_tiny
    from ullsam_tpu.models.internlm2 import model as M
    from ullsam_tpu.models.internlm2.classification import (
        classification_head_init, internlm2_classify)

    cfg = internlm2_tiny()
    params = M.internlm2_init(jax.random.PRNGKey(0), cfg)
    head = classification_head_init(jax.random.PRNGKey(1), cfg, 3)
    ids = jnp.asarray([[5, 9, 11, 2, 2], [7, 23, 55, 4, 9]])
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    out = internlm2_classify(params, head, cfg, ids, mask,
                             labels=jnp.asarray([0, 2]))
    assert out["logits"].shape == (2, 3)
    assert np.isfinite(float(out["loss"]))
    # padded row must use the hidden at position 2, not 4
    out_b = internlm2_classify(params, head, cfg, ids[:, :3], mask[:, :3])
    np.testing.assert_allclose(np.asarray(out["logits"][0]),
                               np.asarray(out_b["logits"][0]), atol=1e-4)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(TOKENIZER_DIR, "tokenizer.model")),
    reason="tokenizer asset not available")
def test_stream_chat_matches_chat():
    from tests.test_engine import _tiny_setup
    from ullsam_tpu.models.internlm2.generate import GenerationConfig
    from ullsam_tpu.models.ullsam.chat import chat, stream_chat

    cfg, params, tk = _tiny_setup()
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    gen = GenerationConfig(max_new_tokens=5)
    deltas = list(stream_chat(params, cfg, tk, img, "What?", gen=gen))
    full = chat(params, cfg, tk, img, "What?", gen=gen)
    assert "".join(deltas).strip() == full


def test_sam_batched_forward_dict_api():
    from tests.test_amg import TINY_SAM
    from ullsam_tpu.models.sam import sam as S
    from ullsam_tpu.models.sam.sam import sam_batched_forward

    params = S.sam_init(jax.random.PRNGKey(0), TINY_SAM)
    rng = np.random.RandomState(0)
    batched_input = [
        {"image": (rng.rand(64, 64, 3) * 255).astype(np.float32),
         "original_size": (50, 60),
         "point_coords": np.asarray([[[20.0, 30.0]]]),
         "point_labels": np.asarray([[1]])},
        {"image": (rng.rand(64, 64, 3) * 255).astype(np.float32),
         "original_size": (64, 64),
         "boxes": np.asarray([[5.0, 5.0, 40.0, 40.0]])},
    ]
    out = sam_batched_forward(params, TINY_SAM, batched_input,
                              multimask_output=True)
    assert out[0]["masks"].shape == (1, 3, 50, 60)
    assert out[0]["masks"].dtype == bool
    assert out[0]["iou_predictions"].shape == (1, 3)
    assert out[0]["low_res_logits"].shape == (1, 3, 32, 32)
    assert out[1]["masks"].shape == (1, 3, 64, 64)


def test_beam_search():
    from ullsam_tpu.core.config import internlm2_tiny
    from ullsam_tpu.models.internlm2 import model as M
    from ullsam_tpu.models.internlm2.generate import (GenerationConfig,
                                                      beam_search, generate)

    cfg = internlm2_tiny()
    params = M.internlm2_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[5, 9, 11, 42]])
    embeds = M.embed_tokens(params, ids)
    mask = jnp.ones_like(ids)

    def seq_logprob(tokens):
        """Total logprob of a continuation under the model."""
        toks = [int(t) for t in tokens if int(t) != cfg.pad_token_id]
        if toks and toks[-1] != cfg.eos_token_id:
            pass
        full = jnp.asarray([[5, 9, 11, 42] + toks])
        out = M.internlm2_forward(params, cfg, input_ids=full)
        logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1)
        total = 0.0
        for i, t in enumerate(toks):
            total += float(logp[0, 3 + i, t])
        return total

    greedy_tokens, _ = generate(params, cfg,
                                GenerationConfig(max_new_tokens=6,
                                                 eos_token_id=2,
                                                 pad_token_id=2),
                                embeds, mask)
    beam_tokens, beam_score = beam_search(params, cfg, embeds, mask,
                                          num_beams=4, max_new_tokens=6,
                                          length_penalty=1.0)
    g = seq_logprob(np.asarray(greedy_tokens[0]))
    b = seq_logprob(np.asarray(beam_tokens))
    assert b >= g - 1e-4, (b, g)
    assert np.isfinite(float(beam_score))


def test_convert_cli_roundtrip(tmp_path):
    """Full converter CLI path: torch .pth -> npz -> params load."""
    import torch

    from tests.test_amg import TINY_SAM
    from ullsam_tpu.convert.cli import main as convert_main
    from ullsam_tpu.models.sam import sam as S
    from ullsam_tpu.train.checkpoint import load_params_npz

    # build a torch-style state dict from our own init via inverse mapping
    params = S.sam_init(jax.random.PRNGKey(0), TINY_SAM)
    from ullsam_tpu.core.tree import flatten_with_paths
    import numpy as _np

    # synthesize a minimal torch checkpoint with reference-layout keys for
    # the prompt encoder only (full inverse mapping is exercised by the
    # golden suite); here we check the CLI plumbing end to end with the
    # sam_micro golden as the source .pth
    import os
    g = dict(_np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                   "sam_micro.npz")))
    sd = {k: torch.tensor(v) for k, v in g.items()
          if "." in k and k.split(".")[0] in
          ("image_encoder", "prompt_encoder", "mask_decoder")}
    pth = tmp_path / "sam_micro.pth"
    torch.save(sd, str(pth))

    out = tmp_path / "sam_micro.npz"
    # the sam_micro golden uses a custom tiny config; monkeypatch registry
    import ullsam_tpu.core.config as C
    from tests.test_sam_parity import MD_TINY, PE_TINY
    tiny_cfg = C.SamConfig(
        vit=C.ViTConfig(img_size=64, patch_size=8, embed_dim=32, depth=2,
                        num_heads=2, mlp_ratio=2.0, out_chans=32,
                        window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PE_TINY, mask_decoder=MD_TINY)
    C.SAM_REGISTRY["_test_tiny"] = lambda: tiny_cfg
    try:
        convert_main(["--kind", "sam", "--variant", "_test_tiny",
                      "--input", str(pth), "--output", str(out)])
        assert out.exists()
        template = S.sam_init(jax.random.PRNGKey(1), tiny_cfg)
        loaded = load_params_npz(str(out), template)
        # converted params reproduce the golden end-to-end output
        image = jnp.asarray(g["image"].transpose(1, 2, 0))[None]
        x = S.preprocess(image, tiny_cfg)
        emb = S.encode_image(loaded, tiny_cfg, x)
        low_res, iou = S.decode_masks(
            loaded, tiny_cfg, emb,
            points=(jnp.asarray(g["coords"]), jnp.asarray(g["labels"])),
            multimask_output=True)
        np.testing.assert_allclose(np.asarray(iou), g["iou_predictions"],
                                   atol=1e-3)
    finally:
        C.SAM_REGISTRY.pop("_test_tiny")
