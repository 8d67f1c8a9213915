"""Generate golden parity fixtures from the torch reference at /root/reference.

Run once (CPU): python tools/make_goldens.py
Writes tests/goldens/*.npz containing tiny-config torch state dicts, inputs,
and outputs. Tests then run the ullsam_tpu converter + models against these.
The reference repo is only needed to (re)generate fixtures, not to run tests.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, REFERENCE)

import numpy as np
import torch

torch.manual_seed(0)


def state_dict_np(module, prefix=""):
    return {prefix + k: v.detach().float().numpy()
            for k, v in module.state_dict().items()}


def randomize_zeros(module):
    """Give zero-initialized params (pos_embed, rel_pos) random values so the
    parity test actually exercises those code paths."""
    with torch.no_grad():
        for name, p in module.named_parameters():
            if torch.all(p == 0):
                p.normal_(0, 0.02)


def save(name, **arrays):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name + ".npz")
    np.savez_compressed(path, **arrays)
    total = sum(a.size * a.itemsize for a in arrays.values())
    print(f"wrote {path} ({len(arrays)} arrays, {total/1e6:.2f} MB)")



def quantize_fp16(*modules):
    """Round module weights to fp16 (stored compactly; loaded back so golden
    outputs are computed with the exact stored values)."""
    with torch.no_grad():
        for m in modules:
            for p in list(m.parameters()) + list(m.buffers()):
                p.copy_(p.half().float())


def make_vit_tiny():
    from functools import partial
    from modeling.image_encoder import ImageEncoderViT

    torch.manual_seed(1)
    m = ImageEncoderViT(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=2.0, out_chans=16, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_abs_pos=True, use_rel_pos=True, window_size=2,
        global_attn_indexes=(1,),
    ).eval()
    randomize_zeros(m)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        y = m(x)
    save("vit_tiny",
         x=x.detach().numpy(), y=y.detach().numpy(),
         **state_dict_np(m, "image_encoder."))


def make_prompt_encoder_tiny():
    from modeling.prompt_encoder import PromptEncoder

    torch.manual_seed(2)
    m = PromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                      input_image_size=(64, 64), mask_in_chans=8).eval()
    coords = torch.rand(2, 3, 2) * 64
    labels = torch.tensor([[1, 0, -1], [1, 1, 0]])
    boxes = torch.tensor([[4.0, 6.0, 40.0, 50.0], [0.0, 0.0, 63.0, 63.0]])
    masks = torch.randn(2, 1, 32, 32)
    llm_hidden = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        sp_pts, dn_pts = m(points=(coords, labels), boxes=None, masks=None)
        sp_pb, dn_pb = m(points=(coords, labels), boxes=boxes, masks=None)
        sp_m, dn_m = m(points=None, boxes=None, masks=masks)
        sp_llm, dn_llm = m(points=(coords, labels), boxes=None, masks=None,
                           llm_hidden_states=llm_hidden)
        dense_pe = m.get_dense_pe()
    save("prompt_encoder_tiny",
         coords=coords.detach().numpy(), labels=labels.detach().numpy(), boxes=boxes.detach().numpy(),
         masks=masks.detach().numpy(), llm_hidden=llm_hidden.detach().numpy(),
         sparse_points=sp_pts.detach().numpy(), dense_points=dn_pts.detach().numpy(),
         sparse_pb=sp_pb.detach().numpy(), dense_pb=dn_pb.detach().numpy(),
         sparse_mask=sp_m.detach().numpy(), dense_mask=dn_m.detach().numpy(),
         sparse_llm=sp_llm.detach().numpy(), dense_llm=dn_llm.detach().numpy(),
         dense_pe=dense_pe.detach().numpy(),
         **state_dict_np(m, "prompt_encoder."))


def make_mask_decoder_tiny():
    from modeling.mask_decoder import MaskDecoder
    from modeling.transformer import TwoWayTransformer

    torch.manual_seed(3)
    m = MaskDecoder(
        transformer_dim=32,
        transformer=TwoWayTransformer(depth=2, embedding_dim=32, mlp_dim=64,
                                      num_heads=2),
        num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=16,
    ).eval()
    img = torch.randn(1, 32, 8, 8)
    pe = torch.randn(1, 32, 8, 8)
    sparse = torch.randn(2, 3, 32)
    dense = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        masks_multi, iou_multi = m(img, pe, sparse, dense, multimask_output=True)
        masks_single, iou_single = m(img, pe, sparse, dense, multimask_output=False)
    save("mask_decoder_tiny",
         img=img.detach().numpy(), pe=pe.detach().numpy(), sparse=sparse.detach().numpy(),
         dense=dense.detach().numpy(),
         masks_multi=masks_multi.detach().numpy(), iou_multi=iou_multi.detach().numpy(),
         masks_single=masks_single.detach().numpy(), iou_single=iou_single.detach().numpy(),
         **state_dict_np(m, "mask_decoder."))


def make_rel_pos_interp():
    from modeling.image_encoder import get_rel_pos

    torch.manual_seed(4)
    rel_pos = torch.randn(5, 8)
    out = get_rel_pos(4, 4, rel_pos)  # needs length 7 -> interpolation path
    out2 = get_rel_pos(4, 8, rel_pos)  # q != k scaling path
    save("rel_pos_interp", rel_pos=rel_pos.detach().numpy(), out_44=out.detach().numpy(),
         out_48=out2.detach().numpy())


def make_sam_micro():
    """Tiny end-to-end Sam: encoder + prompt + decoder on a 64px image."""
    from functools import partial
    from modeling.image_encoder import ImageEncoderViT
    from modeling.prompt_encoder import PromptEncoder
    from modeling.mask_decoder import MaskDecoder
    from modeling.transformer import TwoWayTransformer
    from modeling.sam import Sam

    torch.manual_seed(5)
    sam = Sam(
        image_encoder=ImageEncoderViT(
            img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=2.0, out_chans=32, qkv_bias=True,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            use_abs_pos=True, use_rel_pos=True, window_size=2,
            global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoder(
            embed_dim=32, image_embedding_size=(8, 8),
            input_image_size=(64, 64), mask_in_chans=8),
        mask_decoder=MaskDecoder(
            transformer_dim=32,
            transformer=TwoWayTransformer(depth=2, embedding_dim=32,
                                          mlp_dim=64, num_heads=2),
            num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=16),
    ).eval()
    randomize_zeros(sam)
    image = torch.rand(3, 64, 64) * 255.0
    coords = torch.tensor([[[20.0, 30.0]]])
    labels = torch.tensor([[1]])
    with torch.no_grad():
        out = sam([{"image": image, "original_size": (48, 60),
                    "point_coords": coords, "point_labels": labels}],
                  multimask_output=True)
    save("sam_micro",
         image=image.detach().numpy(), coords=coords.detach().numpy(), labels=labels.detach().numpy(),
         low_res_logits=out[0]["low_res_logits"].detach().numpy(),
         iou_predictions=out[0]["iou_predictions"].detach().numpy(),
         masks=out[0]["masks"].detach().numpy().astype(np.uint8),
         **state_dict_np(sam))




def make_internlm2_tiny():
    """Tiny InternLM2: padded-batch forward, hidden states, greedy generate,
    and RoPE-scaling variants."""
    from modeling.configuration_internlm2 import InternLM2Config as RefCfg
    from modeling.modeling_internlm2 import InternLM2ForCausalLM

    torch.manual_seed(6)

    def build(rope_scaling=None):
        cfg = RefCfg(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=32, bias=False, tie_word_embeddings=False,
            rms_norm_eps=1e-5,
            rope_theta=10000.0, rope_scaling=rope_scaling,
            attn_implementation="eager", torch_dtype="float32",
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
        )
        m = InternLM2ForCausalLM(cfg).float().eval()
        return m

    m = build()
    input_ids = torch.tensor([[5, 9, 11, 42, 77, 3, 8, 2],
                              [7, 23, 55, 4, 0, 0, 0, 0]])
    attn = torch.tensor([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]])
    with torch.no_grad():
        out = m(input_ids=input_ids, attention_mask=attn,
                output_hidden_states=True)
    hs = torch.stack(out.hidden_states, 0)  # [L+1, B, S, H]

    # greedy generate with LEFT padding (batch_chat path,
    # modeling_internvl_sam.py:370)
    left_ids = torch.tensor([[0, 0, 5, 9, 11, 42], [7, 23, 55, 4, 9, 13]])
    left_attn = torch.tensor([[0, 0, 1, 1, 1, 1], [1] * 6])
    # manual greedy loop (installed transformers lacks GenerationMixin on
    # custom models); mirrors HF generate position-id semantics
    with torch.no_grad():
        cur_attn = left_attn.clone()
        pos = (cur_attn.cumsum(-1) - 1).clamp(min=0)
        out_g = m(input_ids=left_ids, attention_mask=cur_attn,
                  position_ids=pos, use_cache=True)
        past = out_g.past_key_values
        tok = out_g.logits[:, -1].argmax(-1)
        toks = [tok]
        for _ in range(7):
            cur_attn = torch.cat(
                [cur_attn, torch.ones(cur_attn.shape[0], 1, dtype=cur_attn.dtype)], 1)
            pos_new = (cur_attn.sum(-1, keepdim=True) - 1).long()
            out_g = m(input_ids=tok[:, None], attention_mask=cur_attn,
                      position_ids=pos_new, past_key_values=past,
                      use_cache=True)
            past = out_g.past_key_values
            tok = out_g.logits[:, -1].argmax(-1)
            toks.append(tok)
    gen_new = torch.stack(toks, 1)

    # rope scaling variants (forward only, no padding)
    ids2 = torch.tensor([[5, 9, 11, 42, 77, 3, 8, 2]])
    outs = {}
    for name, rs in [("linear", {"type": "linear", "factor": 2.0}),
                     ("dynamic", {"type": "dynamic", "factor": 2.0})]:
        torch.manual_seed(6)
        m2 = build(rope_scaling=rs)
        # force the NTK path by exceeding max_position_embeddings
        if name == "dynamic":
            m2.model.layers[0].attention.max_position_embeddings = 4
            for lyr in m2.model.layers:
                lyr.attention.max_position_embeddings = 4
                lyr.attention.config.max_position_embeddings = 4
                lyr.attention._init_rope()
        with torch.no_grad():
            outs[name] = m2(input_ids=ids2).logits

    save("internlm2_tiny",
         input_ids=input_ids.numpy(), attention_mask=attn.numpy(),
         logits=out.logits.detach().numpy(),
         hidden_states=hs.detach().numpy(),
         left_ids=left_ids.numpy(), left_attn=left_attn.numpy(),
         gen_new=gen_new.numpy(),
         ids2=ids2.numpy(),
         logits_linear=outs["linear"].detach().numpy(),
         logits_dynamic=outs["dynamic"].detach().numpy(),
         **state_dict_np(m))




def make_fusion_tiny():
    """Tiny full uLLSAM chain: fused forward -> LLM dense prompt -> SAM
    decoder (BASELINE config #4 / app.py:580-644 path). Vision tower must
    emit [B,256,64,64] (the fusion model hardcodes sam_hidden=256, 64x64)."""
    from functools import partial
    from modeling.image_encoder import ImageEncoderViT
    from modeling.prompt_encoder import PromptEncoder
    from modeling.mask_decoder import MaskDecoder
    from modeling.transformer import TwoWayTransformer
    from modeling.configuration_internvl_chat import InternVLChatConfig
    from modeling.modeling_internvl_sam import InternVLSAMModel

    torch.manual_seed(7)
    vit = ImageEncoderViT(
        img_size=1024, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        mlp_ratio=1.0, out_chans=256, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_abs_pos=True, use_rel_pos=True, window_size=2,
        global_attn_indexes=())
    llm_cfg = dict(
        architectures=["InternLM2ForCausalLM"], vocab_size=128,
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, bias=False, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager", torch_dtype="float32",
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    cfg = InternVLChatConfig(
        vision_config={"architectures": ["InternVisionModel"]},
        llm_config=llm_cfg, select_layer=-1, downsample_ratio=0.5,
        template="internlm2-chat", ps_version="v2")
    model = InternVLSAMModel(cfg, vision_model=vit).float().eval()
    randomize_zeros(model)
    model.img_context_token_id = 100

    pe = PromptEncoder(embed_dim=256, image_embedding_size=(64, 64),
                       input_image_size=(1024, 1024), mask_in_chans=16).eval()
    md = MaskDecoder(
        transformer_dim=256,
        transformer=TwoWayTransformer(depth=2, embedding_dim=256,
                                      mlp_dim=128, num_heads=4),
        num_multimask_outputs=3, iou_head_depth=3,
        iou_head_hidden_dim=32).eval()

    quantize_fp16(model, pe, md)

    torch.manual_seed(8)
    pixel_values = torch.rand(1, 3, 1024, 1024)
    n_ctx = 1024
    ids = [5, 6] + [100] * n_ctx + [9, 11, 3, 7, 2]
    input_ids = torch.tensor([ids])
    labels = torch.tensor([[(-100 if t == 100 else t) for t in ids]])
    image_flags = torch.ones(1, 1, dtype=torch.long)

    with torch.no_grad():
        out = model(pixel_values=pixel_values, input_ids=input_ids,
                    attention_mask=torch.ones_like(input_ids),
                    image_flags=image_flags, labels=labels,
                    output_hidden_states=True, return_dict=True)
        dense = out.hidden_states            # [1, 256, 64, 64]
        sam_feats = out.image_embeddings     # [1, 256, 64, 64]
        coords = torch.tensor([[[512.0, 400.0], [100.0, 900.0]]])
        pt_labels = torch.tensor([[1, 0]])
        sparse_e, dense_e = pe(points=(coords, pt_labels), boxes=None,
                               masks=None, llm_hidden_states=dense)
        masks, iou = md(image_embeddings=sam_feats,
                        image_pe=pe.get_dense_pe(),
                        sparse_prompt_embeddings=sparse_e,
                        dense_prompt_embeddings=dense_e,
                        multimask_output=False)

    save("fusion_tiny",
         input_ids=input_ids.numpy(), labels=labels.numpy(),
         logits=out.logits.detach().numpy().astype(np.float32),
         loss=np.asarray(out.loss.detach().numpy()),
         dense=dense.detach().numpy().astype(np.float16),
         sam_feats=sam_feats.detach().numpy().astype(np.float16),
         coords=coords.numpy(), pt_labels=pt_labels.numpy(),
         seg_masks=masks.detach().numpy().astype(np.float16),
         seg_iou=iou.detach().numpy(),
         **{k: v.astype(np.float16) for k, v in
            state_dict_np(model, "fusion.").items()},
         **{k: v.astype(np.float16) for k, v in
            state_dict_np(pe, "prompt_encoder.").items()},
         **{k: v.astype(np.float16) for k, v in
            state_dict_np(md, "mask_decoder.").items()})


def make_conversation_goldens():
    from modeling.conversation import get_conv_template

    def prompt(name, question, history=None):
        t = get_conv_template(name)
        for q, a in (history or []):
            t.append_message(t.roles[0], q)
            t.append_message(t.roles[1], a)
        t.append_message(t.roles[0], question)
        t.append_message(t.roles[1], None)
        return t.get_prompt()

    prompts = {
        "internlm2_simple": prompt("internlm2-chat", "Describe the image.\n<image>"),
        "internlm2_history": prompt("internlm2-chat", "And now?",
                                    history=[("Hi", "Hello!")]),
        "hermes": prompt("Hermes-2", "What is this?\n<image>"),
        "phi3": prompt("phi3-chat", "Segment the cell.\n<image>"),
        "internvl25": prompt("internvl2_5", "Caption.\n<image>"),
    }
    save("conversation", **{k: np.array(v) for k, v in prompts.items()})

def make_amg_goldens():
    import sys
    sys.path.insert(0, REFERENCE)
    from utils import amg as ref

    torch.manual_seed(9)
    logits = torch.randn(6, 32, 32) * 3
    stab = ref.calculate_stability_score(logits, 0.0, 1.0)

    masks = logits > 0.0
    # make one empty mask to exercise the empty-box path
    masks[3] = False
    boxes = ref.batched_mask_to_box(masks)

    rles = ref.mask_to_rle_pytorch(masks)
    areas = [ref.area_from_rle(r) for r in rles]

    grids = ref.build_point_grid(4)
    all_grids = ref.build_all_layer_point_grids(8, 2, 2)
    crop_boxes, layer_idxs = ref.generate_crop_boxes((50, 73), 2, 0.34)

    counts0 = np.asarray(rles[0]["counts"], np.int64)
    counts3 = np.asarray(rles[3]["counts"], np.int64)
    save("amg_primitives",
         logits=logits.numpy(), masks=masks.numpy(),
         stability=stab.numpy(), boxes=boxes.numpy(),
         rle_counts_0=counts0, rle_counts_3=counts3,
         areas=np.asarray(areas, np.int64),
         grid4=grids, grid_all_0=all_grids[0], grid_all_1=all_grids[1],
         grid_all_2=all_grids[2],
         crop_boxes=np.asarray(crop_boxes, np.int64),
         layer_idxs=np.asarray(layer_idxs, np.int64))


def _build_sam_micro():
    from functools import partial
    from modeling.image_encoder import ImageEncoderViT
    from modeling.prompt_encoder import PromptEncoder
    from modeling.mask_decoder import MaskDecoder
    from modeling.transformer import TwoWayTransformer
    from modeling.sam import Sam

    torch.manual_seed(5)
    sam = Sam(
        image_encoder=ImageEncoderViT(
            img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=2.0, out_chans=32, qkv_bias=True,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            use_abs_pos=True, use_rel_pos=True, window_size=2,
            global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoder(
            embed_dim=32, image_embedding_size=(8, 8),
            input_image_size=(64, 64), mask_in_chans=8),
        mask_decoder=MaskDecoder(
            transformer_dim=32,
            transformer=TwoWayTransformer(depth=2, embedding_dim=32,
                                          mlp_dim=64, num_heads=2),
            num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=16),
    ).eval()
    randomize_zeros(sam)
    return sam


def make_onnx_model_golden():
    """SamOnnxModel behavior on the sam_micro weights (utils/onnx.py:17-144):
    mask-input lerp, best-mask selection, stability scores, orig-size
    postprocess — all flag combinations."""
    # utils/onnx.py relative-imports ..modeling: load it under a synthetic
    # parent package rooted at the reference checkout
    import types
    if "refpkg" not in sys.modules:
        pkg = types.ModuleType("refpkg")
        pkg.__path__ = [REFERENCE]
        sys.modules["refpkg"] = pkg
    from refpkg.utils.onnx import SamOnnxModel

    sam = _build_sam_micro()
    torch.manual_seed(10)
    embedding = torch.randn(1, 32, 8, 8)
    coords3 = torch.rand(1, 3, 2) * 64
    labels3 = torch.tensor([[1, 0, -1]], dtype=torch.float32)
    coords2 = coords3[:, :2]
    labels2 = torch.tensor([[1, -1]], dtype=torch.float32)
    mask_input = torch.randn(1, 1, 32, 32)
    orig_im_size = torch.tensor([48.0, 60.0])

    out = {}
    with torch.no_grad():
        for tag, single, stab, extra, hm, coords, labels in [
            ("multi_nomask", False, False, False, 0.0, coords3, labels3),
            ("multi_mask", False, False, False, 1.0, coords3, labels3),
            ("single_np3", True, False, False, 0.0, coords3, labels3),
            ("single_np2", True, False, False, 1.0, coords2, labels2),
            ("stab_extra", False, True, True, 1.0, coords3, labels3),
        ]:
            m = SamOnnxModel(sam, return_single_mask=single,
                             use_stability_score=stab,
                             return_extra_metrics=extra)
            res = m(embedding, coords, labels, mask_input,
                    torch.tensor([hm]), orig_im_size)
            if extra:
                up, sc, st, areas, low = res
                out[tag + "_stability"] = st.numpy()
                out[tag + "_areas"] = areas.numpy().astype(np.int64)
            else:
                up, sc, low = res
            out[tag + "_upscaled"] = up.numpy()
            out[tag + "_scores"] = sc.numpy()
            out[tag + "_lowres"] = low.numpy()

    save("onnx_model",
         embedding=embedding.numpy(),
         coords3=coords3.numpy(), labels3=labels3.numpy().astype(np.int64),
         coords2=coords2.numpy(), labels2=labels2.numpy().astype(np.int64),
         mask_input=mask_input.numpy(),
         orig_im_size=np.asarray([48, 60], np.int64),
         **out, **state_dict_np(sam))


def make_sam_vitb_full_golden():
    """Flagship-shape golden: FULL-SIZE SAM ViT-B (1024^2, window 14,
    global [2,5,8,11] — build_sam.py:37-44,60-101) end-to-end point->mask.
    Weights are synthesized per-key (tools/synth_weights.py) so only the
    manifest + outputs are stored, not ~360MB of parameters."""
    from functools import partial
    from modeling.image_encoder import ImageEncoderViT
    from modeling.prompt_encoder import PromptEncoder
    from modeling.mask_decoder import MaskDecoder
    from modeling.transformer import TwoWayTransformer
    from modeling.sam import Sam

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_weights import (manifest_to_arrays, synth_array)

    sam = Sam(
        image_encoder=ImageEncoderViT(
            depth=12, embed_dim=768, img_size=1024, mlp_ratio=4,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), num_heads=12,
            patch_size=16, qkv_bias=True, use_rel_pos=True,
            global_attn_indexes=[2, 5, 8, 11], window_size=14,
            out_chans=256),
        prompt_encoder=PromptEncoder(
            embed_dim=256, image_embedding_size=(64, 64),
            input_image_size=(1024, 1024), mask_in_chans=16),
        mask_decoder=MaskDecoder(
            num_multimask_outputs=3,
            transformer=TwoWayTransformer(depth=2, embedding_dim=256,
                                          mlp_dim=2048, num_heads=8),
            transformer_dim=256, iou_head_depth=3, iou_head_hidden_dim=256),
    ).eval()
    manifest = [(k, tuple(v.shape)) for k, v in sam.state_dict().items()]
    sam.load_state_dict({k: torch.from_numpy(synth_array(k, s))
                         for k, s in manifest})

    # original 768x1000 image, longest-side-resized to 786x1024 (test
    # regenerates the image from the same seed instead of storing 3MB)
    image = torch.from_numpy(
        (np.random.RandomState(123).rand(3, 786, 1024) * 255
         ).astype(np.float32))
    coords = torch.tensor([[[512.5, 400.25], [210.0, 713.0]]])
    labels = torch.tensor([[1, 0]])
    with torch.no_grad():
        emb = sam.image_encoder(sam.preprocess(image[None]))
        out = sam([{"image": image, "original_size": (768, 1000),
                    "point_coords": coords, "point_labels": labels}],
                  multimask_output=True)
    masks = out[0]["masks"].numpy()  # [1, 3, 768, 1000] bool
    keys, shapes = manifest_to_arrays(manifest)
    save("sam_vitb_full",
         manifest_keys=keys, manifest_shapes=shapes,
         coords=coords.numpy(), labels=labels.numpy(),
         emb=emb.numpy().astype(np.float16),
         low_res=out[0]["low_res_logits"].numpy().astype(np.float16),
         iou=out[0]["iou_predictions"].numpy(),
         masks_packed=np.packbits(masks),
         masks_shape=np.asarray(masks.shape, np.int64))


def make_internlm2_fulldims_golden():
    """Flagship-shape golden: real-dims InternLM2 block stack (hidden 2048,
    GQA 16:8, intermediate 8192, vocab 92553 — configuration_internlm2.py
    :77-150 as deployed in InternVL2.5-2B) at 2 layers, synthesized weights."""
    from modeling.configuration_internlm2 import InternLM2Config as RefCfg
    from modeling.modeling_internlm2 import InternLM2ForCausalLM

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_weights import manifest_to_arrays, synth_array

    cfg = RefCfg(
        vocab_size=92553, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=2, num_attention_heads=16, num_key_value_heads=8,
        max_position_embeddings=32768, bias=False, tie_word_embeddings=False,
        rms_norm_eps=1e-5, rope_theta=1000000.0, rope_scaling=None,
        attn_implementation="eager", torch_dtype="float32",
        pad_token_id=2, bos_token_id=1, eos_token_id=2)
    m = InternLM2ForCausalLM(cfg).float().eval()
    manifest = [(k, tuple(v.shape)) for k, v in m.state_dict().items()]
    m.load_state_dict({k: torch.from_numpy(synth_array(k, s))
                       for k, s in manifest})

    rs = np.random.RandomState(11)
    ids = rs.randint(3, 92553, (2, 48))
    attn = np.ones((2, 48), np.int64)
    attn[1, 32:] = 0  # padded row exercises the mask path
    with torch.no_grad():
        out = m(input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(attn),
                output_hidden_states=True)
    hs = torch.stack(out.hidden_states, 0)  # [L+1, B, S, H]
    keys, shapes = manifest_to_arrays(manifest)
    save("internlm2_fulldims",
         manifest_keys=keys, manifest_shapes=shapes,
         input_ids=ids.astype(np.int64), attention_mask=attn,
         hidden_states=hs.numpy().astype(np.float16),
         logits_head=out.logits[:, :, :512].numpy().astype(np.float16),
         argmax=out.logits.argmax(-1).numpy().astype(np.int32))


if __name__ == "__main__":
    make_vit_tiny()
    make_prompt_encoder_tiny()
    make_mask_decoder_tiny()
    make_rel_pos_interp()
    make_sam_micro()
    make_internlm2_tiny()
    make_fusion_tiny()
    make_conversation_goldens()
    make_amg_goldens()
    make_onnx_model_golden()
    make_sam_vitb_full_golden()
    make_internlm2_fulldims_golden()
