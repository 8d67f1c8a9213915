"""Checkpoint conversion CLI: torch layouts -> native npz/orbax trees.

  python -m ullsam_tpu.convert.cli --kind sam --variant vit_b \
      --input sam_vit_b.pth --output sam_vit_b.npz
  python -m ullsam_tpu.convert.cli --kind fusion --input ullsam.pt \
      --output ullsam_params.npz
  python -m ullsam_tpu.convert.cli --kind internlm2 --input hf_model_dir \
      --output internlm2.npz --prefix language_model.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="torch -> ullsam_tpu converter")
    p.add_argument("--kind", choices=["sam", "internlm2", "fusion"],
                   required=True)
    p.add_argument("--input", required=True,
                   help=".pth/.pt file or HF safetensors dir")
    p.add_argument("--output", required=True, help=".npz output path")
    p.add_argument("--variant", default="vit_b")
    p.add_argument("--prefix", default="",
                   help="key prefix in the source state dict")
    args = p.parse_args(argv)

    from ullsam_tpu.core.config import (SAM_REGISTRY, FusionConfig,
                                        internlm2_1_8b)
    from ullsam_tpu.train.checkpoint import save_params_npz

    if args.kind == "sam":
        from ullsam_tpu.convert.torch_sam import (convert_sam_state_dict,
                                                  load_torch_state_dict)
        cfg = SAM_REGISTRY[args.variant]()
        sd = load_torch_state_dict(args.input)
        prefix = ("image_encoder." if any(k.startswith("image_encoder.")
                                          for k in sd) else "vision_model.")
        params = convert_sam_state_dict(sd, cfg, vision_prefix=prefix)
    elif args.kind == "internlm2":
        import os
        cfg = internlm2_1_8b()
        if os.path.isdir(args.input):
            from ullsam_tpu.convert.torch_internlm2 import (
                load_internlm2_safetensors)
            params = load_internlm2_safetensors(args.input, cfg,
                                                prefix=args.prefix)
        else:
            from ullsam_tpu.convert.torch_internlm2 import (
                convert_internlm2_state_dict)
            from ullsam_tpu.convert.torch_sam import load_torch_state_dict
            params = convert_internlm2_state_dict(
                load_torch_state_dict(args.input), cfg, prefix=args.prefix)
    else:
        from ullsam_tpu.convert.torch_fusion import convert_fusion_state_dict
        from ullsam_tpu.convert.torch_sam import load_torch_state_dict
        cfg = FusionConfig(sam=SAM_REGISTRY[args.variant]())
        params = convert_fusion_state_dict(
            load_torch_state_dict(args.input), cfg, prefix=args.prefix)

    save_params_npz(args.output, params)
    from ullsam_tpu.core.tree import param_count
    print(f"wrote {args.output}: {param_count(params)/1e6:.1f}M params")


if __name__ == "__main__":
    main()
