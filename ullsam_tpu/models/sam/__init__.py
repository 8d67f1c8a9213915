from ullsam_tpu.models.sam.sam import (
    sam_init, preprocess, encode_image, decode_masks, postprocess_masks,
    sam_point_predict)
from ullsam_tpu.models.sam.registry import build_sam

__all__ = [
    "sam_init", "preprocess", "encode_image", "decode_masks",
    "postprocess_masks", "sam_point_predict", "build_sam",
]
