from ullsam_tpu.inference.predictor import SamPredictor
from ullsam_tpu.inference.amg import AutomaticMaskGenerator
from ullsam_tpu.inference.transforms import (ResizeLongestSide,
                                             pad_to_square, reverse_padding)
