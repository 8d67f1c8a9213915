from ullsam_tpu.data.tokenizer import InternLM2Tokenizer, load_tokenizer
from ullsam_tpu.data.datasets import (DatasetConfig, PretrainDataset,
                                      SegDataset, SFTDataset,
                                      batch_iterator_sharded)
from ullsam_tpu.data.point_sampling import sample_instance_points
