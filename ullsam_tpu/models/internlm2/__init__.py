from ullsam_tpu.models.internlm2.model import (
    KVCache, embed_tokens, init_cache, internlm2_decode_step,
    internlm2_forward, internlm2_init, internlm2_prefill)
from ullsam_tpu.models.internlm2.generate import (GenerationConfig, generate,
                                                  sample_token)
