from ullsam_tpu.models.ullsam.fusion import (
    extract_feature, fusion_forward, fusion_init, pixel_shuffle,
    pixel_unshuffle, scatter_image_embeds, segment_with_prompts,
    text_aware_dense_feature)
from ullsam_tpu.models.ullsam.conversation import (
    Conversation, build_chat_prompt, get_conv_template)
from ullsam_tpu.models.ullsam.chat import (batch_chat, chat, point_segment,
                                           segment_forward)
