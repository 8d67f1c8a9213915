from ullsam_tpu.models.internvit.model import (internvit_init,
                                               internvit_apply)
