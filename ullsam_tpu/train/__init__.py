from ullsam_tpu.train.step import (TrainConfig, combine_params,
                                   make_train_step, make_trainable_optimizer,
                                   partition_params, seg_loss_fn,
                                   trainable_mask)
from ullsam_tpu.train.losses import (bce_with_logits, binary_iou, dice_loss,
                                     instance_seg_loss)
from ullsam_tpu.train.checkpoint import CheckpointManager
from ullsam_tpu.train.metrics import MetricWriter, StepTimer
