from minddiffusion_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
)
from minddiffusion_tpu.train.lr_schedules import warmup_then_decay
from minddiffusion_tpu.train.optim import (build_optimizer, lora_checkpoint_transform,
                                            trainable_mask)

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "warmup_then_decay",
    "build_optimizer",
    "lora_checkpoint_transform",
    "trainable_mask",
]
