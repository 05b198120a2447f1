from pointnet2_tpu.train.trainer import (
    TrainState,
    Trainer,
    bn_momentum_schedule,
    learning_rate_schedule,
)

__all__ = [
    "TrainState",
    "Trainer",
    "learning_rate_schedule",
    "bn_momentum_schedule",
]
