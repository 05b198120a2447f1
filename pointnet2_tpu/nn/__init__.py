from pointnet2_tpu.nn.layers import BatchNorm, SharedMLP
from pointnet2_tpu.nn.pointnet import (
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMSG,
)

__all__ = [
    "BatchNorm",
    "SharedMLP",
    "SetAbstraction",
    "SetAbstractionMSG",
    "FeaturePropagation",
]
