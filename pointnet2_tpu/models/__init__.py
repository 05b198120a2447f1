from pointnet2_tpu.models.pointnet2_seg import (
    PointNet2SemSeg,
    PointNet2SemSegMSG,
    precompute_geometry,
    weighted_ce_loss,
    weighted_ce_sum,
)

__all__ = [
    "PointNet2SemSeg",
    "PointNet2SemSegMSG",
    "precompute_geometry",
    "weighted_ce_loss",
    "weighted_ce_sum",
]
