from pointnet2_tpu.models.pointnet2_seg import (
    PointNet2SemSeg,
    PointNet2SemSegMSG,
    weighted_ce_loss,
)

__all__ = ["PointNet2SemSeg", "PointNet2SemSegMSG", "weighted_ce_loss"]
