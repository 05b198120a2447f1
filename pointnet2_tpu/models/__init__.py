from pointnet2_tpu.models.pointnet2_seg import PointNet2SemSeg, weighted_ce_loss

__all__ = ["PointNet2SemSeg", "weighted_ce_loss"]
