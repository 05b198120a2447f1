"""pointnet2_tpu — TPU-native PointNet++ Semantic3D framework.

A brand-new JAX/XLA/Pallas implementation with the full capabilities of the
isl-org/Open3D-PointNet2-Semantic3D reference pipeline (TF1 + CUDA/C++),
re-designed TPU-first:

- ``ops``       hierarchical point-set operators (FPS, ball query, grouping,
                3-NN interpolation) as XLA programs + Pallas TPU kernels,
                replacing the reference's CUDA custom ops (tf_ops/*.cu).
- ``nn``        functional neural modules (shared MLP, SetAbstraction,
                FeaturePropagation) replacing util/pointnet_util.py + tf_util.py.
- ``models``    the PointNet++ SSG segmentation network (model.py parity).
- ``data``      Semantic3D / KITTI ETL: pcd IO, voxel downsample with trace,
                z-box sampling, augmentation, async prefetch.
- ``parallel``  device-mesh data parallelism (pjit/shard_map over ICI).
- ``train``     jitted train/eval steps, schedules, orbax checkpoints.
- ``utils``     metrics, colors, logging, profiling.
"""

__version__ = "0.1.0"
