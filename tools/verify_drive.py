"""Verification drive: exercise the framework end-to-end through the public
package API on the real TPU — synthetic scene -> dataset -> train steps ->
predict -> densify -> colors."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

t0 = time.time()
import jax

print("backend:", jax.default_backend(), jax.devices())

from pointnet2_tpu.config import Config
from pointnet2_tpu.data.io import read_pcd, write_labels, write_pcd, load_labels
from pointnet2_tpu.data.semantic3d import SemanticFileData
from pointnet2_tpu.data.voxel import majority_vote_labels, voxel_downsample_with_trace
from pointnet2_tpu.ops.densify import densify_labels
from pointnet2_tpu.train.trainer import Trainer
from pointnet2_tpu.utils.metrics import ConfusionMatrix

rng = np.random.RandomState(0)

# 1. Fabricate a scene: two separable strata (z<2 -> class 1, z>=2 -> class 5).
import tempfile, os

tmp = tempfile.mkdtemp()
n = 200_000
pts = rng.rand(n, 3) * [30, 30, 4]
labels = np.where(pts[:, 2] < 2, 1, 5).astype(np.int32)
colors = rng.rand(n, 3)
write_pcd(os.path.join(tmp, "scene.pcd"), pts, colors)
write_labels(os.path.join(tmp, "scene.labels"), labels)
print(f"[1] wrote synthetic scene: {n} pts -> {tmp}")

# 2. Voxel-downsample with trace + majority labels (ETL flow).
cloud = read_pcd(os.path.join(tmp, "scene.pcd"))
ds_pts, ds_cols, inverse, counts = voxel_downsample_with_trace(
    cloud.points, 0.5, cloud.colors
)
ds_labels = majority_vote_labels(inverse, load_labels(os.path.join(tmp, "scene.labels")), len(ds_pts))
write_pcd(os.path.join(tmp, "scene_ds.pcd"), ds_pts, ds_cols)
write_labels(os.path.join(tmp, "scene_ds.labels"), ds_labels)
print(f"[2] voxel downsample: {n} -> {len(ds_pts)} pts")

# 3. Dataset sampling on the downsampled scene.
fd = SemanticFileData(
    os.path.join(tmp, "scene_ds"), has_label=True, use_color=True,
    box_size_x=10, box_size_y=10, rng=np.random.RandomState(1),
)
cfg = Config(num_point=2048, batch_size=8,
             l1_npoint=512, l2_npoint=128, l3_npoint=32, l4_npoint=8)

def make_batch(b=8):
    data, lab, w = [], [], []
    for _ in range(b):
        c, r, l, col = fd.sample(cfg.num_point)
        data.append(np.hstack([c, col]).astype(np.float32))
        lab.append(l)
        w.append(np.ones(cfg.num_point, np.float32))
    return {
        "points": np.stack(data),
        "labels": np.stack(lab).astype(np.int32),
        "weights": np.stack(w),
    }

# 4. Train on the real TPU.
trainer = Trainer(cfg=cfg)
state = trainer.init_state(jax.random.PRNGKey(0))
drng = jax.random.PRNGKey(1)
t = time.time()
losses = []
for i in range(150):
    batch = make_batch()
    state, m = trainer.train_step(state, batch, drng)
    losses.append(float(m["loss"]))
print(f"[4] 150 train steps on {jax.default_backend()}: loss {losses[0]:.3f} -> {losses[-1]:.3f} "
      f"({time.time()-t:.1f}s incl. compile)")
assert losses[-1] < losses[0], "loss did not decrease"

# 5. Predict + confusion matrix (multi-sample sparse inference flow).
cm = ConfusionMatrix(9)
pts_collect, lab_collect = [], []
for _ in range(4):
    centered, raw, gt, col = fd.sample_batch(8, cfg.num_point)
    inp = np.concatenate([centered, col], -1).astype(np.float32)
    pred = np.asarray(trainer.predict_step(state, inp))
    cm.increment_from_list(gt.ravel(), pred.ravel())
    pts_collect.append(raw.reshape(-1, 3))
    lab_collect.append(pred.reshape(-1))
print(f"[5] sparse inference acc={cm.get_accuracy():.3f} mIoU={cm.get_mean_iou():.3f}")

# 5b. Windowed production mode: auto-calibrate, certify, and prove the
# labels bit-identical to the default exact path on this data.
from pointnet2_tpu.ops.calibrate import calibrate_model_windows

bq_w, fp_w = calibrate_model_windows(
    sa_specs=[(s.npoint, s.radius) for s in cfg.sa_layers],
    num_point=cfg.num_point,
    sample_xyz=lambda: make_batch()["points"][..., :3],
    num_batches=4,
)
if bq_w is not None or fp_w is not None:
    wtr = Trainer(cfg=cfg, bq_window=bq_w, fp_window=fp_w)
    centered, raw, gt, col = fd.sample_batch(8, cfg.num_point)
    inp = np.concatenate([centered, col], -1).astype(np.float32)
    assert wtr.check_bq_window(state, inp), "calibrated window must certify"
    agree = (
        np.asarray(wtr.predict_step(state, inp))
        == np.asarray(trainer.predict_step(state, inp))
    ).mean()
    print(f"[5b] windowed mode (bq={bq_w}, fp={fp_w}): certificate ok, "
          f"label agreement {agree:.6f}")
    assert agree == 1.0, "certified windowed path must be bit-identical"
else:
    print("[5b] windowing does not engage at this scale (exact kernels run)")

# 6. Densify back to the full 200k cloud with the native C++ engine.
sp = np.concatenate(pts_collect)
sl = np.concatenate(lab_collect).astype(np.int32)
t = time.time()
dense_labels, dense_colors = densify_labels(sp, sl, cloud.points, knn=3)
dt = time.time() - t
acc = (dense_labels == labels).mean()
sparse_acc = cm.get_accuracy()
print(f"[6] native densify {len(sp)} sparse -> {n} dense in {dt:.2f}s, dense acc={acc:.3f}")
assert acc > sparse_acc - 0.05, "densification must not lose accuracy vs sparse preds"

# 6b. Control: densify with ground-truth sparse labels -> near-perfect recovery.
gt_sl = np.where(sp[:, 2] < 2, 1, 5).astype(np.int32)
ctrl_labels, _ = densify_labels(sp, gt_sl, cloud.points, knn=3)
ctrl_acc = (ctrl_labels == labels).mean()
print(f"[6b] densify control with GT sparse labels: acc={ctrl_acc:.4f}")
assert ctrl_acc > 0.93, "GT densify must recover the strata (boundary band ~ sparse NN spacing)"
print("VERIFY OK", time.time() - t0)
