"""Point-cloud augmentation (NumPy, host-side).

Parity with util/provider.py: the training pipeline uses per-cloud random
z-rotation (rotate_point_cloud / rotate_feature_point_cloud, used at
dataset/semantic_dataset.py:305-309); jitter/shift/scale/dropout exist in the
reference but are unused — provided here for completeness.
"""

from __future__ import annotations

import numpy as np

_AXES = {
    "x": lambda c, s: np.array([[1, 0, 0], [0, c, s], [0, -s, c]]),
    "y": lambda c, s: np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]),
    "z": lambda c, s: np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]),
}


def _rotation(angle: float, axis: str) -> np.ndarray:
    if axis not in _AXES:
        raise ValueError("Wrong rotation axis")
    return _AXES[axis](np.cos(angle), np.sin(angle))


def rotate_point_cloud(
    batch_data: np.ndarray, rotation_axis: str = "z", rng: np.random.RandomState | None = None
) -> np.ndarray:
    """Per-cloud random rotation of (B, N, 3) xyz (util/provider.py:35-69)."""
    if np.ndim(batch_data) != 3:
        raise ValueError("np.ndim(batch_data) != 3, must be (b, n, 3)")
    if batch_data.shape[2] != 3:
        raise ValueError("batch_data.shape[2] != 3, must be (x, y, z)")
    rng = rng or np.random
    out = np.zeros(batch_data.shape, dtype=np.float32)
    for k in range(batch_data.shape[0]):
        rot = _rotation(rng.uniform() * 2 * np.pi, rotation_axis)
        out[k] = batch_data[k].reshape(-1, 3) @ rot
    return out


def rotate_feature_point_cloud(
    batch_data: np.ndarray,
    feature_size: int = 3,
    rotation_axis: str = "z",
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """Rotate xyz only, pass features through (util/provider.py:72-103)."""
    rng = rng or np.random
    out = np.zeros(batch_data.shape, dtype=np.float32)
    out[:, :, 3 : 3 + feature_size] = batch_data[:, :, 3 : 3 + feature_size]
    for k in range(batch_data.shape[0]):
        rot = _rotation(rng.uniform() * 2 * np.pi, rotation_axis)
        out[k, :, :3] = batch_data[k, :, :3].reshape(-1, 3) @ rot
    return out


def jitter_point_cloud(
    batch_data: np.ndarray, sigma: float = 0.01, clip: float = 0.05
) -> np.ndarray:
    """Gaussian jitter (util/provider.py:248-259; unused by the pipeline)."""
    jittered = np.clip(sigma * np.random.randn(*batch_data.shape), -clip, clip)
    return batch_data + jittered


def shift_point_cloud(batch_data: np.ndarray, shift_range: float = 0.1) -> np.ndarray:
    """Random per-cloud shift (util/provider.py:262-273)."""
    b = batch_data.shape[0]
    shifts = np.random.uniform(-shift_range, shift_range, (b, 3))
    return batch_data + shifts[:, None, :]


def random_scale_point_cloud(
    batch_data: np.ndarray, scale_low: float = 0.8, scale_high: float = 1.25
) -> np.ndarray:
    """Random per-cloud scale (util/provider.py:276-287)."""
    b = batch_data.shape[0]
    scales = np.random.uniform(scale_low, scale_high, b)
    return batch_data * scales[:, None, None]


def random_point_dropout(
    batch_pc: np.ndarray, max_dropout_ratio: float = 0.875
) -> np.ndarray:
    """Replace a random fraction of points with the first point
    (util/provider.py:290-297)."""
    out = batch_pc.copy()
    for b in range(out.shape[0]):
        dropout_ratio = np.random.random() * max_dropout_ratio
        drop = np.where(np.random.random(out.shape[1]) <= dropout_ratio)[0]
        if len(drop) > 0:
            out[b, drop, :] = out[b, 0, :]
    return out


def shuffle_points(batch_data: np.ndarray) -> np.ndarray:
    """Shuffle point order, same permutation batch-wide (util/provider.py:22-32)."""
    idx = np.arange(batch_data.shape[1])
    np.random.shuffle(idx)
    return batch_data[:, idx, :]
