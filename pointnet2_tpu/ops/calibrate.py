"""Window calibration for the sliced neighbor kernels (host-side NumPy).

The calibrated-window ops (:func:`pointnet2_tpu.ops.ball_query_calibrated`,
:func:`pointnet2_tpu.ops.three_nn_calibrated`) sweep only a static
``window``-wide slice of the x-sorted dataset per 128-query tile and return
a scalar exactness certificate. This module computes, from representative
data, the window each level would need for the certificate to hold — the
calibrate-ahead half of the calibrate-ahead + runtime-certificate contract
(no in-graph fallback: a TPU ``lax.cond`` costs more than the windowing
saves, tools/bq_cond_probe.py).

Used by ``tools/bq_window_calibrate.py`` (offline report) and by the
``--bq_window auto`` / ``--fp_window auto`` CLI modes in ``train.py`` /
``predict.py`` (self-calibration from sampled batches at startup).

Reference context: the windows accelerate the ops behind the reference's
``query_ball_point`` (tf_ops/tf_grouping.cpp) and ``three_nn``
(tf_ops/tf_interpolate.cpp:213-243); exactness vs those semantics is
certified at runtime, calibration only picks the width.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

_LANES = 128


def parse_window_arg(v: str):
    """CLI value for ``--bq_window`` / ``--fp_window``.

    Accepts an int (one width shared by every level), the string ``auto``
    (self-calibrate from sampled batches at startup), or a per-level comma
    list like ``3072,768,-,-`` where ``-``/``none`` keeps that level on the
    exact full kernel (PointNet2SemSeg.bq_window 4-tuple form).
    """
    if v == "auto":
        return v
    if "," in v:
        return tuple(
            None if s.strip().lower() in ("-", "none", "") else int(s)
            for s in v.split(",")
        )
    return int(v)


def required_bq_window(
    xyz: np.ndarray, queries: np.ndarray, radius: float
) -> int:
    """Max columns any 128-query tile must sweep (ballquery.py tile math).

    Mirrors ops/pallas/ballquery.py's window placement exactly: tiles are
    cut from the x-sorted queries, the window starts at the 128-aligned
    floor of the leftmost in-radius column and must reach the rightmost
    in-radius column.
    """
    b, n, _ = xyz.shape
    m = queries.shape[1]
    tm = min(_LANES, m)
    t = max(m // tm, 1)
    worst = 0
    for bi in range(b):
        xs = np.sort(xyz[bi, :, 0])
        qs = np.sort(queries[bi, :, 0])[: t * tm].reshape(t, tm)
        lo = np.searchsorted(xs, qs.min(axis=1) - radius)
        hi = np.searchsorted(xs, qs.max(axis=1) + radius)
        lo_aligned = (lo // _LANES) * _LANES
        worst = max(worst, int((hi - lo_aligned).max()))
    return worst


def required_fp_window(
    dataset: np.ndarray, queries: np.ndarray, k: int = 3
) -> int:
    """Smallest 128-multiple window certifying exact kNN (knn.py placement).

    Simulates ops.pallas.knn_sliced's centered window placement and its
    strict certificate (k-th pick < squared x-distance to the nearest
    excluded column) per candidate width; returns the smallest width that
    certifies for every query, or the padded dataset size when none does
    (the op then statically falls back to the full exact kernel).
    """
    b, m, _ = dataset.shape
    nq = queries.shape[1]
    tq = min(_LANES, nq)
    t = max(nq // tq, 1)
    mpad = int(np.ceil(m / _LANES) * _LANES)
    worst = _LANES
    for bi in range(b):
        order = np.argsort(dataset[bi, :, 0], kind="stable")
        xsx = dataset[bi, order, 0]
        qorder = np.argsort(queries[bi, :, 0], kind="stable")
        qs = queries[bi][qorder][: t * tq].reshape(t, tq, 3)
        # exact k-th NN squared distance per (sorted) query
        d2 = ((qs.reshape(-1, 1, 3) - dataset[bi][None]) ** 2).sum(-1)
        kth = np.sort(d2, axis=1)[:, k - 1].reshape(t, tq)
        qx = qs[..., 0]
        mid = (
            np.searchsorted(xsx, qx.min(axis=1))
            + np.searchsorted(xsx, qx.max(axis=1))
        ) // 2
        need = mpad  # fallback: no width below the cloud size certifies
        for w in range(_LANES, mpad, _LANES):
            lo = ((mid - w // 2 + _LANES // 2) // _LANES) * _LANES
            lo = np.clip(lo, 0, max(mpad - w, 0))
            xl = xsx[np.clip(lo - 1, 0, m - 1)]
            xr = xsx[np.clip(lo + w, 0, m - 1)]
            bl = np.where(
                (lo > 0)[:, None],
                np.maximum(qx - xl[:, None], 0.0) ** 2,
                np.inf,
            )
            br = np.where(
                (lo + w < m)[:, None],
                np.maximum(xr[:, None] - qx, 0.0) ** 2,
                np.inf,
            )
            if (kth < np.minimum(bl, br)).all():
                need = w
                break
        worst = max(worst, need)
    return worst


def calibrate_model_windows(
    sa_specs: Sequence[Tuple[int, float]],
    num_point: int,
    sample_xyz: Callable[[], np.ndarray],
    num_batches: int = 8,
    margin: float = 1.25,
) -> Tuple[Optional[int], Optional[int]]:
    """Pick ``(bq_window, fp_window)`` from sampled batches, or None.

    ``sa_specs`` is ``[(npoint, radius), ...]`` per SA level (Config's
    ``sa_layers``); ``sample_xyz()`` returns one ``(B, N, 3)`` float32
    batch of raw coordinates in the training regime. FPS centroids are
    computed with the real op (:func:`pointnet2_tpu.ops.fps_centroids`) so
    the calibrated spans see exactly the queries the model will issue.

    Per-level worst-case widths are collected (margin-scaled, 128-aligned)
    and ONE width per op is chosen that is safe at every level it engages:
    a window W engages at a level only when W < that level's cloud size
    (otherwise the calibrated op statically falls back to the full exact
    kernel), so the chosen W is raised until every engaged level's
    requirement is met — raising past a level's cloud size disengages it,
    which is always exact. A window that would not engage anywhere returns
    None for that slot. The runtime certificates still guard the chosen
    widths on every eval; calibration picks good values, the certificates
    prove them.
    """
    import jax

    from pointnet2_tpu import ops

    fps = jax.jit(ops.fps_centroids, static_argnums=1)
    nlevels = len(sa_specs)
    bq_req = [0] * nlevels  # per level: cloud -> ball query of its centroids
    fp_req = [0] * nlevels  # per level: centroids -> 3-NN back onto cloud
    for _ in range(num_batches):
        cloud = np.ascontiguousarray(sample_xyz()[..., :3], np.float32)
        for li, (npoint, radius) in enumerate(sa_specs):
            _, centroids = jax.tree.map(np.asarray, fps(cloud, npoint))
            bq_req[li] = max(
                bq_req[li], required_bq_window(cloud, centroids, radius)
            )
            fp_req[li] = max(fp_req[li], required_fp_window(centroids, cloud))
            cloud = centroids

    # bq at level li queries the PREVIOUS cloud; fp at li queries back onto it
    clouds = [num_point] + [npoint for npoint, _ in sa_specs[:-1]]
    fp_clouds = [npoint for npoint, _ in sa_specs]
    return (
        choose_window(bq_req, clouds, margin),
        choose_window(fp_req, fp_clouds, margin),
    )


def choose_window(
    reqs: Sequence[int], cloud_sizes: Sequence[int], margin: float = 1.25
) -> Optional[int]:
    """One width safe at every level it engages, or None if it never would.

    A window W engages at a level only when W < that level's dataset
    (cloud) size — the calibrated ops statically run the full exact kernel
    otherwise — so W is raised (margin-scaled, 128-aligned) until every
    engaged level's requirement is met; when no width below a level's
    cloud certifies, W is raised to the cloud size to disengage it, which
    is always exact.
    """
    w = 0
    for req, cloud in sorted(zip(reqs, cloud_sizes), key=lambda t: -t[1]):
        if w and w >= cloud:
            continue  # statically disengaged: exact full kernel runs
        need = int(np.ceil(req * margin / _LANES) * _LANES)
        w = max(w, cloud if need >= cloud else need)
    return w if 0 < w < max(cloud_sizes) else None
