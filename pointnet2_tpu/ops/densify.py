"""Label densification: sparse predictions -> full-resolution clouds.

Equivalent of the reference's InterpolateLabelWithColor op
(tf_ops/tf_interpolate.cpp:52-185): for every dense point, find the k nearest
sparse (predicted) points and take the majority label — ties broken by which
label first reaches the max count in ascending-distance order — then map
labels to the fixed 9-color palette.

Four engines, auto-dispatched by `densify_labels`:
- native:  C++ grid KNN + OpenMP (native/densify.cpp) — the production path
           for dense clouds with 10^8+ points;
- scipy:   cKDTree fallback when the native .so isn't built;
- device:  chunked brute-force top-k on TPU for moderate clouds, used by the
           fused KITTI predict+densify path (kitti_predict.py parity) where
           the cloud is ~10^5 points and already on-device;
- sharded: the device engine with the dense cloud point-sharded over every
           visible chip (parallel/sharded_ops.py).
"""

from __future__ import annotations

import functools

import numpy as np

from pointnet2_tpu.utils.colors import LABEL_COLORS_UINT8


def _majority_in_distance_order(neighbor_labels: np.ndarray) -> np.ndarray:
    """(Q, k) labels sorted by ascending distance -> (Q,) majority labels.

    Vectorized first-to-reach-max-count majority (tf_interpolate.cpp:100-112).
    """
    q, k = neighbor_labels.shape
    counts = np.zeros((q, k), np.int32)  # count of label j among first i+1
    best_count = np.zeros(q, np.int32)
    best_label = neighbor_labels[:, 0].copy()
    # running counts per unique label: small k -> O(k^2) comparisons
    for i in range(k):
        lab = neighbor_labels[:, i]
        c = np.zeros(q, np.int32)
        for j in range(i + 1):
            c += neighbor_labels[:, j] == lab
        better = c > best_count
        best_count = np.where(better, c, best_count)
        best_label = np.where(better, lab, best_label)
    return best_label


def densify_labels(
    sparse_points: np.ndarray,
    sparse_labels: np.ndarray,
    dense_points: np.ndarray,
    knn: int = 3,
    engine: str = "auto",
):
    """Returns (dense_labels (N,) int32, dense_colors (N, 3) uint8)."""
    sparse_points = np.ascontiguousarray(sparse_points, np.float32)
    sparse_labels = np.ascontiguousarray(sparse_labels, np.int32)
    dense_points = np.ascontiguousarray(dense_points, np.float32)
    knn = int(min(knn, len(sparse_points)))

    if engine in ("auto", "native"):
        from pointnet2_tpu.native import densify_labels_native

        out = densify_labels_native(sparse_points, sparse_labels, dense_points, knn)
        if out is not None:
            return out
        if engine == "native":
            raise RuntimeError("native engine requested but libpn2native.so missing")

    if engine == "device":
        labels = np.asarray(
            _densify_device(sparse_points, sparse_labels, dense_points, knn)
        )
        return labels, LABEL_COLORS_UINT8[labels]

    if engine == "sharded":
        # point-sharded over every visible device (parallel/sharded_ops.py)
        from pointnet2_tpu.parallel import create_mesh, densify_labels_sharded

        labels = densify_labels_sharded(
            sparse_points, sparse_labels, dense_points, knn, mesh=create_mesh()
        )
        return labels, LABEL_COLORS_UINT8[labels]

    # scipy fallback
    from scipy.spatial import cKDTree

    tree = cKDTree(sparse_points)
    _, idx = tree.query(dense_points, k=knn, workers=-1)
    if knn == 1:
        idx = idx[:, None]
    labels = _majority_in_distance_order(sparse_labels[idx])
    return labels.astype(np.int32), LABEL_COLORS_UINT8[labels]


# -- device engine -----------------------------------------------------------


@functools.partial(
    __import__("jax").jit, static_argnames=("knn", "chunk", "sparse_tile")
)
def _densify_device_jit(sparse_points, sparse_labels, dense_points, knn, chunk, sparse_tile):
    import jax
    import jax.numpy as jnp
    from jax import lax

    ns = sparse_points.shape[0]
    nd = dense_points.shape[0]

    def process_chunk(dense_chunk):  # (chunk, 3)
        def tile_body(t, carry):
            best_d, best_i = carry  # (chunk, knn)
            start = t * sparse_tile
            sp = lax.dynamic_slice(
                sparse_points, (start, 0), (sparse_tile, 3)
            )  # (tile, 3)
            base = lax.dynamic_slice(
                jnp.arange(ns + sparse_tile, dtype=jnp.int32), (start,), (sparse_tile,)
            )
            diff = dense_chunk[:, None, :] - sp[None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)  # (chunk, tile)
            valid = (base < ns)[None, :]
            d2 = jnp.where(valid, d2, jnp.float32(np.inf))
            # merge running best with this tile's candidates
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(base[None, :], d2.shape)], axis=1
            )
            neg_d, pos = lax.top_k(-cat_d, knn)
            return -neg_d, jnp.take_along_axis(cat_i, pos, axis=1)

        ntiles = -(-ns // sparse_tile)
        best_d0 = jnp.full((dense_chunk.shape[0], knn), jnp.float32(np.inf))
        best_i0 = jnp.zeros((dense_chunk.shape[0], knn), jnp.int32)
        best_d, best_i = lax.fori_loop(0, ntiles, tile_body, (best_d0, best_i0))
        nl = sparse_labels[best_i]  # (chunk, knn) ascending distance
        # first-to-reach-max-count majority vote
        best_count = jnp.zeros(dense_chunk.shape[0], jnp.int32)
        best_label = nl[:, 0]
        for i in range(knn):
            lab = nl[:, i]
            c = jnp.zeros_like(best_count)
            for j in range(i + 1):
                c = c + (nl[:, j] == lab).astype(jnp.int32)
            better = c > best_count
            best_count = jnp.where(better, c, best_count)
            best_label = jnp.where(better, lab, best_label)
        return best_label

    nchunks = -(-nd // chunk)
    pad = nchunks * chunk - nd
    dp = jnp.pad(dense_points, ((0, pad), (0, 0)))
    out = jax.lax.map(process_chunk, dp.reshape(nchunks, chunk, 3))
    return out.reshape(-1)[:nd]


def _densify_device(sparse_points, sparse_labels, dense_points, knn, chunk=4096, sparse_tile=8192):
    import jax.numpy as jnp

    # tile must not exceed the sparse count (dynamic_slice bounds)
    sparse_tile = int(max(1, min(sparse_tile, len(sparse_points))))
    chunk = int(min(chunk, max(128, len(dense_points))))
    return _densify_device_jit(
        jnp.asarray(sparse_points),
        jnp.asarray(sparse_labels).astype(jnp.int32),
        jnp.asarray(dense_points),
        knn,
        chunk,
        sparse_tile,
    )


def densify_labels_device(sparse_points, sparse_labels, dense_points, knn: int = 3):
    """Fully on-device densification: jax arrays in, jax arrays out.

    Used by the fused KITTI predict+densify path (kitti_predict.py parity
    with the reference's single-graph sess.run, kitti_predict.py:30-104):
    predicted labels never leave HBM between the model and the densifier.
    Returns (dense_labels (N,) int32, dense_colors (N, 3) uint8) on device.
    """
    import jax.numpy as jnp

    labels = _densify_device(sparse_points, sparse_labels, dense_points, knn)
    colors = jnp.asarray(LABEL_COLORS_UINT8)[labels]
    return labels, colors
