#!/usr/bin/env python3
"""Dissect the XLA-side overhead of ball_query_windowed.

Round-1 finding: windowing cuts kernel work ~4x but the wrapper's sorts and
permutation gathers cost more than it saves. This probe times each overhead
component separately at the model's chunk regime (B=8, SA1 shape) so we know
WHICH piece to attack:

  a. argsort of the dataset x coordinate  (B, N)
  b. permutation gather of dataset xyz    (B, N, 3)
  c. argsort of the query x coordinate    (B, M)
  d. permutation gather of queries        (B, M, 3)
  e. searchsorted window bounds           (B, T)
  f. inverse permutation of idx + cnt     (B, M, K) + (B, M)
  g. windowed total / full-kernel total
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.ops.pallas.ballquery import ball_query_pallas, ball_query_windowed
from pointnet2_tpu.utils.bench import slope_time


def main():
    rng = np.random.RandomState(0)
    B, n, m, ns, r = 8, 8192, 1024, 32, 0.1
    xyz1 = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
    xyz2 = jnp.asarray(xyz1[:, :m] + 0.001, jnp.float32)
    idx, cnt = jax.tree.map(np.asarray, ball_query_pallas(xyz1, xyz2, r, ns))
    idxw = jnp.asarray(idx)

    @jax.jit
    def f_argsort_n(x):
        return jnp.argsort(x[..., 0], axis=1)

    @jax.jit
    def f_gather_n(x):
        perm = jnp.argsort(x[..., 0], axis=1)
        return jnp.take_along_axis(x, perm[..., None], axis=1)

    @jax.jit
    def f_argsort_m(q):
        return jnp.argsort(q[..., 0], axis=1)

    @jax.jit
    def f_inv_idx(i_s):
        # i_s arrives as f32 (scan-carry dtype); values are small ints.
        qperm = jnp.argsort(i_s[..., 0], axis=1)
        inv = jnp.argsort(qperm, axis=1)
        return jnp.take_along_axis(i_s, inv[..., None], axis=1)

    @jax.jit
    def f_searchsorted(x, q):
        xs = jnp.sort(x[..., 0], axis=1)
        tile = q[..., 0].reshape(B, -1, 128)
        lo = jax.vmap(jnp.searchsorted)(xs, tile.min(axis=-1) - r)
        hi = jax.vmap(jnp.searchsorted)(xs, tile.max(axis=-1) + r)
        return lo, hi

    comps = [
        ("a argsort (B,N)", lambda c: f_argsort_n(c), xyz1),
        ("b sort+gather xyz (B,N,3)", lambda c: f_gather_n(c), xyz1),
        ("c argsort (B,M)", lambda c: f_argsort_m(c), xyz2),
        ("f inverse-perm idx (B,M,K)", lambda c: f_inv_idx(c), idxw.astype(jnp.float32)),
        ("g full kernel", lambda c: ball_query_pallas(c, xyz2, r, ns)[0], xyz1),
        (
            "h windowed total",
            lambda c: ball_query_windowed(c, xyz2, r, ns, 2048)[0],
            xyz1,
        ),
    ]
    # correctness of windowed at this window
    iw, cw = jax.tree.map(np.asarray, ball_query_windowed(xyz1, xyz2, r, ns, 2048))
    print("windowed exact:", (iw == idx).all() and (cw == cnt).all())
    for rep in range(2):
        for name, fn, x in comps:
            t = slope_time(fn, x)
            print(f"rep {rep}  {name:28s} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
