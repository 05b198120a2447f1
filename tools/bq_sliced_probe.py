#!/usr/bin/env python3
"""Probe: ball_query_sliced (XLA-materialized windows, static kernel) vs the
full kernel and the in-kernel pl.ds windowed variant, at SA1 chunk regime.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pointnet2_tpu.ops.pallas.ballquery import (
    ball_query_pallas,
    ball_query_sliced,
    ball_query_windowed,
)
from pointnet2_tpu.utils.bench import slope_time


def main():
    rng = np.random.RandomState(0)
    B, n, m, ns, r = 8, 8192, 1024, 32, 0.1
    xyz1 = jnp.asarray(rng.rand(B, n, 3), jnp.float32)
    # FPS-like queries: dispersed across the cloud
    xyz2 = jnp.asarray(xyz1[:, :: n // m][:, :m], jnp.float32)
    ia, ca = jax.tree.map(np.asarray, ball_query_pallas(xyz1, xyz2, r, ns))
    for wname, wv in (("2048", 2048), ("default", None)):
        ib, cb = jax.tree.map(
            np.asarray, ball_query_sliced(xyz1, xyz2, r, ns, wv)
        )
        assert (ia == ib).all() and (ca == cb).all(), f"sliced w={wname} disagrees"
    print("bit-identical (incl. runtime fits check); timing (chunk regime B=8):")
    for rep in range(3):
        ta = slope_time(lambda c: ball_query_pallas(c, xyz2, r, ns)[0], xyz1)
        tb = slope_time(lambda c: ball_query_sliced(c, xyz2, r, ns, 2048)[0], xyz1)
        tc = slope_time(lambda c: ball_query_windowed(c, xyz2, r, ns, 2048)[0], xyz1)
        print(
            f"rep {rep}: full {ta*1e3:7.3f}  sliced {tb*1e3:7.3f}"
            f"  plds-windowed {tc*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
