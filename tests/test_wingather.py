"""Fused windowed SA1 grouping (ops.project_group_calibrated).

The production eval fast path (ops/pallas/wingather.py): calibrated ball
query whose extraction keys also carry window positions, plus a
scalar-prefetch block-DMA gather. Exactness contract: when the certificate
holds, idx/cnt are bit-identical to the exact ball query and the grouped
features are bit-identical rows of the exact projection — the model's
logits must not change by a single bit (bench.py re-asserts this on
hardware every production run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointnet2_tpu import ops
from pointnet2_tpu.config import Config
from pointnet2_tpu.models import PointNet2SemSeg
from pointnet2_tpu.ops import reference
from pointnet2_tpu.ops.pallas import project_group_sliced


def _fps_like(x1, m):
    n = x1.shape[1]
    return x1[:, :: n // m][:, :m]


def _unpermute(grouped_sorted, inv_q):
    return np.take_along_axis(
        np.asarray(grouped_sorted), np.asarray(inv_q)[..., None, None], axis=1
    )


class TestProjectGroupSliced:
    @pytest.mark.parametrize(
        "b,n,m,radius,nsample,window",
        [
            (2, 2048, 256, 0.05, 16, 1536),
            (1, 1024, 256, 0.03, 8, 768),
        ],
    )
    def test_fitting_window_matches_exact_chain(
        self, rng, b, n, m, radius, nsample, window
    ):
        x1 = rng.rand(b, n, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, m))
        cin, f0 = 6, 16
        inputs = rng.rand(b, n, cin).astype(np.float32)
        inputs[..., :3] = x1
        w0 = rng.randn(cin, f0).astype(np.float32) * 0.1
        b0 = rng.randn(f0).astype(np.float32) * 0.1

        with pltpu.force_tpu_interpret_mode():
            grouped_s, idx, cnt, qperm, inv_q, ok = project_group_sliced(
                jnp.asarray(inputs), jnp.asarray(w0), jnp.asarray(b0),
                jnp.asarray(x1), jnp.asarray(x2), radius, nsample, window,
            )
        assert bool(ok), "calibrated window must fit on this data"
        assert qperm is not None and inv_q is not None

        # idx/cnt: bit-identical to the NumPy oracle, ORIGINAL query order
        want_idx, want_cnt = reference.ball_query_np(x1, x2, radius, nsample)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)

        # grouped: bit-identical rows of the same JAX projection, gathered
        # by the oracle idx (un-permute the sorted-query order first)
        zp = np.asarray(jnp.asarray(inputs) @ jnp.asarray(w0) + jnp.asarray(b0))
        want_grouped = np.take_along_axis(
            zp, want_idx.reshape(b, m * nsample)[..., None], axis=1
        ).reshape(b, m, nsample, f0)
        got = _unpermute(grouped_s, inv_q)
        np.testing.assert_array_equal(got, want_grouped)

    def test_too_small_window_is_detected(self, rng):
        x1 = rng.rand(1, 1024, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, 128))
        inputs = rng.rand(1, 1024, 6).astype(np.float32)
        w0 = rng.randn(6, 8).astype(np.float32)
        b0 = np.zeros(8, np.float32)
        with pltpu.force_tpu_interpret_mode():
            _, _, _, _, _, ok = project_group_sliced(
                jnp.asarray(inputs), jnp.asarray(w0), jnp.asarray(b0),
                jnp.asarray(x1), jnp.asarray(x2), 0.3, 8, 256,
            )
        assert not bool(ok)

    def test_oversized_window_static_fallback(self, rng):
        # window >= n: exact kernel + plain gather, original order
        x1 = rng.rand(1, 256, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, 128))
        inputs = rng.rand(1, 256, 6).astype(np.float32)
        w0 = rng.randn(6, 8).astype(np.float32) * 0.1
        b0 = rng.randn(8).astype(np.float32) * 0.1
        with pltpu.force_tpu_interpret_mode():
            grouped, idx, cnt, qperm, inv_q, ok = project_group_sliced(
                jnp.asarray(inputs), jnp.asarray(w0), jnp.asarray(b0),
                jnp.asarray(x1), jnp.asarray(x2), 0.3, 8, 512,
            )
        assert bool(ok) and qperm is None and inv_q is None
        want_idx, want_cnt = reference.ball_query_np(x1, x2, 0.3, 8)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)

    def test_dispatch_xla_path(self, rng):
        x1 = rng.rand(1, 512, 3).astype(np.float32)
        x2 = np.asarray(_fps_like(x1, 128))
        inputs = rng.rand(1, 512, 6).astype(np.float32)
        w0 = rng.randn(6, 8).astype(np.float32) * 0.1
        b0 = rng.randn(8).astype(np.float32) * 0.1
        grouped, idx, cnt, qperm, inv_q, ok = ops.project_group_calibrated(
            jnp.asarray(inputs), jnp.asarray(w0), jnp.asarray(b0),
            jnp.asarray(x1), jnp.asarray(x2), 0.1, 8, 128, impl="xla",
        )
        assert bool(ok) and qperm is None
        want_idx, _ = reference.ball_query_np(x1, x2, 0.1, 8)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        zp = np.asarray(jnp.asarray(inputs) @ jnp.asarray(w0) + jnp.asarray(b0))
        want = np.take_along_axis(
            zp, want_idx.reshape(1, -1)[..., None], axis=1
        ).reshape(1, 128, 8, 8)
        np.testing.assert_array_equal(np.asarray(grouped), want)


# SA1 must have >= 2 query tiles (256 centroids) for a sub-N window to be
# certifiable: each 128-query tile of the x-sorted centroids then spans
# ~half the sorted cloud (~512 rows + radius margin < the 768 window).
FUSED = Config(
    num_point=1024,
    l1_npoint=256,
    l2_npoint=64,
    l3_npoint=32,
    l4_npoint=16,
    l1_radius=0.05,
    l2_radius=0.4,
    l3_radius=0.8,
    l4_radius=1.6,
    l1_nsample=8,
    l2_nsample=8,
    l3_nsample=8,
    l4_nsample=8,
)


class TestModelFusedPath:
    def test_eval_logits_bit_equal_on_pallas_path(self, rng):
        """Full model, ops_impl='pallas' in interpret mode: the fused
        windowed eval forward must produce bit-identical logits to the
        exact pallas forward (the hardware analogue runs in bench.py)."""
        x = jnp.asarray(rng.rand(1, FUSED.num_point, 6), jnp.float32)
        base = PointNet2SemSeg(
            num_classes=9, use_color=True, config=FUSED, ops_impl="pallas"
        )
        wind = base.clone(bq_window=768)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        with pltpu.force_tpu_interpret_mode():
            variables = base.init(rngs, x, train=False, bn_momentum=0.9)
            logits_base = base.apply(variables, x, train=False, bn_momentum=0.9)
            logits_wind, diag = wind.apply(
                variables, x, train=False, bn_momentum=0.9,
                mutable=["diagnostics"],
            )
        flags = jax.tree.leaves(diag["diagnostics"])
        assert len(flags) == 4, "one certificate per SA level"
        # certificate first: a non-fitting window makes outputs legitimately
        # differ, which would misread as a bit-parity bug
        assert all(bool(jnp.all(f)) for f in flags)
        np.testing.assert_array_equal(
            np.asarray(logits_base), np.asarray(logits_wind)
        )


class TestMSGFusedPath:
    def test_msg_eval_logits_bit_equal_on_pallas_path(self, rng):
        """MSG model, ops_impl='pallas' in interpret mode: each grouping
        scale delegates through the centroids-only geometry seam and runs
        the fused windowed grouping (project_group_calibrated) — logits
        must stay bit-identical to the exact pallas forward."""
        from pointnet2_tpu.models import PointNet2SemSegMSG

        x = jnp.asarray(rng.rand(1, FUSED.num_point, 6), jnp.float32)
        base = PointNet2SemSegMSG(
            num_classes=9, use_color=True, config=FUSED, ops_impl="pallas"
        )
        wind = base.clone(bq_window=768)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        with pltpu.force_tpu_interpret_mode():
            variables = base.init(rngs, x, train=False, bn_momentum=0.9)
            logits_base = base.apply(variables, x, train=False, bn_momentum=0.9)
            logits_wind, diag = wind.apply(
                variables, x, train=False, bn_momentum=0.9,
                mutable=["diagnostics"],
            )
        flags = jax.tree.leaves(diag["diagnostics"])
        # one certificate per grouping scale at the two dense MSG levels
        # (2 + 2, sown inside the delegated scale modules) + one per SSG
        # coarse level (levels whose cloud <= window fall back statically
        # with a constant-True certificate)
        assert len(flags) == 6, "2+2 MSG scale certs + 2 SSG level certs"
        assert all(bool(jnp.all(f)) for f in flags)
        np.testing.assert_array_equal(
            np.asarray(logits_base), np.asarray(logits_wind)
        )

    def test_msg_eval_logits_equal_on_xla_path(self, rng):
        """CPU/XLA dispatch: the fused delegation's fallback (exact query +
        project-then-gather) must match the exact path bit-for-bit —
        project_group_leaf's forward IS project-then-gather."""
        from pointnet2_tpu.models import PointNet2SemSegMSG

        x = jnp.asarray(rng.rand(1, FUSED.num_point, 6), jnp.float32)
        base = PointNet2SemSegMSG(
            num_classes=9, use_color=True, config=FUSED, ops_impl="xla"
        )
        wind = base.clone(bq_window=768)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        variables = base.init(rngs, x, train=False, bn_momentum=0.9)
        logits_base = base.apply(variables, x, train=False, bn_momentum=0.9)
        logits_wind, _ = wind.apply(
            variables, x, train=False, bn_momentum=0.9,
            mutable=["diagnostics"],
        )
        np.testing.assert_array_equal(
            np.asarray(logits_base), np.asarray(logits_wind)
        )
