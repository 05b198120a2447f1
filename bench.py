#!/usr/bin/env python3
"""Headline benchmark: flagship PointNet++ SSG forward throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: batch 64 x 8192 points x 6 features, full semantic.json model —
the reference benchmark.py's batch-64 inference measurement. Point clouds
are sampled in the Semantic3D box regime (8 x 8 x 4.9 m uniform — the
shape of the dataset's z-box training samples, data/semantic3d.py), which
is what the reference's benchmark runs on (real scene samples). The
DEFAULT forward's cost is data-independent (measured identical on gaussian
clouds, tools/bq_e2e_probe.py), so this choice is timing-neutral for
comparability with earlier rounds.

The PRODUCTION configuration adds the calibrated ball-query window
(Trainer(bq_window=3072), tools/bq_window_calibrate.py). Before timing,
this script PROVES the configuration exact on the benchmarked workload:
the in-graph exactness certificates must hold AND the logits must be
bit-identical to the default exact path. Candidates are tried in
measured-preference order and the first one that proves exact is timed —
the headline never reports an unverified fast path. See PERFORMANCE.md
"Calibrated-window ball query". The fp_window=512 candidate was measured
net-NEGATIVE end-to-end once the kNN tq=128 tile fix landed (66.1 ms vs
54.3 bq-only, tools/fp_window_probe.py) and is deliberately absent here;
the op remains available as an opt-in (--fp_window).

``vs_baseline`` divides by a MEASURED same-chip denominator:
BASELINE_MEASURED.json, produced by tools/baseline_measure.py — the same
forward built the way the reference builds it (plain SA layout, XLA-compiled
dense-distance ops identical in math to the reference's CUDA kernels, f32
matmuls). The CUDA/GPU original cannot run here; PERFORMANCE.md carries the
roofline analysis and MFU. If the file is missing, the estimate used in
round 1 (0.52M pts/s) is the documented fallback.

Timing: K-slope method (see PERFORMANCE.md) — chained forwards in one jit
with an epsilon dependency, scalar float() readbacks, distinct input per rep.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

FALLBACK_REFERENCE_POINTS_PER_SEC = 524_288.0  # round-1 estimate, documented


def _baseline_pps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["value"])
    except (OSError, KeyError, ValueError):
        return FALLBACK_REFERENCE_POINTS_PER_SEC


# Candidate production configs, measured-preference order (fastest PROVEN
# config first — tools/fp_window_probe.py e2e table). The first one that
# PROVES exact on the benchmarked data (certificates + logit bit-equality
# vs the default exact path) is timed; if none proves, the default is.
PRODUCTION_CANDIDATES = (
    {"bq_window": 3072},
)


def pick_production_trainer(cfg, trainer, state, x, candidates=None):
    """Return the fastest Trainer config PROVEN exact on ``x``.

    Exactness proof per candidate: every sown window certificate holds on
    ``x`` AND the inference logits are bit-identical to ``trainer``'s
    (the default exact path). Unverified candidates are never returned —
    the headline never times an unproven fast path.
    """
    import numpy as np

    from pointnet2_tpu.train.trainer import Trainer

    reference_logits = np.asarray(trainer._infer_logits(state, x))
    for kw in candidates if candidates is not None else PRODUCTION_CANDIDATES:
        candidate = Trainer(cfg=cfg, **kw)
        if bool(candidate.check_bq_window(state, x)) and (
            np.asarray(candidate._infer_logits(state, x)) == reference_logits
        ).all():
            return candidate
    return trainer


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.config import Config
    from pointnet2_tpu.train.trainer import Trainer
    from pointnet2_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    cfg = Config()  # semantic.json defaults: 8192 pts, SSG 1024/256/64/16
    batch_size = 64
    trainer = Trainer(cfg=cfg)  # infer_chunk=8: batch-chunked forward
    state = trainer.init_state(jax.random.PRNGKey(0))

    from pointnet2_tpu.utils.bench import slope_time

    rng = np.random.RandomState(0)
    x = np.zeros((batch_size, cfg.num_point, cfg.point_dim), np.float32)
    x[..., :3] = rng.rand(batch_size, cfg.num_point, 3) * [8.0, 8.0, 4.9]
    x[..., 3:] = rng.rand(batch_size, cfg.num_point, cfg.point_dim - 3)
    x = jnp.asarray(x)

    # Production config: calibrated neighbor-op windows, timed only after
    # an in-run exactness proof against the default path on this very data
    # (certificates AND logit bit-equality). Candidates are tried in
    # measured-preference order (see PRODUCTION_CANDIDATES).
    timed = pick_production_trainer(cfg, trainer, state, x)

    batch_time = slope_time(
        lambda c: timed._infer_logits(state, c), x, K0=2, K1=12
    )
    points_per_sec = batch_size * cfg.num_point / batch_time

    print(
        json.dumps(
            {
                "metric": "pointnet2_ssg_fwd_points_per_sec",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(points_per_sec / _baseline_pps(), 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
