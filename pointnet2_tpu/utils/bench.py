"""The canonical K-slope device-timing helper.

Every published number in this repo is measured with this one function —
bench.py, benchmark.py, tools/baseline_measure.py, tools/batch_chunk_bench.py
all import it, so a fix to any measurement hazard lands everywhere at once.

Hazards on this tunneled TPU, each of which silently produced wrong numbers
before being countered here (see PERFORMANCE.md):

- per-dispatch sync ≈ 26 ms -> chain K steps inside ONE jitted scan; the
  per-step cost is the K-slope (T(K1) - T(K0)) / (K1 - K0), which cancels
  dispatch and readback constants;
- ``block_until_ready`` can return early on this backend -> force completion
  with a scalar ``float()`` readback;
- ``0 * int_out`` constant-folds and unused optimization_barrier outputs get
  DCE'd -> chain iterations through ``c + out.sum() * 1e-38`` (changes the
  carry by < 1 ulp, never foldable for float paths);
- identical dispatches can be served from a cache -> one DISTINCT input per
  repetition.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def slope_time(
    step_fn: Callable,
    x,
    K0: int = 2,
    K1: int = 10,
    reps: int = 3,
) -> float:
    """Median per-step device time of ``step_fn``.

    step_fn: carry -> array (any shape); it is traced inside a lax.scan and
    chained through an epsilon-scaled sum so no iteration can be folded or
    dead-code-eliminated. ``x`` is the initial carry (also the timed input).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(k):
        @jax.jit
        def loop(c0):
            def body(c, _):
                out = step_fn(c)
                c = c + jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-38)
                return c, ()

            c, _ = lax.scan(body, c0, None, length=k)
            return jnp.sum(c)

        return loop

    l0, l1 = chained(K0), chained(K1)
    float(l0(x))
    float(l1(x))  # compile + warm
    t0s, t1s = [], []
    for i in range(reps):
        xi = x + np.float32(i + 1) * np.float32(1e-7)
        s = time.time()
        float(l0(xi))
        t0s.append(time.time() - s)
        s = time.time()
        float(l1(xi))
        t1s.append(time.time() - s)
    return (float(np.median(t1s)) - float(np.median(t0s))) / (K1 - K0)
