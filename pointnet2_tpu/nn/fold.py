"""Eval-time BatchNorm folding for the bf16 inference mode.

In eval mode, BatchNorm is the affine map ``y = (x - m) * s + b`` with
``s = scale * rsqrt(var + eps)``. Folding absorbs it into the preceding
linear layer in f32:

    kernel' = kernel * s        bias' = (bias - m) * s + b

and resets the BN node to an exact identity (scale=1, bias=0, mean=0,
var=1-eps so ``rsqrt(var + eps) == 1.0`` exactly). The model code path is
unchanged — the BN module still runs, as a no-op.

Why this exists: bf16 inference rounds activations to ~0.4% relative.
Unfolded, that rounding lands on the UN-normalized Dense output ``h`` and
the eval BN then computes ``(h - m) * s`` — when ``|h - m| << |h|`` the
rounding error is amplified by ``|h|/|h - m|`` per layer (measured: logits
off by ~25% through the 12-layer flagship net). Folded, the matmul output
is already normalized, so rounding applies at O(1) scale and total error
stays at the expected few-0.1% level.

Folded pairs (by the models' naming convention):
- ``dense_i`` + ``bn_i``      (SharedMLP stacks, nn/layers.py)
- ``w0``/``b0`` + ``bn0``     (pre-projected SetAbstraction, nn/pointnet.py;
  the centers' ``zq = c @ w0'[:3]`` projection uses the same folded kernel,
  so the identity ``(x@w0+b0 - c@w0[:3] - m)*s + b == x@w0'+b0' - c@w0'[:3]``
  holds exactly)
- ``fc1`` + ``fc1_bn``        (model head)

The reference has no counterpart (TF1 ran tf.contrib BN as-is); this is a
standard inference-export transformation.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax.core import freeze, unfreeze
from jax import lax

_BN_EPSILON = 1e-3  # nn.layers.BatchNorm.epsilon


def _to_plain(tree):
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _fold_pair(p, s, lin_key, bn_key, epsilon, kernel_key="kernel", bias_key="bias"):
    bn_p = p[bn_key]
    bn_s = s[bn_key]
    # same formula as BatchNorm.__call__ (nn/layers.py): rsqrt(var+eps)*scale
    t = lax.rsqrt(bn_s["var"] + epsilon) * bn_p["scale"]
    if lin_key == "w0":  # bare params on the SA module itself
        p["w0"] = p["w0"] * t
        p["b0"] = (p["b0"] - bn_s["mean"]) * t + bn_p["bias"]
    else:
        lin = p[lin_key]
        lin[kernel_key] = lin[kernel_key] * t
        lin[bias_key] = (lin[bias_key] - bn_s["mean"]) * t + bn_p["bias"]
    bn_p["scale"] = jnp.ones_like(bn_p["scale"])
    bn_p["bias"] = jnp.zeros_like(bn_p["bias"])
    bn_s["mean"] = jnp.zeros_like(bn_s["mean"])
    # var + eps == 1.0 exactly -> rsqrt == 1.0 exactly -> identity BN.
    bn_s["var"] = jnp.full_like(bn_s["var"], 1.0 - epsilon)


def _recurse(p, s, folded, epsilon):
    if not isinstance(p, dict):
        return
    for key in list(p.keys()):
        bn_key = None
        if key.startswith("dense_"):
            cand = "bn_" + key[len("dense_"):]
            if cand in p:
                bn_key = cand
        elif key == "w0" and "bn0" in p:
            bn_key = "bn0"
        elif key == "fc1" and "fc1_bn" in p:
            bn_key = "fc1_bn"
        if bn_key is not None and isinstance(s, dict) and bn_key in s:
            _fold_pair(p, s, key, bn_key, epsilon)
            folded.add(id(s[bn_key]))
    for key, val in p.items():
        if isinstance(val, dict):
            _recurse(val, s.get(key) if isinstance(s, dict) else None, folded, epsilon)


def _collect_bn_stat_nodes(s, path, out):
    """Every dict holding mean/var leaves is a BatchNorm stats node."""
    if not isinstance(s, dict):
        return
    if "mean" in s and "var" in s and not isinstance(s["mean"], dict):
        out.append((path, s))
        return
    for k, v in s.items():
        _collect_bn_stat_nodes(v, f"{path}/{k}", out)


def fold_batch_norm(params, batch_stats, epsilon: float = _BN_EPSILON):
    """(params, batch_stats) -> (folded params, identity batch_stats).

    Eval-mode forward with the folded trees is mathematically identical to
    the original (exact in real arithmetic; ~1-ulp f32 differences).
    Train-mode must NOT use folded trees (batch moments would be recomputed
    from the scaled activations).

    Raises ValueError if any BatchNorm stats node was NOT matched by the
    naming patterns above: a silently-unfolded BN would reintroduce the
    amplified bf16 rounding this transform exists to prevent.

    ``epsilon`` must equal the epsilon of EVERY BatchNorm instance in the
    model (epsilon is a module attribute, invisible in the param trees, so
    it cannot be checked here). The flagship models never override it; a
    caller that does must pass its value — folding with the wrong epsilon
    silently perturbs every folded layer by O(delta_eps/var).
    """
    from pointnet2_tpu.nn.layers import BatchNorm

    assert epsilon != _BN_EPSILON or BatchNorm.epsilon == _BN_EPSILON, (
        "nn.layers.BatchNorm default epsilon changed; update fold.py"
    )
    p = _to_plain(unfreeze(params))
    s = _to_plain(unfreeze(batch_stats))
    folded = set()
    _recurse(p, s, folded, epsilon)
    nodes = []
    _collect_bn_stat_nodes(s, "", nodes)
    missed = [path for path, node in nodes if id(node) not in folded]
    if missed:
        raise ValueError(
            "fold_batch_norm: BatchNorm stats not matched by any "
            f"Dense+BN naming pattern (would stay unfolded): {missed}"
        )
    return freeze(p), freeze(s)
