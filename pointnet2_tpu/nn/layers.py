"""Base neural layers: dynamic-momentum BatchNorm and shared point MLPs.

Replaces the reference's util/tf_util.py conv/BN wrappers. The reference's
"conv2d with 1x1 kernel" over (B, npoint, nsample, C) is mathematically a
dense layer on the channel axis; expressing it as a Dense keeps every FLOP on
the MXU as a large batched matmul instead of going through a convolution
lowering.

BatchNorm takes its EMA momentum as a *call argument* because the reference
anneals it per-step (bn_decay schedule, train.py:101-119) — flax's built-in
BatchNorm momentum is a static attribute and cannot follow a schedule.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class BatchNorm(nn.Module):
    """Batch normalization with per-call (schedulable) EMA momentum.

    Matches tf.contrib.layers.batch_norm as used in util/tf_util.py:555-602:
    center + scale, epsilon 1e-3, biased batch variance, moving stats updated
    as ``moving = moving * momentum + batch * (1 - momentum)``.
    """

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, *, train: bool, momentum) -> jax.Array:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = ra_mean.value * m + mean * (1.0 - m)
                ra_var.value = ra_var.value * m + var * (1.0 - m)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = lax.rsqrt(var + self.epsilon) * scale
        return ((x - mean) * inv + bias).astype(x.dtype)


class SharedMLP(nn.Module):
    """Per-point MLP: [Dense -> BatchNorm -> ReLU] * len(features).

    Equivalent to the reference's stacked 1x1 conv2d with bn + relu
    (util/tf_util.py:128-205 as used by pointnet_sa_module /
    pointnet_fp_module). Weights use Xavier/Glorot init like
    tf_util._variable_with_weight_decay:43-51.
    """

    features: Sequence[int]
    use_bn: bool = True
    # Computation dtype for the Dense matmuls (params stay f32). Set to
    # jnp.bfloat16 for the production bf16 inference mode: activations and
    # the MXU inputs run in bf16, halving HBM traffic for the grouped
    # tensors. None = full f32 (the parity default).
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                name=f"dense_{i}",
            )(x)
            if self.use_bn:
                x = BatchNorm(name=f"bn_{i}")(x, train=train, momentum=bn_momentum)
            x = nn.relu(x)
        return x
