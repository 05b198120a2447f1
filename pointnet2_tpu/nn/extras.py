"""Additional NN layer wrappers for tf_util.py parity.

The reference's util/tf_util.py exposes a wider layer toolkit than the model
uses: conv1d/conv2d (1x1 cases are SharedMLP here), conv2d_transpose, conv3d,
fully_connected, max/avg pool 2d/3d, and dropout (tf_util.py:54-665). These
flax equivalents complete the toolkit with the same defaults: Xavier init,
bias, optional BatchNorm (dynamic momentum) and ReLU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from flax import linen as nn

from pointnet2_tpu.nn.layers import BatchNorm


class ConvND(nn.Module):
    """General strided convolution + optional BN/ReLU (tf_util conv1d/2d/3d)."""

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: str = "SAME"
    use_bn: bool = False
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = False, bn_momentum=0.9) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides) if self.strides else None,
            padding=self.padding,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        if self.use_bn:
            x = BatchNorm()(x, train=train, momentum=bn_momentum)
        if self.activation == "relu":
            x = nn.relu(x)
        return x


class ConvTranspose2D(nn.Module):
    """2D transposed convolution (tf_util.conv2d_transpose:207-293)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    padding: str = "SAME"
    use_bn: bool = False
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = False, bn_momentum=0.9) -> jax.Array:
        x = nn.ConvTranspose(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        if self.use_bn:
            x = BatchNorm()(x, train=train, momentum=bn_momentum)
        if self.activation == "relu":
            x = nn.relu(x)
        return x


class FullyConnected(nn.Module):
    """Dense + optional BN/ReLU (tf_util.fully_connected:367-418)."""

    features: int
    use_bn: bool = False
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = False, bn_momentum=0.9) -> jax.Array:
        x = nn.Dense(
            self.features, kernel_init=nn.initializers.xavier_uniform()
        )(x)
        if self.use_bn:
            x = BatchNorm()(x, train=train, momentum=bn_momentum)
        if self.activation == "relu":
            x = nn.relu(x)
        return x


def max_pool2d(x, kernel_size=(2, 2), strides=(2, 2), padding="VALID"):
    """(B, H, W, C) max pool (tf_util.max_pool2d:421-446)."""
    return nn.max_pool(x, tuple(kernel_size), tuple(strides), padding)


def avg_pool2d(x, kernel_size=(2, 2), strides=(2, 2), padding="VALID"):
    """(B, H, W, C) avg pool (tf_util.avg_pool2d:449-474)."""
    return nn.avg_pool(x, tuple(kernel_size), tuple(strides), padding)


def max_pool3d(x, kernel_size=(2, 2, 2), strides=(2, 2, 2), padding="VALID"):
    """(B, D, H, W, C) max pool (tf_util.max_pool3d:477-502)."""
    return nn.max_pool(x, tuple(kernel_size), tuple(strides), padding)


def avg_pool3d(x, kernel_size=(2, 2, 2), strides=(2, 2, 2), padding="VALID"):
    """(B, D, H, W, C) avg pool (tf_util.avg_pool3d:505-530)."""
    return nn.avg_pool(x, tuple(kernel_size), tuple(strides), padding)
