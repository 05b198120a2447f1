"""Layer-toolkit parity tests (tf_util.py extras) + extra augmentations."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.data import augment
from pointnet2_tpu.nn.extras import (
    ConvND,
    ConvTranspose2D,
    FullyConnected,
    avg_pool2d,
    avg_pool3d,
    max_pool2d,
    max_pool3d,
)


def _run(module, x, **kw):
    variables = module.init(jax.random.PRNGKey(0), x, **kw)
    return module.apply(variables, x, **kw)


class TestLayers:
    def test_conv1d(self, rng):
        x = jnp.asarray(rng.rand(2, 16, 4), jnp.float32)
        y = _run(ConvND(features=8, kernel_size=(3,)), x)
        assert y.shape == (2, 16, 8)

    def test_conv2d_with_bn(self, rng):
        x = jnp.asarray(rng.rand(2, 8, 8, 4), jnp.float32)
        y = _run(ConvND(features=6, kernel_size=(1, 1), use_bn=True), x)
        assert y.shape == (2, 8, 8, 6)
        assert float(y.min()) >= 0.0  # relu

    def test_conv3d(self, rng):
        x = jnp.asarray(rng.rand(1, 4, 4, 4, 2), jnp.float32)
        y = _run(ConvND(features=3, kernel_size=(2, 2, 2)), x)
        assert y.shape == (1, 4, 4, 4, 3)

    def test_conv_transpose_upsamples(self, rng):
        x = jnp.asarray(rng.rand(1, 4, 4, 2), jnp.float32)
        y = _run(ConvTranspose2D(features=5, strides=(2, 2)), x)
        assert y.shape == (1, 8, 8, 5)

    def test_fully_connected(self, rng):
        x = jnp.asarray(rng.rand(3, 10), jnp.float32)
        y = _run(FullyConnected(features=7), x)
        assert y.shape == (3, 7)

    def test_pools(self, rng):
        x = jnp.asarray(rng.rand(1, 8, 8, 2), jnp.float32)
        assert max_pool2d(x).shape == (1, 4, 4, 2)
        assert avg_pool2d(x).shape == (1, 4, 4, 2)
        x3 = jnp.asarray(rng.rand(1, 4, 4, 4, 2), jnp.float32)
        assert max_pool3d(x3).shape == (1, 2, 2, 2, 2)
        assert avg_pool3d(x3).shape == (1, 2, 2, 2, 2)
        np.testing.assert_allclose(
            np.asarray(max_pool2d(x))[0, 0, 0, 0],
            np.asarray(x)[0, :2, :2, 0].max(),
            rtol=1e-6,
        )


class TestAugmentExtras:
    def test_rotation_with_normal_same_rotation(self, rng):
        np.random.seed(3)
        batch = rng.rand(1, 20, 6).astype(np.float32)
        out = augment.rotate_point_cloud_with_normal(batch.copy())
        # norms preserved for both xyz and normal blocks
        np.testing.assert_allclose(
            np.linalg.norm(out[0, :, :3], axis=-1),
            np.linalg.norm(batch[0, :, :3], axis=-1),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.linalg.norm(out[0, :, 3:], axis=-1),
            np.linalg.norm(batch[0, :, 3:], axis=-1),
            rtol=1e-5,
        )

    def test_rotate_by_angle_roundtrip(self, rng):
        batch = rng.rand(2, 10, 3).astype(np.float32)
        out = augment.rotate_point_cloud_by_angle(batch, 2 * np.pi)
        np.testing.assert_allclose(out, batch, atol=1e-5)

    def test_perturbation_small(self, rng):
        np.random.seed(0)
        batch = rng.rand(2, 50, 3).astype(np.float32)
        out = augment.rotate_perturbation_point_cloud(batch)
        assert np.abs(out - batch).max() < 0.5  # clipped small angles

    def test_shuffle_data(self, rng):
        data = rng.rand(10, 4, 3)
        labels = np.arange(10)
        d, l, idx = augment.shuffle_data(data, labels)
        np.testing.assert_array_equal(d, data[idx])
        np.testing.assert_array_equal(l, labels[idx])
