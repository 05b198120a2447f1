"""Pre-projected SetAbstraction must be numerically equivalent to the
straightforward group-then-MLP formulation (same weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.nn.pointnet import SetAbstraction


def _remap(params_base):
    """Map group-then-MLP params onto the pre-projected module structure."""
    mlp = params_base["mlp"]
    out = {
        "w0": mlp["dense_0"]["kernel"],
        "b0": mlp["dense_0"]["bias"],
        "bn0": mlp["bn_0"],
    }
    rest = {}
    i = 1
    while f"dense_{i}" in mlp:
        rest[f"dense_{i - 1}"] = mlp[f"dense_{i}"]
        if f"bn_{i}" in mlp:
            rest[f"bn_{i - 1}"] = mlp[f"bn_{i}"]
        i += 1
    if rest:
        out["mlp_rest"] = rest
    return out


def _stats_remap(stats_base):
    mlp = stats_base["mlp"]
    out = {"bn0": mlp["bn_0"]}
    rest = {}
    i = 1
    while f"bn_{i}" in mlp:
        rest[f"bn_{i - 1}"] = mlp[f"bn_{i}"]
        i += 1
    if rest:
        out["mlp_rest"] = rest
    return out


def test_pre_projected_equivalent(rng):
    xyz = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(2, 128, 5), jnp.float32)

    base = SetAbstraction(
        npoint=32, radius=0.4, nsample=8, mlp=[16, 32], pre_project=False
    )
    pre = SetAbstraction(
        npoint=32, radius=0.4, nsample=8, mlp=[16, 32], pre_project=True
    )
    vb = base.init(jax.random.PRNGKey(0), xyz, feats, train=False, bn_momentum=0.9)
    vp = {
        "params": _remap(vb["params"]),
        "batch_stats": _stats_remap(vb["batch_stats"]),
    }

    xyz_b, out_b, idx_b = base.apply(vb, xyz, feats, train=False, bn_momentum=0.9)
    xyz_p, out_p, idx_p = pre.apply(vp, xyz, feats, train=False, bn_momentum=0.9)
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_p))
    np.testing.assert_allclose(np.asarray(xyz_b), np.asarray(xyz_p))
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_p), rtol=2e-4, atol=2e-5
    )


def test_pre_projected_no_feats(rng):
    xyz = jnp.asarray(rng.rand(2, 96, 3), jnp.float32)
    base = SetAbstraction(
        npoint=16, radius=0.5, nsample=8, mlp=[8, 8], pre_project=False
    )
    pre = SetAbstraction(
        npoint=16, radius=0.5, nsample=8, mlp=[8, 8], pre_project=True
    )
    vb = base.init(jax.random.PRNGKey(1), xyz, None, train=False, bn_momentum=0.9)
    vp = {
        "params": _remap(vb["params"]),
        "batch_stats": _stats_remap(vb["batch_stats"]),
    }
    _, out_b, _ = base.apply(vb, xyz, None, train=False, bn_momentum=0.9)
    _, out_p, _ = pre.apply(vp, xyz, None, train=False, bn_momentum=0.9)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_p), rtol=2e-4, atol=2e-5
    )


def test_pre_projected_train_mode_runs(rng):
    xyz = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(2, 64, 4), jnp.float32)
    sa = SetAbstraction(npoint=16, radius=0.5, nsample=4, mlp=[8, 16])
    v = sa.init(jax.random.PRNGKey(0), xyz, feats, train=True, bn_momentum=0.5)
    (_, out, _), mutated = sa.apply(
        v, xyz, feats, train=True, bn_momentum=0.5, mutable=["batch_stats"]
    )
    assert out.shape == (2, 16, 16)
    assert "bn0" in mutated["batch_stats"]


def test_msg_pre_projected_equivalent(rng):
    """SetAbstractionMSG(pre_project=True) — per-scale SetAbstraction
    delegation — must match the literal grouped-first-layer formulation
    with the same weights (rows reordered: the old grouped columns are
    [points, xyz_offsets], the pre-projected input is [xyz, points])."""
    from pointnet2_tpu.nn.pointnet import SetAbstractionMSG

    xyz = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(2, 128, 5), jnp.float32)
    c = feats.shape[-1]

    base = SetAbstractionMSG(
        npoint=32, radius_list=(0.25, 0.5), nsample_list=(4, 8),
        mlp_list=([8, 16], [16, 32]), pre_project=False,
    )
    pre = base.clone(pre_project=True)
    vb = base.init(
        jax.random.PRNGKey(0), xyz, feats, train=False, bn_momentum=0.9
    )

    def remap_scale(mlp):
        k = mlp["dense_0"]["kernel"]
        out = {
            "w0": jnp.concatenate([k[c:], k[:c]], axis=0),
            "b0": mlp["dense_0"]["bias"],
            "bn0": mlp["bn_0"],
        }
        rest = {}
        i = 1
        while f"dense_{i}" in mlp:
            rest[f"dense_{i - 1}"] = mlp[f"dense_{i}"]
            if f"bn_{i}" in mlp:
                rest[f"bn_{i - 1}"] = mlp[f"bn_{i}"]
            i += 1
        if rest:
            out["mlp_rest"] = rest
        return out

    def remap_stats(mlp):
        out = {"bn0": mlp["bn_0"]}
        rest = {}
        i = 1
        while f"bn_{i}" in mlp:
            rest[f"bn_{i - 1}"] = mlp[f"bn_{i}"]
            i += 1
        if rest:
            out["mlp_rest"] = rest
        return out

    vp = {
        "params": {
            f"scale{s}": remap_scale(vb["params"][f"mlp_{s}"])
            for s in (0, 1)
        },
        "batch_stats": {
            f"scale{s}": remap_stats(vb["batch_stats"][f"mlp_{s}"])
            for s in (0, 1)
        },
    }

    xyz_b, out_b = base.apply(vb, xyz, feats, train=False, bn_momentum=0.9)
    xyz_p, out_p = pre.apply(vp, xyz, feats, train=False, bn_momentum=0.9)
    np.testing.assert_allclose(np.asarray(xyz_b), np.asarray(xyz_p))
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_p), rtol=2e-4, atol=2e-5
    )


def test_leaf_inputs_grads_match_scatter_route(rng):
    """SetAbstraction(leaf_inputs=True) (SA1's scatter-free backward) gives
    the same parameter gradients as the autodiff scatter-add route."""
    xyz = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(2, 128, 5), jnp.float32)

    kw = dict(npoint=32, radius=0.4, nsample=8, mlp=[16, 32], pre_project=True)
    plain = SetAbstraction(**kw)
    leaf = SetAbstraction(leaf_inputs=True, **kw)
    v = plain.init(jax.random.PRNGKey(0), xyz, feats, train=True, bn_momentum=0.9)

    def loss(mod, params):
        (_, out, _), _ = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            xyz, feats, train=True, bn_momentum=0.9,
            mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    gp = jax.grad(lambda p: loss(plain, p))(v["params"])
    gl = jax.grad(lambda p: loss(leaf, p))(v["params"])
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_l = jax.tree_util.tree_leaves_with_path(gl)
    assert len(flat_p) == len(flat_l)
    for (kp, lp), (kl, ll) in zip(flat_p, flat_l):
        assert kp == kl
        # atol covers b0: train-mode BN cancels a constant bias shift, so
        # its true gradient is ~0 and both routes return O(1e-4)
        # summation-order noise around it.
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(lp), rtol=1e-4, atol=5e-4,
            err_msg=str(kp),
        )
