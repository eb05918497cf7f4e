"""Synthetic-scene convergence tests for the differentiable training BA."""

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom import projective as pops
from lgu_slam_tpu.geom.ba import ba, moba


def make_scene(rng, N=4, H=12, W=16):
    xi_gt = np.cumsum(rng.normal(size=(N, 6)) * 0.03, axis=0).astype(np.float32)
    poses_gt = lie.se3_exp(jnp.asarray(xi_gt))
    disps_gt = jnp.asarray(0.6 + 0.2 * rng.random((N, H, W)).astype(np.float32))
    intr = jnp.asarray(
        np.tile(np.array([20.0, 20.0, W / 2, H / 2], np.float32), (N, 1))
    )
    ii = jnp.asarray([0, 1, 2, 0, 1, 3, 2, 3])
    jj = jnp.asarray([1, 2, 3, 2, 3, 1, 0, 2])
    target, _ = pops.projective_transform(poses_gt, disps_gt, intr, ii, jj)
    return poses_gt, disps_gt, intr, ii, jj, target


def pose_err(p, poses_gt):
    d = lie.se3_mul(p, lie.se3_inv(poses_gt))
    return float(jnp.linalg.norm(lie.se3_log(d)[2:], axis=-1).mean())


def test_ba_converges_to_ground_truth(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    weight = jnp.ones_like(target)
    poses = (
        jnp.broadcast_to(lie.se3_identity(), (N, 7))
        .at[0].set(poses_gt[0])
        .at[1].set(poses_gt[1])
    )
    disps = jnp.ones((N, H, W), jnp.float32) * 0.7
    eta = jnp.full((1, N, H, W), 1e-4)

    step = jax.jit(
        lambda t, p, d: ba(
            t[None], weight[None], eta, p[None], d[None], intr[None], ii, jj, fixedp=2
        )
    )
    err0 = pose_err(poses, poses_gt)
    for _ in range(8):
        p, d = step(target, poses, disps)
        poses, disps = p[0], d[0]
    err1 = pose_err(poses, poses_gt)
    assert err1 < err0 * 0.02, (err0, err1)
    assert float(jnp.abs(disps - disps_gt).mean()) < 5e-3


def test_ba_nan_target_keeps_state_finite(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    weight = jnp.ones_like(target)
    eta = jnp.full((1, N, H, W), 1e-4)
    bad = target.at[0].set(jnp.nan)
    p, d = ba(
        bad[None], weight[None], eta, poses_gt[None], disps_gt[None],
        intr[None], ii, jj, fixedp=2,
    )
    assert bool(jnp.all(jnp.isfinite(p)))
    assert bool(jnp.all(jnp.isfinite(d)))


def test_ba_padded_edges_match_unpadded(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    weight = jnp.ones_like(target)
    eta = jnp.full((1, N, H, W), 1e-4)
    poses = jnp.broadcast_to(lie.se3_identity(), (N, 7))
    disps = jnp.ones((N, H, W), jnp.float32) * 0.7

    p1, d1 = ba(
        target[None], weight[None], eta, poses[None], disps[None],
        intr[None], ii, jj, fixedp=2,
    )
    # pad with 4 bogus edges masked out
    E = ii.shape[0]
    ii_p = jnp.concatenate([ii, jnp.zeros(4, ii.dtype)])
    jj_p = jnp.concatenate([jj, jnp.ones(4, jj.dtype)])
    pad = jnp.zeros((4, H, W, 2), target.dtype)
    target_p = jnp.concatenate([target, pad + 123.0])
    weight_p = jnp.concatenate([weight, pad + 1.0])
    mask = jnp.concatenate([jnp.ones(E), jnp.zeros(4)])
    p2, d2 = ba(
        target_p[None], weight_p[None], eta, poses[None], disps[None],
        intr[None], ii_p, jj_p, fixedp=2, edge_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_moba_poses_only(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N = poses_gt.shape[0]
    weight = jnp.ones_like(target)
    poses = (
        jnp.broadcast_to(lie.se3_identity(), (N, 7))
        .at[0].set(poses_gt[0])
        .at[1].set(poses_gt[1])
    )
    err0 = pose_err(poses, poses_gt)
    for _ in range(8):
        p = moba(
            target[None], weight[None], poses[None], disps_gt[None],
            intr[None], ii, jj, fixedp=2,
        )
        poses = p[0]
    err1 = pose_err(poses, poses_gt)
    assert err1 < err0 * 0.05, (err0, err1)


def test_ba_is_differentiable(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    eta = jnp.full((1, N, H, W), 1e-4)
    poses = jnp.broadcast_to(lie.se3_identity(), (N, 7))
    disps = jnp.ones((N, H, W), jnp.float32) * 0.7

    def loss(weight):
        p, d = ba(
            target[None], weight[None], eta, poses[None], disps[None],
            intr[None], ii, jj, fixedp=2,
        )
        dp = lie.se3_mul(p[0], lie.se3_inv(poses_gt))
        return jnp.sum(lie.se3_log(dp) ** 2)

    g = jax.grad(loss)(jnp.ones_like(target))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0
