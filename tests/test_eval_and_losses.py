"""Tests for trajectory metrics and training losses."""

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.eval.ate import (
    associate,
    ate_rmse,
    rpe,
    umeyama_alignment,
)
from lgu_slam_tpu.geom import losses


def test_umeyama_recovers_similarity(rng):
    x = rng.normal(size=(50, 3))
    s_gt = 2.5
    th = 0.7
    R_gt = np.array(
        [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ]
    )
    t_gt = np.array([1.0, -2.0, 3.0])
    y = s_gt * x @ R_gt.T + t_gt
    s, R, t = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(s, s_gt, atol=1e-6)
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    np.testing.assert_allclose(t, t_gt, atol=1e-6)


def test_ate_zero_for_aligned(rng):
    gt = rng.normal(size=(30, 3))
    est = 0.5 * gt @ np.eye(3) + 1.0  # similarity-transformed copy
    rmse, aligned, _ = ate_rmse(gt, est, correct_scale=True)
    assert rmse < 1e-6


def test_ate_detects_error(rng):
    gt = rng.normal(size=(30, 3))
    est = gt + rng.normal(size=(30, 3)) * 0.1
    rmse, _, _ = ate_rmse(gt, est, correct_scale=True)
    assert 0.01 < rmse < 0.3


def test_rpe_identity():
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (10, 1))
    poses[:, 0] = np.arange(10)  # constant-velocity x
    t_err, r_err = rpe(poses, poses, delta=1)
    assert t_err < 1e-9 and r_err < 1e-6


def test_associate():
    a = np.array([0.0, 1.0, 2.0, 3.0])
    b = np.array([0.01, 1.02, 2.9, 5.0])
    pairs = associate(a, b, max_dt=0.08)
    assert (0, 0) in pairs and (1, 1) in pairs
    assert all(ib != 3 for _, ib in pairs)


def test_geodesic_loss_zero_at_gt(rng):
    N = 4
    xi = rng.normal(size=(1, N, 6)).astype(np.float32) * 0.1
    Ps = lie.se3_exp(jnp.asarray(xi))
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 2, 3])
    loss, metrics = losses.geodesic_loss(Ps, [Ps, Ps], ii, jj, do_scale=False)
    assert float(loss) < 1e-5
    assert float(metrics["rot_error"]) < 1e-4


def test_geodesic_loss_positive_off_gt(rng):
    N = 4
    xi = rng.normal(size=(1, N, 6)).astype(np.float32) * 0.1
    Ps = lie.se3_exp(jnp.asarray(xi))
    Gs = lie.se3_exp(jnp.asarray(xi * 0.5))
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 2, 3])
    loss, _ = losses.geodesic_loss(Ps, [Gs], ii, jj, do_scale=False)
    assert float(loss) > 1e-3


def test_flow_loss_shapes(rng):
    B, N, H, W = 1, 3, 32, 48
    xi = rng.normal(size=(B, N, 6)).astype(np.float32) * 0.02
    Ps = lie.se3_exp(jnp.asarray(xi))
    disps = jnp.asarray(
        0.5 + 0.3 * rng.random((B, N, H, W)).astype(np.float32)
    )
    intr = jnp.broadcast_to(
        jnp.asarray([40.0, 40.0, W / 2, H / 2]), (B, N, 4)
    )
    loss, metrics = losses.flow_loss(Ps, disps, [Ps], [disps], intr)
    assert float(loss) < 1e-4  # same poses -> zero flow difference
    assert np.isfinite(float(metrics["f_error"]))


def test_residual_loss(rng):
    r = [jnp.asarray(rng.normal(size=(1, 3, 8, 8, 2)), jnp.float32)]
    loss, _ = losses.residual_loss(r)
    assert float(loss) > 0
