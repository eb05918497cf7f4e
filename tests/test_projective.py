"""Tests for projective geometry: numeric-Jacobian oracle for the analytic
(Ji, Jj, Jz) of projective_transform, and flow consistency checks."""

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom import projective as pops


def make_problem(rng, n=3, ht=6, wd=8):
    xi = rng.normal(size=(n, 6)).astype(np.float32) * 0.1
    poses = lie.se3_exp(jnp.asarray(xi))
    disps = jnp.asarray(
        0.5 + 0.3 * rng.random(size=(n, ht, wd)).astype(np.float32)
    )
    intr = jnp.asarray(
        np.tile(np.array([10.0, 10.0, wd / 2, ht / 2], np.float32), (n, 1))
    )
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 2, 0])
    return poses, disps, intr, ii, jj


def test_iproj_proj_roundtrip(rng):
    poses, disps, intr, ii, jj = make_problem(rng)
    X = pops.iproj(disps, intr)
    coords, _ = pops.proj(X, intr)
    grid = pops.coords_grid(6, 8)
    np.testing.assert_allclose(
        np.asarray(coords), np.broadcast_to(np.asarray(grid), coords.shape), atol=1e-4
    )


def test_identity_transform_gives_grid(rng):
    poses, disps, intr, _, _ = make_problem(rng)
    poses = jnp.broadcast_to(lie.se3_identity(), poses.shape)
    coords, valid = pops.projective_transform(
        poses, disps, intr, jnp.asarray([0]), jnp.asarray([1])
    )
    grid = pops.coords_grid(6, 8)
    np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(grid), atol=1e-4)
    assert np.all(np.asarray(valid) == 1.0)


def test_jacobians_match_numeric(rng):
    poses, disps, intr, ii, jj = make_problem(rng)
    coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True
    )

    def coords_of(poses_, disps_):
        c, _ = pops.projective_transform(poses_, disps_, intr, ii, jj)
        return c

    eps = 1e-3
    # pose Jacobians: left-multiplied twist on pose ii and jj of edge 0
    for col in range(6):
        dxi = np.zeros((6,), np.float32)
        dxi[col] = eps

        def perturb(poses_, frame):
            g = lie.se3_retr(poses_[frame], jnp.asarray(dxi))
            return poses_.at[frame].set(g)

        # edge 0: ii=0 -> jj=1
        cp = coords_of(perturb(poses, 1), disps)
        cm = coords_of(perturb(poses, 1).at[1].set(
            lie.se3_retr(poses[1], jnp.asarray(-dxi))), disps)
        # central difference around base using +/- eps
        cp = coords_of(poses.at[1].set(lie.se3_retr(poses[1], jnp.asarray(dxi))), disps)
        cm = coords_of(poses.at[1].set(lie.se3_retr(poses[1], jnp.asarray(-dxi))), disps)
        num = (np.asarray(cp[0]) - np.asarray(cm[0])) / (2 * eps)
        ana = np.asarray(Jj[0, ..., col])
        m = np.asarray(valid[0, ..., 0]) > 0
        np.testing.assert_allclose(num[m], ana[m], atol=2e-2, rtol=1e-2)

        cp = coords_of(poses.at[0].set(lie.se3_retr(poses[0], jnp.asarray(dxi))), disps)
        cm = coords_of(poses.at[0].set(lie.se3_retr(poses[0], jnp.asarray(-dxi))), disps)
        num = (np.asarray(cp[0]) - np.asarray(cm[0])) / (2 * eps)
        ana = np.asarray(Ji[0, ..., col])
        np.testing.assert_allclose(num[m], ana[m], atol=2e-2, rtol=1e-2)

    # depth Jacobian
    dp = disps + eps
    dm = disps - eps
    num = (np.asarray(coords_of(poses, dp)[0]) - np.asarray(coords_of(poses, dm)[0])) / (
        2 * eps
    )
    ana = np.asarray(Jz[0, ..., 0])
    m = np.asarray(valid[0, ..., 0]) > 0
    np.testing.assert_allclose(num[m], ana[m], atol=1e-2, rtol=1e-2)


def test_stereo_edge_uses_fixed_baseline(rng):
    poses, disps, intr, _, _ = make_problem(rng)
    ii = jnp.asarray([1])
    jj = jnp.asarray([1])
    coords, _ = pops.projective_transform(poses, disps, intr, ii, jj)
    # stereo edge: pure x-translation of -0.1 scaled by fx*disp/Z
    grid = pops.coords_grid(6, 8)
    dx = np.asarray(coords[0, ..., 0] - grid[..., 0])
    d = np.asarray(disps[1])
    np.testing.assert_allclose(dx, -0.1 * 10.0 * d, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(coords[0, ..., 1]), np.asarray(grid[..., 1]), atol=1e-5
    )


def test_induced_flow_zero_for_identity(rng):
    poses, disps, intr, _, _ = make_problem(rng)
    poses = jnp.broadcast_to(lie.se3_identity(), poses.shape)
    flow, valid = pops.induced_flow(
        poses, disps, intr, jnp.asarray([0]), jnp.asarray([2])
    )
    np.testing.assert_allclose(np.asarray(flow), 0, atol=1e-4)


def test_projective_transform_jits(rng):
    poses, disps, intr, ii, jj = make_problem(rng)
    f = jax.jit(
        lambda p, d: pops.projective_transform(p, d, intr, ii, jj, jacobian=True)
    )
    coords, valid, Js = f(poses, disps)
    assert coords.shape == (3, 6, 8, 2)
    assert all(np.all(np.isfinite(np.asarray(J))) for J in Js)
