"""Tests for the inference DBA: synthetic convergence, RGB-D prior,
padding invariance, and cross-check against the differentiable training BA
(the two build mathematically identical linear systems when the window
covers all poses)."""

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom import projective as pops
from lgu_slam_tpu.geom.ba import ba
from lgu_slam_tpu.geom.dba import DbaPlan, dba_step


def make_scene(rng, N=5, H=12, W=16):
    xi_gt = np.cumsum(rng.normal(size=(N, 6)) * 0.03, axis=0).astype(np.float32)
    poses_gt = lie.se3_exp(jnp.asarray(xi_gt))
    disps_gt = jnp.asarray(0.6 + 0.2 * rng.random((N, H, W)).astype(np.float32))
    intr = jnp.asarray([20.0, 20.0, W / 2, H / 2], jnp.float32)
    ii = np.array([0, 1, 2, 3, 0, 1, 2, 4, 3, 4], np.int32)
    jj = np.array([1, 2, 3, 4, 2, 3, 4, 2, 1, 0], np.int32)
    intr_n = jnp.broadcast_to(intr, (N, 4))
    target, _ = pops.projective_transform(
        poses_gt, disps_gt, intr_n, jnp.asarray(ii), jnp.asarray(jj)
    )
    return poses_gt, disps_gt, intr, ii, jj, target


def pose_err(p, poses_gt):
    d = lie.se3_mul(p, lie.se3_inv(poses_gt))
    return float(jnp.linalg.norm(lie.se3_log(d)[1:], axis=-1).mean())


def pad_edges(x, bucket):
    E = x.shape[0]
    if E == bucket:
        return x
    return jnp.zeros((bucket,) + x.shape[1:], x.dtype).at[:E].set(x)


def run_dba(poses, disps, intr, plan, target, weight, eta, sens, t0, t1, P,
            iters=2, motion_only=False):
    bucket = plan.ii.shape[0]
    target = pad_edges(target, bucket)
    weight = pad_edges(weight, bucket)
    return dba_step(
        poses, disps, intr, sens, target, weight, eta,
        *plan.jax_arrays(),
        jnp.int32(t0), jnp.int32(t1),
        P=P, iters=iters, motion_only=motion_only,
    )


def test_dba_converges(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    plan = DbaPlan.build(ii, jj, N, edge_bucket=16)
    weight = jnp.ones_like(target)
    eta = jnp.full((N, H, W), 1e-4)
    sens = jnp.zeros((N, H, W))

    poses = jnp.broadcast_to(lie.se3_identity(), (N, 7)).at[0].set(poses_gt[0])
    disps = jnp.ones((N, H, W), jnp.float32) * 0.7

    err0 = pose_err(poses, poses_gt)
    for _ in range(10):
        poses, disps = run_dba(
            poses, disps, intr, plan, target, weight, eta, sens, 1, N, P=8
        )
    err1 = pose_err(poses, poses_gt)
    assert err1 < err0 * 0.05, (err0, err1)
    assert float(jnp.abs(disps - disps_gt)[1:].mean()) < 2e-2


def test_dba_matches_training_ba_poses(rng):
    """With t0=1=fixedp, full window, lm=0: identical pose updates."""
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    plan = DbaPlan.build(ii, jj, N, edge_bucket=len(ii))
    weight = jnp.ones_like(target)
    eta = jnp.full((N, H, W), 1e-3)
    sens = jnp.zeros((N, H, W))

    poses0 = lie.se3_exp(
        jnp.asarray(rng.normal(size=(N, 6)) * 0.02, jnp.float32)
    )
    poses0 = lie.se3_mul(poses0, poses_gt)
    disps0 = disps_gt + jnp.asarray(rng.normal(size=(N, H, W)) * 0.02, jnp.float32)

    p_dba, d_dba = dba_step(
        poses0, disps0, intr, sens, target, weight, eta,
        *plan.jax_arrays(),
        jnp.int32(1), jnp.int32(N), P=N - 1, iters=1, lm=0.0, ep=0.1,
    )

    intr_n = jnp.broadcast_to(intr, (N, 4))
    # training ba adds 1e-7 inside; match by subtracting from eta (negligible)
    p_tr, d_tr = ba(
        target[None], weight[None], eta[None], poses0[None], disps0[None],
        intr_n[None], jnp.asarray(ii), jnp.asarray(jj), fixedp=1,
        ep=0.1, lm=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(p_dba), np.asarray(p_tr[0]), atol=5e-4, rtol=1e-3
    )


def test_dba_motion_only(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    plan = DbaPlan.build(ii, jj, N, edge_bucket=16)
    weight = jnp.ones_like(target)
    eta = jnp.full((N, H, W), 1e-4)
    sens = jnp.zeros((N, H, W))

    poses = jnp.broadcast_to(lie.se3_identity(), (N, 7)).at[0].set(poses_gt[0])
    err0 = pose_err(poses, poses_gt)
    for _ in range(10):
        poses, _ = run_dba(
            poses, disps_gt, intr, plan, target, weight, eta, sens, 1, N, P=8,
            motion_only=True,
        )
    err1 = pose_err(poses, poses_gt)
    assert err1 < err0 * 0.05, (err0, err1)


def test_dba_rgbd_prior_pulls_depth(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    plan = DbaPlan.build(ii, jj, N, edge_bucket=16)
    # zero weights: only the depth prior acts
    weight = jnp.zeros_like(target)
    eta = jnp.full((N, H, W), 1e-4)
    sens = disps_gt  # sensed disparity everywhere

    disps = jnp.ones((N, H, W), jnp.float32) * 0.9
    poses = poses_gt
    _, disps1 = run_dba(
        poses, disps, intr, plan, target, weight, eta, sens, 1, N, P=8, iters=1
    )
    # dz = -alpha (d - d_sens) / alpha = sens - d  => one step snaps to sensor
    np.testing.assert_allclose(
        np.asarray(disps1[1:]), np.asarray(disps_gt[1:]), atol=1e-3
    )


def test_dba_padding_invariance(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    weight = jnp.ones_like(target)
    eta = jnp.full((N, H, W), 1e-3)
    sens = jnp.zeros((N, H, W))
    poses0 = jnp.broadcast_to(lie.se3_identity(), (N, 7)).at[0].set(poses_gt[0])
    disps0 = jnp.ones((N, H, W), jnp.float32) * 0.7

    outs = []
    for bucket, dmax, P in [(10, 8, 8), (24, 16, 12)]:
        plan = DbaPlan.build(ii, jj, N, edge_bucket=bucket, dmax_bucket=dmax)
        tgt = jnp.zeros((bucket, H, W, 2)).at[: len(ii)].set(target)
        wgt = jnp.zeros((bucket, H, W, 2)).at[: len(ii)].set(weight)
        p, d = dba_step(
            poses0, disps0, intr, sens, tgt, wgt, eta,
            *plan.jax_arrays(),
            jnp.int32(1), jnp.int32(N), P=P, iters=2,
        )
        outs.append((np.asarray(p), np.asarray(d)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)


def test_slab_builder_matches_reference_formulation(rng):
    """The TPU slab-layout linear-system builder == the generic Jacobian
    formulation (stereo edge + dead edge included)."""
    from lgu_slam_tpu.geom.dba import (
        _build_linear_system,
        _build_linear_system_ref,
    )

    N, h, w = 10, 6, 8
    poses = lie.se3_exp(
        jnp.asarray(np.cumsum(rng.normal(size=(N, 6)) * 0.05, 0), jnp.float32)
    )
    disps = jnp.asarray(0.4 + 0.5 * rng.random((N, h, w)), jnp.float32)
    intr = jnp.broadcast_to(jnp.asarray([10.0, 11.0, 4.0, 3.0]), (N, 4))
    ii = jnp.asarray([0, 1, 2, 3, 3, 5, 7], jnp.int32)
    jj = jnp.asarray([1, 0, 3, 2, 3, 6, 5], jnp.int32)  # (3,3) = stereo
    E = ii.shape[0]
    target = jnp.asarray(rng.normal(size=(E, h, w, 2)), jnp.float32) * 3 + 4
    weight = jnp.asarray(rng.random((E, h, w, 2)), jnp.float32)
    emask = jnp.asarray([1, 1, 1, 1, 1, 1, 0], jnp.float32)

    ref = _build_linear_system_ref(
        poses, disps, intr, target, weight, ii, jj, emask
    )
    out = _build_linear_system(
        poses, disps, intr, target, weight, ii, jj, emask
    )
    for name, x, y in zip(["He", "ve", "Eii", "Eij", "Cii", "bz"], ref, out):
        scale = max(float(jnp.abs(x).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), atol=2e-5 * scale, err_msg=name
        )


def test_dba_nan_target_keeps_state_finite(rng):
    """Non-finite observations must not poison poses/disps — the
    inference-path twin of test_ba.py's probe (ba_cuda's CPU LLT failure
    path returns zeros, droid_kernels.cu:1202-1210; here the damped
    solve falls back to a zero update, geom/dba.py:_solve_damped)."""
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    plan = DbaPlan.build(ii, jj, N, edge_bucket=len(ii))
    bad = jnp.asarray(target).at[0].set(jnp.nan).at[3, 2, 2, 0].set(jnp.inf)
    weight = jnp.ones_like(bad)
    eta = jnp.full((N, H, W), 1e-3)
    sens = jnp.zeros((N, H, W))
    p, d = run_dba(poses_gt, disps_gt, intr, plan, bad, weight, eta, sens,
                   1, N, P=N - 1)
    assert bool(jnp.isfinite(p).all())
    assert bool(jnp.isfinite(d).all())
    assert float(d.min()) >= 1e-3


def test_dba_zero_weight_graph_stays_finite(rng):
    """A fully down-weighted graph (every observation rejected) must
    leave the state finite and essentially unchanged — only damping
    holds the system together."""
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    plan = DbaPlan.build(ii, jj, N, edge_bucket=len(ii))
    weight = jnp.zeros_like(jnp.asarray(target))
    eta = jnp.full((N, H, W), 1e-3)
    sens = jnp.zeros((N, H, W))
    p, d = run_dba(poses_gt, disps_gt, intr, plan, jnp.asarray(target),
                   weight, eta, sens, 1, N, P=N - 1)
    assert bool(jnp.isfinite(p).all())
    assert bool(jnp.isfinite(d).all())
    # zero information => the damped system solves to (near-)zero updates
    assert pose_err(p, poses_gt) < 1e-5
    assert float(jnp.abs(d - disps_gt).max()) < 1e-4
