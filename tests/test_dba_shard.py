"""Distributed DBA on a virtual 8-device CPU mesh must match the
single-device DBA bit-for-bit (deterministic reductions aside)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom import projective as pops
from lgu_slam_tpu.geom.dba import DbaPlan, dba_step
from lgu_slam_tpu.parallel.dba_shard import ShardedDbaPlan, dba_step_sharded


def make_scene(rng, N=8, H=8, W=12):
    xi_gt = np.cumsum(rng.normal(size=(N, 6)) * 0.03, axis=0).astype(np.float32)
    poses_gt = lie.se3_exp(jnp.asarray(xi_gt))
    disps_gt = jnp.asarray(0.6 + 0.2 * rng.random((N, H, W)).astype(np.float32))
    intr = jnp.asarray([15.0, 15.0, W / 2, H / 2], jnp.float32)
    ii, jj = [], []
    for i in range(N):
        for j in range(N):
            if 0 < abs(i - j) <= 2:
                ii.append(i)
                jj.append(j)
    ii = np.asarray(ii, np.int32)
    jj = np.asarray(jj, np.int32)
    intr_n = jnp.broadcast_to(intr, (N, 4))
    target, _ = pops.projective_transform(
        poses_gt, disps_gt, intr_n, jnp.asarray(ii), jnp.asarray(jj)
    )
    return poses_gt, disps_gt, intr, ii, jj, target


def test_sharded_dba_matches_single_device(rng):
    poses_gt, disps_gt, intr, ii, jj, target = make_scene(rng)
    N, H, W = disps_gt.shape
    E = len(ii)
    weight = jnp.ones_like(target)
    eta = jnp.full((N, H, W), 1e-3)
    sens = jnp.zeros((N, H, W))

    poses0 = lie.se3_mul(
        lie.se3_exp(jnp.asarray(rng.normal(size=(N, 6)) * 0.02, jnp.float32)),
        poses_gt,
    )
    disps0 = disps_gt + jnp.asarray(
        rng.normal(size=(N, H, W)) * 0.02, jnp.float32
    )

    # single-device reference
    plan = DbaPlan.build(ii, jj, N, edge_bucket=E)
    p_ref, d_ref = dba_step(
        poses0, disps0, intr, sens, target, weight, eta,
        *plan.jax_arrays(),
        jnp.int32(1), jnp.int32(N), P=N - 1, iters=2,
    )

    # sharded over 8 virtual devices
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("edge",))
    splan = ShardedDbaPlan.build(ii, jj, N, n_dev)
    D, Es = splan.ii.shape
    tnp = np.zeros((D, Es, H, W, 2), np.float32)
    wnp = np.zeros((D, Es, H, W, 2), np.float32)
    tgt_np = np.asarray(target)
    wgt_np = np.asarray(weight)
    for s in range(D):
        for l in range(Es):
            if splan.edge_mask[s, l] > 0:
                g = splan.perm[s, l]
                tnp[s, l] = tgt_np[g]
                wnp[s, l] = wgt_np[g]
    p_sh, d_sh = dba_step_sharded(
        mesh, "edge", poses0, disps0, intr, sens,
        jnp.asarray(tnp), jnp.asarray(wnp), eta,
        (splan.ii, splan.jj, splan.edge_mask, splan.rows_of_frame,
         splan.owned),
        1, N, P_bucket=N - 1, iters=2,
    )

    np.testing.assert_allclose(
        np.asarray(p_sh), np.asarray(p_ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_sh), np.asarray(d_ref), atol=2e-4, rtol=1e-3
    )
