"""Geometry-only end-to-end convergence through the REAL FactorGraph
plumbing (SURVEY.md §4: known poses/depths -> near-zero error).

Unlike tests/test_dba.py (geom/dba.py in isolation), this drives the
padded-slot / host-plan / DBA pipeline the SLAM system actually runs:
FactorGraph.add_factors -> rm_factors(store=True) (inactive pool) ->
_run_dba with use_inactive=True — the exact path update()/update_lowmem
take per step (reference guarantees: droid_kernels.cu:1314-1434).  With
ground-truth reprojection targets and unit weights, poses and depths must
converge to the ground truth (up to the monocular gauge) independent of
any learned weights."""

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom import projective as pops
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.system import init_params
from lgu_slam_tpu.utils.config import SLAMConfig


def make_cfg(T):
    return SLAMConfig(
        image_size=(64, 96), buffer=T, warmup=4,
        max_factors=64, edge_bucket=64, inactive_bucket=16,
        pose_bucket=T, backend_edge_cap=64, backend_chunk=8,
    )


def pose_err(p, poses_gt):
    d = lie.se3_mul(p, lie.se3_inv(poses_gt))
    return float(jnp.linalg.norm(lie.se3_log(d)[1:], axis=-1).mean())


def test_factor_graph_dba_converges_to_ground_truth(rng):
    T = 8
    cfg = make_cfg(T)
    h, w = cfg.ht8, cfg.wd8

    # ground-truth scene
    xi_gt = np.cumsum(rng.normal(size=(T, 6)) * 0.03, 0).astype(np.float32)
    poses_gt = lie.se3_exp(jnp.asarray(xi_gt))
    disps_gt = jnp.asarray(
        0.6 + 0.2 * rng.random((T, h, w)).astype(np.float32)
    )
    intr = jnp.asarray([w * 2.0, w * 2.0, w / 2, h / 2], jnp.float32)

    # video staged with PERTURBED geometry
    net, params = init_params(cfg, seed=0)
    video = Video(cfg)
    video.counter = T
    noise = rng.normal(size=(T, 6)).astype(np.float32) * 0.01
    noise[0] = 0.0  # frame 0 is the gauge anchor (t0=1)
    poses0 = lie.se3_mul(lie.se3_exp(jnp.asarray(noise)), poses_gt)
    disps0 = disps_gt * jnp.asarray(
        1.0 + 0.05 * rng.normal(size=(T, h, w)).astype(np.float32)
    )
    video.state = video.state._replace(
        poses=video.state.poses.at[:T].set(poses0),
        disps=video.state.disps.at[:T].set(disps0),
        intrinsics=video.state.intrinsics.at[:T].set(intr),
    )

    graph = FactorGraph(net, params, video, cfg, max_factors=64,
                        edge_bucket=64, inactive_bucket=16)
    ii, jj = [], []
    for i in range(T):
        for j in range(T):
            if 0 < abs(i - j) <= 2:
                ii.append(i)
                jj.append(j)
    graph.add_factors(np.asarray(ii, np.int32), np.asarray(jj, np.int32))

    # move a few edges to the inactive pool so _run_dba's use_inactive
    # gather path is part of the proof
    drop = np.zeros(graph.n_edges, bool)
    drop[-4:] = True
    kept = graph.n_edges - 4
    graph.rm_factors(drop, store=True)
    assert graph.n_edges == kept and len(graph.ii_inac) == 4

    # ground-truth reprojection targets for ALL edges (active + inactive)
    intr_n = jnp.broadcast_to(intr, (T, 4))

    def gt_target(ii_a, jj_a):
        tgt, _ = pops.projective_transform(
            poses_gt, disps_gt, intr_n, jnp.asarray(ii_a), jnp.asarray(jj_a)
        )
        return tgt

    graph.target = graph.target.at[: graph.n_edges].set(
        gt_target(graph.ii, graph.jj))
    graph.weight = graph.weight.at[: graph.n_edges].set(1.0)
    graph.target_inac = graph.target_inac.at[:4].set(
        gt_target(graph.ii_inac, graph.jj_inac))
    graph.weight_inac = graph.weight_inac.at[:4].set(1.0)
    # near-zero damping: trust the exact targets
    video.state = video.state._replace(
        damping=jnp.full_like(video.state.damping, 1e-4)
    )

    err0 = pose_err(video.state.poses[:T], poses_gt)
    derr0 = float(jnp.abs(video.state.disps[:T] - disps_gt).mean())
    for _ in range(6):
        graph._run_dba(t0=1, t1=T, itrs=2, use_inactive=True, EP=1e-7,
                       motion_only=False)
        # _run_dba re-damps from video.damping each call; keep it tiny
        video.state = video.state._replace(
            damping=jnp.full_like(video.state.damping, 1e-4)
        )

    err1 = pose_err(video.state.poses[:T], poses_gt)
    derr1 = float(jnp.abs(video.state.disps[:T] - disps_gt).mean())
    assert np.isfinite(err1) and np.isfinite(derr1)
    assert err1 < 0.1 * err0, (err0, err1)
    assert derr1 < 0.2 * derr0, (derr0, derr1)
    assert err1 < 2e-3, err1

    # residual flow of the converged solution is ~0 pixels
    tgt_now, _ = pops.projective_transform(
        video.state.poses, video.state.disps, video.state.intrinsics,
        jnp.asarray(graph.ii), jnp.asarray(graph.jj),
    )
    resid = float(jnp.abs(
        tgt_now - graph.target[: graph.n_edges]).mean())
    assert resid < 0.02, resid
