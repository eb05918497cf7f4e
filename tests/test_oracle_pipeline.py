"""Oracle-driven full-pipeline accuracy (SURVEY §4: "known poses/depths ->
near-zero ATE"; reference guarantee: droid_kernels.cu:1314-1434).

A synthetic scene with known poses/disparities drives the REAL frontend
(init -> per-keyframe proximity planning -> fused 8x(update+DBA) ->
keyframe cull -> inactive store) and the REAL backend ``update_lowmem``
(fused single-device AND keyframe-sharded over the 8-device CPU mesh),
with only the learned update operator replaced by an oracle that emits
ground-truth reprojection targets and unit weights.  The final trajectory
must align to the ground truth with near-zero ATE (Sim(3): monocular BA
leaves global scale free).

The oracle threads edge identities through the real dataflow: each
keyframe's cached feature map encodes its ORIGINAL frame id at channel 0,
so after keyframe culls (video_remove_keyframe slot shifts) the decoded
ids still address the right ground-truth poses — no test-side shadow
bookkeeping of the graph topology.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lgu_slam_tpu import lie  # noqa: E402
from lgu_slam_tpu.eval.ate import ate_rmse  # noqa: E402
from lgu_slam_tpu.geom.projective import projective_transform  # noqa: E402
from lgu_slam_tpu.models.net import LGUNet  # noqa: E402
from lgu_slam_tpu.slam.backend import Backend  # noqa: E402
from lgu_slam_tpu.slam.frontend import Frontend  # noqa: E402
from lgu_slam_tpu.slam.state import Video  # noqa: E402
from lgu_slam_tpu.utils.config import SLAMConfig  # noqa: E402


class OracleNet:
    """Duck-typed LGUNet stand-in: the correlation machinery carries
    (frame-i id, frame-j id, current reprojection) and ``update_step``
    returns delta = gt_reprojection - coords1 with unit weights."""

    def __init__(self, gt_poses, gt_disps, gt_intr):
        self.gt_poses = jnp.asarray(gt_poses)
        self.gt_disps = jnp.asarray(gt_disps)
        self.gt_intr = jnp.asarray(gt_intr)  # [T, 4] @ 1/8

    def _encode(self, i_enc, j_enc, coords1):
        E, h, w, _ = coords1.shape
        c0 = jnp.broadcast_to(
            i_enc[:, None, None, None], (E, h, w, 1)
        ).astype(jnp.float32)
        c1 = jnp.broadcast_to(
            j_enc[:, None, None, None], (E, h, w, 1)
        ).astype(jnp.float32)
        pad = jnp.zeros((E, h, w, 196 - 4), jnp.float32)
        return jnp.concatenate([c0, c1, coords1, pad], axis=-1)

    def apply(self, variables, *args, method=None):
        if method is LGUNet.build_corr:
            f1, f2 = args[:2]
            return (f1[:, 0, 0, 0], f2[:, 0, 0, 0])
        if method is LGUNet.lookup:
            pyr, coords1 = args
            return self._encode(pyr[0], pyr[1], coords1)
        if method is LGUNet.alt_corr:
            fmap_pyr, ii_rig, jj_rig, coords1 = args
            # rig == 1 in these tests: rig-expanded ids are frame slots;
            # decode the ORIGINAL ids from the cached fmaps
            i_enc = fmap_pyr[0][ii_rig][:, 0, 0, 0] * 4.0
            j_enc = fmap_pyr[0][jj_rig][:, 0, 0, 0] * 4.0
            return self._encode(i_enc, j_enc, coords1)
        if method is LGUNet.update_step:
            net, inp, corr, motn, edge_slot, num_slots, edge_mask = args
            E, h, w = corr.shape[1:4]
            ii = jnp.round(corr[0, :, 0, 0, 0]).astype(jnp.int32)
            jj = jnp.round(corr[0, :, 0, 0, 1]).astype(jnp.int32)
            coords1 = corr[0, ..., 2:4]
            gt_coords, valid = projective_transform(
                self.gt_poses, self.gt_disps, self.gt_intr, ii, jj
            )
            delta = (gt_coords - coords1)[None]
            weight = jnp.ones((1, E, h, w, 2), jnp.float32)
            eta = jnp.full((1, num_slots, h, w), 1e-4, jnp.float32)
            upmask = jnp.zeros((1, num_slots, h, w, 576), jnp.float32)
            slot_mask = jnp.ones((num_slots,), bool)
            return net, delta, weight, eta, upmask, slot_mask
        raise NotImplementedError(method)


def _make_scene(T, h, w, seed=0):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=(T, 6)).astype(np.float32)
    xi[:, :3] *= 0.12   # translations
    xi[:, 3:] *= 0.015  # rotations
    xi[0] = 0
    # one near-duplicate keyframe so the frontend cull path fires
    xi[9] *= 0.02
    gt_poses = np.asarray(lie.se3_exp(jnp.asarray(np.cumsum(xi, axis=0))))
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 0.7 + 0.2 * np.sin(2 * np.pi * xx / w) * np.cos(2 * np.pi * yy / h)
    gt_disps = np.stack(
        [base + 0.05 * np.sin(t + yy / h) for t in range(T)]
    ).astype(np.float32)
    intr = np.broadcast_to(
        np.asarray([0.8 * w, 0.8 * w, w / 2.0, h / 2.0], np.float32), (T, 4)
    ).copy()
    return gt_poses, gt_disps, intr


def _run_pipeline(mesh=None, T=14):
    cfg = SLAMConfig(
        image_size=(64, 96), buffer=24, warmup=5,
        keyframe_thresh=0.25, frontend_window=10, frontend_radius=2,
        frontend_thresh=32.0, frontend_nms=1,
        frontend_iters1=6, frontend_iters2=4,
        max_factors=40, edge_bucket=48, inactive_bucket=48,
        pose_bucket=24, backend_edge_cap=128, backend_chunk=32,
        backend_thresh=64.0, backend_radius=2, backend_nms=1,
    )
    h, w = cfg.ht8, cfg.wd8
    gt_poses, gt_disps, gt_intr = _make_scene(T, h, w)
    oracle = OracleNet(gt_poses, gt_disps, gt_intr)

    video = Video(cfg)
    frontend = Frontend(oracle, None, video, cfg)

    img = jnp.zeros((64, 96, 3), jnp.uint8)
    zeros_hw = jnp.zeros((h, w), jnp.float32)
    feat = jnp.zeros((h, w, 128), video.state.nets.dtype)
    for t in range(T):
        idx = video.counter
        fmap = jnp.zeros((1, h, w, 128), video.state.fmaps.dtype)
        fmap = fmap.at[0, :, :, 0].set(float(t))
        if idx == 0:
            pose = lie.se3_identity()
            disp = jnp.ones((h, w), jnp.float32)
        else:  # keep the frontend-seeded pose/disp (motion_filter.py:123)
            pose = video.state.poses[idx]
            disp = video.state.disps[idx]
        video.append(jnp.float32(t), img, pose, disp, zeros_hw,
                     jnp.asarray(gt_intr[0]), fmap, feat, feat)
        frontend()

    assert video.counter < T, "cull path never fired"

    backend = Backend(oracle, None, video, cfg, mesh=mesh)
    backend(steps=6)

    k = video.counter
    tstamps = np.asarray(video.state.tstamp[:k]).astype(int)
    est = np.asarray(video.state.poses[:k])
    gt = gt_poses[tstamps]
    # poses are world-to-camera; compare camera centers (c2w translations)
    est_xyz = np.asarray(lie.se3_inv(jnp.asarray(est)))[:, :3]
    gt_xyz = np.asarray(lie.se3_inv(jnp.asarray(gt)))[:, :3]
    rmse, _, _ = ate_rmse(gt_xyz, est_xyz, correct_scale=True)
    extent = np.linalg.norm(gt_xyz.max(0) - gt_xyz.min(0))
    return rmse, extent, k


def test_oracle_pipeline_single_device():
    rmse, extent, k = _run_pipeline(mesh=None)
    assert k >= 10
    assert rmse < 0.01 * extent, (rmse, extent)


def test_oracle_pipeline_sharded_backend():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("kf",))
    rmse, extent, k = _run_pipeline(mesh=mesh)
    assert rmse < 0.01 * extent, (rmse, extent)
