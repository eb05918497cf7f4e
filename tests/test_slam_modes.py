"""End-to-end smoke tests for the stereo and RGB-D SLAM modes (random
weights; checks the mode-specific paths: stereo self-edges + rig feature
slots, sensed-disparity adoption + depth-conditioned BA)."""

import numpy as np
import pytest

from lgu_slam_tpu.slam.system import LGUSlam, init_params
from lgu_slam_tpu.utils.config import SLAMConfig


def make_cfg(stereo=False):
    return SLAMConfig(
        image_size=(64, 96), buffer=16, warmup=4,
        filter_thresh=0.0, keyframe_thresh=0.0,
        frontend_window=6, frontend_iters1=1, frontend_iters2=1,
        max_factors=16, edge_bucket=24, inactive_bucket=24,
        pose_bucket=16, backend_edge_cap=32, backend_chunk=16,
        stereo=stereo,
    )


def synthetic_frames(n=8, H=64, W=96, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(H * 2, W * 2, 3)).astype(np.float32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3.0
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)
    for t in range(n):
        dy, dx = 3 * t, 2 * t
        img = base[dy : dy + H, dx : dx + W].astype(np.uint8)
        right = base[dy : dy + H, dx + 4 : dx + W + 4].astype(np.uint8)
        yield t, img, right, intr


@pytest.mark.slow
def test_stereo_mode_runs():
    cfg = make_cfg(stereo=True)
    net, params = init_params(cfg, seed=0)
    slam = LGUSlam(params, cfg, net_def=net)
    for t, left, right, intr in synthetic_frames():
        slam.track(float(t), np.stack([left, right]), intrinsics=intr)
    assert slam.video.counter > cfg.warmup
    # stereo self-edges were added during init (graph has ii == jj entries)
    t = slam.video.counter
    assert np.all(np.isfinite(np.asarray(slam.video.state.poses[:t])))


@pytest.mark.slow
def test_rgbd_mode_uses_sensed_depth():
    cfg = make_cfg(stereo=False)
    net, params = init_params(cfg, seed=0)
    slam = LGUSlam(params, cfg, net_def=net)
    H, W = cfg.image_size
    for t, img, _, intr in synthetic_frames():
        depth = np.full((H, W), 2.0 + 0.1 * t, np.float32)
        slam.track(float(t), img, depth=depth, intrinsics=intr)
    t = slam.video.counter
    assert t > cfg.warmup
    sens = np.asarray(slam.video.state.disps_sens[:t])
    assert (sens > 0).all()
    # the frontend adopts sensed disparity on new keyframes, and the
    # RGB-D prior pins the solution near it
    disps = np.asarray(slam.video.state.disps[:t])
    err = np.abs(disps - sens) / sens
    assert np.median(err) < 0.5
    assert np.all(np.isfinite(np.asarray(slam.video.state.poses[:t])))
