"""End-to-end SLAM smoke tests on a synthetic scene with random weights:
the full track/terminate pipeline must run, keep state finite, and produce
a trajectory of the right shape.  (Accuracy requires trained weights and is
covered by the benchmark harness, not unit tests.)"""

import numpy as np
import pytest

from lgu_slam_tpu.slam.system import LGUSlam, init_params
from lgu_slam_tpu.utils.config import SLAMConfig


def synthetic_stream(n_frames=14, H=64, W=96, seed=3):
    """Moving checkerboard-ish pattern with smooth global shift."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(H * 2, W * 2, 3)).astype(np.uint8)
    # smooth it a bit so bilinear shifts look like real texture
    base = (
        base.astype(np.float32)
        + np.roll(base, 1, 0)
        + np.roll(base, 1, 1)
        + np.roll(base, 2, 0)
    ) / 4.0
    intr = np.asarray([80.0, 80.0, W / 2, H / 2], np.float32)
    for t in range(n_frames):
        dy, dx = 3 * t, 2 * t
        img = base[dy : dy + H, dx : dx + W].astype(np.uint8)
        yield t, img, intr


@pytest.fixture(scope="module")
def tiny_cfg():
    return SLAMConfig(
        image_size=(64, 96),
        buffer=24,
        warmup=5,
        filter_thresh=0.0,  # random weights: accept every frame
        keyframe_thresh=0.0,  # and never cull
        frontend_window=8,
        frontend_iters1=2,
        frontend_iters2=1,
        max_factors=24,
        edge_bucket=32,
        inactive_bucket=32,
        pose_bucket=24,
        backend_edge_cap=64,
        backend_chunk=32,
    )


@pytest.fixture(scope="module")
def system_and_traj(tiny_cfg):
    net, params = init_params(tiny_cfg, seed=0)
    slam = LGUSlam(params, tiny_cfg, net_def=net)
    for t, img, intr in synthetic_stream():
        slam.track(float(t), img, intrinsics=intr)
    traj = slam.terminate(stream=None, backend_steps=(2,))
    return slam, traj


def test_keyframes_accumulated(system_and_traj, tiny_cfg):
    slam, _ = system_and_traj
    assert slam.video.counter > tiny_cfg.warmup


def test_trajectory_finite(system_and_traj):
    slam, traj = system_and_traj
    assert traj.shape[1] == 7
    assert np.all(np.isfinite(traj))
    # quaternions stay normalized through the pipeline
    qn = np.linalg.norm(traj[:, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


def test_video_state_finite(system_and_traj):
    slam, _ = system_and_traj
    t = slam.video.counter
    s = slam.video.state
    assert np.all(np.isfinite(np.asarray(s.poses[:t])))
    assert np.all(np.isfinite(np.asarray(s.disps[:t])))
    assert float(np.asarray(s.disps[:t]).min()) >= 1e-3


def test_graph_edges_bounded(system_and_traj, tiny_cfg):
    slam, _ = system_and_traj
    # frontend was deleted by terminate(); check config bound was respected
    assert slam.video.counter <= tiny_cfg.buffer


def test_distance_rect_matches_edge_list():
    """distance_rect (device-built candidate grid, no host index upload)
    must equal the padded edge-list distance (depth_video.py:158-171)."""
    import numpy as np

    from tests.test_lowmem import make_cfg, stage_video

    video = stage_video(make_cfg(), T=8, seed=3)
    ii, jj = np.meshgrid(np.arange(3, 8), np.arange(1, 8), indexing="ij")
    d_edges = video.distance(ii.reshape(-1), jj.reshape(-1), beta=0.25)
    d_rect = video.distance_rect(3, 8, 1, 8, beta=0.25).reshape(-1)
    np.testing.assert_allclose(d_rect, d_edges, rtol=1e-5, atol=1e-6)
