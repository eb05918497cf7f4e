"""SLAM system orchestrator (reference: droid_slam/droid.py ``Droid``)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lgu_slam_tpu import lie
from lgu_slam_tpu.models.net import LGUNet
from lgu_slam_tpu.slam.backend import Backend
from lgu_slam_tpu.slam.frontend import Frontend
from lgu_slam_tpu.slam.motion_filter import MotionFilter
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.trajectory_filler import TrajectoryFiller
from lgu_slam_tpu.utils.config import SLAMConfig


def init_params(cfg: SLAMConfig, seed: int = 0):
    """Random-initialized LGUNet parameters shaped for this config.

    Every parameter is a conv/linear whose shape is independent of the
    image size, so the init forward runs **on the host CPU at a tiny
    image size** — running it on the accelerator at full resolution cost
    ~170 s of tunnel round-trips (dozens of tiny RNG compiles) and was
    the round-2 bench-timeout culprit.  The finished pytree is then
    placed on the default device once.
    """
    net = LGUNet(volume_dtype=jnp.dtype(cfg.volume_dtype),
                 compute_dtype=jnp.dtype(cfg.compute_dtype),
                 alt_sub_chunk=cfg.backend_sub_chunk)
    H, W = 64, 96  # init-only; param shapes don't depend on H, W
    with jax.default_device(jax.devices("cpu")[0]):
        images = jnp.zeros((1, 2, H, W, 3), jnp.float32)
        ii = jnp.asarray([0, 1])
        jj = jnp.asarray([1, 0])
        Gs = jnp.broadcast_to(lie.se3_identity(), (1, 2, 7))
        disps = jnp.ones((1, 2, H // 8, W // 8), jnp.float32)
        intr = jnp.broadcast_to(
            jnp.asarray([W / 2.0, W / 2.0, W / 16.0, H / 16.0]), (1, 2, 4)
        )

        # ONE jitted program: flax's eager init dispatches thousands of
        # tiny ops, each paying compile-cache overhead (~12 min measured
        # when the persistent cache holds unloadable cross-machine CPU
        # AOT entries); jitted, the whole init is a single compile.
        def _init(rng):
            return net.init(rng, Gs, images, disps, intr, ii, jj, 1, 1)

        variables = jax.jit(_init)(jax.random.PRNGKey(seed))
        jax.block_until_ready(variables)
    params = variables["params"]
    if jax.default_backend() != "cpu":
        params = jax.device_put(params, jax.devices()[0])
    return net, params


class LGUSlam:
    """Wires motion filter + frontend + backend + trajectory filler
    (droid.py:17-42)."""

    def __init__(self, params, cfg: SLAMConfig, net_def: LGUNet | None = None):
        self.cfg = cfg
        self.net_def = net_def or LGUNet(
            volume_dtype=jnp.dtype(cfg.volume_dtype),
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            alt_sub_chunk=cfg.backend_sub_chunk,
        )
        self.params = params
        self.video = Video(cfg)
        self.filter = MotionFilter(self.net_def, params, self.video, cfg)
        self.frontend = Frontend(self.net_def, params, self.video, cfg)
        # >1 device: global backend passes shard the keyframe axis over
        # the whole mesh (parallel/backend_shard.py)
        mesh = None
        if jax.device_count() > 1:
            from jax.sharding import Mesh  # noqa: PLC0415

            mesh = Mesh(np.asarray(jax.devices()), ("kf",))
        self.backend = Backend(self.net_def, params, self.video, cfg,
                               mesh=mesh)
        self.traj_filler = TrajectoryFiller(
            self.net_def, params, self.video, cfg
        )

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """Per-frame entry (droid.py:61-72)."""
        self.filter.track(tstamp, image, depth, intrinsics)
        self.frontend()

    def terminate(self, stream=None, backend_steps=(7, 12)):
        """Final global optimization + trajectory filling (droid.py:74-88).

        Returns camera-to-world trajectory [T, 7] as numpy (t, q), matching
        the reference's ``traj_est.inv().data`` output.
        """
        del self.frontend

        for steps in backend_steps:
            self.backend(steps)

        if stream is not None:
            poses_w2c = self.traj_filler(stream)
        else:
            t = self.video.counter
            poses_w2c = np.asarray(self.video.state.poses[:t])

        return np.asarray(lie.se3_inv(jnp.asarray(poses_w2c)))
