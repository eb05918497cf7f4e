"""Frontend: sliding-window local BA tracking (reference:
droid_slam/droid_frontend.py).

All per-keyframe state mutations are jitted with *traced* indices — an
eager ``x.at[17].set(...)`` bakes the index into the executable and would
force one remote XLA compile per keyframe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.models.net import LGUNet
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.utils.config import SLAMConfig


@jax.jit
def _seed_next_state(poses, disps, t1):
    """poses[t1] = poses[t1-1]; disps[t1] = mean(disps[t1-1])
    (droid_frontend.py:69-70)."""
    poses = poses.at[t1].set(poses[t1 - 1])
    disps = disps.at[t1].set(jnp.mean(disps[t1 - 1]))
    return poses, disps


@jax.jit
def _adopt_sensed(disps, disps_sens, t):
    new = jnp.where(disps_sens[t] > 0, disps_sens[t], disps[t])
    return disps.at[t].set(new)


@jax.jit
def _seed_init_state(poses, disps, t1):
    """poses[t1] = poses[t1-1]; disps[t1] = mean(disps[t1-4:t1])
    (droid_frontend.py:92-93)."""
    poses = poses.at[t1].set(poses[t1 - 1])
    window = jax.lax.dynamic_slice_in_dim(disps, t1 - 4, 4, axis=0)
    disps = disps.at[t1].set(jnp.mean(window))
    return poses, disps


class Frontend:
    def __init__(self, net_def: LGUNet, params, video: Video, cfg: SLAMConfig):
        self.video = video
        self.cfg = cfg
        self.graph = FactorGraph(
            net_def, params, video, cfg, corr_impl="volume",
            max_factors=cfg.max_factors,
        )
        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = cfg.max_age
        self.iters1 = cfg.frontend_iters1
        self.iters2 = cfg.frontend_iters2

    def __call__(self):
        """Main update (droid_frontend.py:107-118)."""
        if not self.is_initialized and self.video.counter == self.cfg.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()

    # ------------------------------------------------------------------

    def _seed_next(self):
        """Seed the next frame's pose/disp from the last keyframe
        (droid_frontend.py:69-70)."""
        s = self.video.state
        poses, disps = _seed_next_state(s.poses, s.disps, jnp.int32(self.t1))
        self.video.state = s._replace(poses=poses, disps=disps)

    def _update(self):
        """Per-keyframe update (droid_frontend.py:35-73)."""
        cfg = self.cfg
        self.count += 1
        self.t1 += 1

        if self.graph.n_edges > 0:
            self.graph.rm_factors(self.graph.age > self.max_age, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - cfg.frontend_window, 0),
            rad=cfg.frontend_radius, nms=cfg.frontend_nms,
            thresh=cfg.frontend_thresh, beta=cfg.beta, remove=True,
        )

        # RGB-D: adopt sensed disparity where available (:47-48)
        s = self.video.state
        self.video.state = s._replace(
            disps=_adopt_sensed(s.disps, s.disps_sens, jnp.int32(self.t1 - 1))
        )

        self.graph.update_n(self.iters1, use_inactive=True)

        d = self.video.distance(
            [self.t1 - 3], [self.t1 - 2], beta=cfg.beta, bidirectional=True
        )[0]

        if d < cfg.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            self.t1 -= 1
        else:
            self.graph.update_n(self.iters2, use_inactive=True)

        self._seed_next()
        self.video.dirty[max(int(self.graph.ii.min()), 0) : self.t1] = True

    def _initialize(self):
        """Bootstrap on the first `warmup` keyframes
        (droid_frontend.py:75-105)."""
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        self.graph.update_n(8, t0=1, use_inactive=True)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.cfg.frontend_thresh, remove=False
        )
        self.graph.update_n(8, t0=1, use_inactive=True)

        s = self.video.state
        poses, disps = _seed_init_state(s.poses, s.disps, jnp.int32(self.t1))
        self.video.state = s._replace(poses=poses, disps=disps)

        self.is_initialized = True
        self.video.dirty[: self.t1] = True

        self.graph.rm_factors(self.graph.ii < self.cfg.warmup - 4, store=True)
