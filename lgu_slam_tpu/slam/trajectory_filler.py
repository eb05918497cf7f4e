"""Non-keyframe pose filling (reference: droid_slam/trajectory_filler.py):
linear SE(3) interpolation between bracketing keyframes followed by
16-frame batches of motion-only BA against the keyframe map."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.models.net import LGUNet
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.motion_filter import _encode_features
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.utils.config import SLAMConfig

BATCH = 16


class TrajectoryFiller:
    def __init__(self, net_def: LGUNet, params, video: Video, cfg: SLAMConfig):
        self.net_def = net_def
        self.params = params
        self.video = video
        self.cfg = cfg

    def _fill(self, tstamps, images, intrinsics):
        """trajectory_filler.py:37-79.  The batch is padded to BATCH so all
        device programs compile once."""
        video = self.video
        N = video.counter
        M = len(tstamps)
        # pad the batch by repeating the last frame (results discarded)
        while len(tstamps) < BATCH:
            tstamps = list(tstamps) + [tstamps[-1]]
            images = list(images) + [images[-1]]
            intrinsics = list(intrinsics) + [intrinsics[-1]]

        ts = np.asarray(video.state.tstamp[:N])
        Ps = video.state.poses

        tt = np.asarray(tstamps, np.float32)
        t0 = np.asarray(
            [max(int((ts <= t).sum()) - 1, 0) for t in tt], np.int32
        )
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3)[:, None]
        dP = lie.se3_rel(Ps[jnp.asarray(t0)], Ps[jnp.asarray(t1)])
        v = lie.se3_log(dP) / dt
        w = v * jnp.asarray(tt - ts[t0])[:, None]
        Gs = lie.se3_mul(lie.se3_exp(w), Ps[jnp.asarray(t0)])

        assert N + BATCH <= video.state.poses.shape[0], (
            "caller must reserve scratch headroom (see _widen_for_fill)"
        )
        # write fill frames into scratch slots [N, N+BATCH)
        fd = video.state.fmaps.dtype
        s = video.state
        idx = jnp.int32(N) + jnp.arange(BATCH)
        fmaps = jnp.stack(
            [
                _encode_features(self.net_def, self.params, jnp.asarray(im))
                for im in images
            ]
        )
        h, w8 = fmaps.shape[1:3]
        s = s._replace(
            tstamp=s.tstamp.at[idx].set(jnp.asarray(tt)),
            poses=s.poses.at[idx].set(Gs),
            disps=s.disps.at[idx].set(jnp.ones((BATCH, h, w8))),
            disps_sens=s.disps_sens.at[idx].set(jnp.zeros((BATCH, h, w8))),
            intrinsics=s.intrinsics.at[idx].set(
                jnp.asarray(np.stack(intrinsics), jnp.float32) / 8.0
            ),
            fmaps=s.fmaps.at[idx, 0].set(fmaps.astype(fd)),
        )
        video.state = s
        video.counter = N + BATCH

        graph = FactorGraph(
            self.net_def, self.params, video, self.cfg,
            corr_impl="volume", max_factors=4 * BATCH,
            edge_bucket=2 * BATCH, inactive_bucket=8,
        )
        graph.add_factors(t0, np.arange(N, N + BATCH))
        graph.add_factors(t1, np.arange(N, N + BATCH))

        graph.update_n(6, t0=N, t1=N + BATCH, motion_only=True)

        poses_out = np.asarray(video.state.poses[N : N + M])
        video.counter = N
        return [poses_out]

    def _widen_for_fill(self):
        """Reserve BATCH scratch slots past the keyframes.  When the
        keyframe buffer is full (exactly the long-sequence eval case,
        trajectory_filler.py:69-75 in the reference always has headroom
        because DepthVideo over-allocates) the state is widened ONCE for
        the whole trajectory — per-batch widening would concatenate-copy
        the full video state for every 16 frames.  Returns the original
        state to restore, or None if no widening was needed."""
        video = self.video
        buf = video.state.poses.shape[0]
        if video.counter + BATCH <= buf:
            return None
        orig_state = video.state
        pad = video.counter + BATCH - buf

        def _widen(arr):
            if arr.ndim == 0 or arr.shape[0] != buf:
                return arr  # e.g. the (1,1,1) disps_up placeholder
            z = jnp.zeros((pad,) + arr.shape[1:], arr.dtype)
            return jnp.concatenate([arr, z], axis=0)

        video.state = type(orig_state)(*[_widen(a) for a in orig_state])
        return orig_state

    def __call__(self, image_stream):
        """Fill every stream frame; returns the full camera trajectory
        [T, 7] (world-to-camera, like video poses)."""
        orig_state = self._widen_for_fill()
        orig_counter = self.video.counter
        try:
            pose_list = []
            tstamps, images, intrinsics = [], [], []
            for item in image_stream:
                t, image, intr = item[0], item[1], item[-1]
                if hasattr(image, "ndim") and image.ndim == 4:
                    image = image[0]  # stereo: left camera only
                tstamps.append(t)
                images.append(image)
                intrinsics.append(np.asarray(intr, np.float32))
                if len(tstamps) == BATCH:
                    pose_list += self._fill(tstamps, images, intrinsics)
                    tstamps, images, intrinsics = [], [], []
            if tstamps:
                pose_list += self._fill(tstamps, images, intrinsics)
            return np.concatenate(pose_list, axis=0)
        finally:
            # restore BOTH halves of the invariant even on mid-batch
            # failure: _fill bumps counter to N+BATCH before the BA, so
            # an exception there would otherwise leave it pointing past
            # the restored (un-widened) buffer
            self.video.counter = orig_counter
            if orig_state is not None:
                self.video.state = orig_state  # drop the widening
