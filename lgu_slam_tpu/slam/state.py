"""Keyframe video state (reference: droid_slam/depth_video.py ``DepthVideo``).

TPU redesign: instead of shared-memory CUDA tensors guarded by a process
lock (depth_video.py:22-44), the map is an explicit pytree of fixed-shape
device arrays threaded through jitted updates.  The keyframe counter and
all topology live on the host; every device mutation is a jitted
functional update.  This is the single source of truth that the parallel
backend shards along the keyframe axis (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom.distance import frame_distance, frame_distance_bidirectional
from lgu_slam_tpu.geom.projective import projective_transform
from lgu_slam_tpu.utils.config import SLAMConfig


class VideoState(NamedTuple):
    """Fixed-capacity keyframe store (device pytree)."""

    tstamp: jnp.ndarray  # [N]
    images: jnp.ndarray  # [N, H, W, 3] uint8 (BGR, as read)
    poses: jnp.ndarray  # [N, 7] world-to-camera SE3
    disps: jnp.ndarray  # [N, h, w] inverse depth @ 1/8
    disps_sens: jnp.ndarray  # [N, h, w] sensed inverse depth (RGB-D)
    disps_up: jnp.ndarray  # [N, H, W] upsampled inverse depth
    intrinsics: jnp.ndarray  # [N, 4] @ 1/8 scale
    fmaps: jnp.ndarray  # [N, rig, h, w, 128] matching features
    nets: jnp.ndarray  # [N, h, w, 128] GRU hidden seeds
    inps: jnp.ndarray  # [N, h, w, 128] context features
    damping: jnp.ndarray  # [N, h, w] per-frame BA damping (factor_graph.py:33)


def make_video_state(cfg: SLAMConfig, feat_dtype=None) -> VideoState:
    N = cfg.buffer
    H, W = cfg.image_size
    h, w = H // 8, W // 8
    rig = 2 if cfg.stereo else 1
    fd = feat_dtype or jnp.dtype(cfg.feat_dtype)
    poses = jnp.tile(lie.se3_identity()[None], (N, 1))
    return VideoState(
        tstamp=jnp.zeros((N,), jnp.float32),
        images=jnp.zeros((N, H, W, 3), jnp.uint8),
        poses=poses,
        disps=jnp.ones((N, h, w), jnp.float32),
        disps_sens=jnp.zeros((N, h, w), jnp.float32),
        # full-res buffer only materialized when upsampling is on
        disps_up=(
            jnp.zeros((N, H, W), jnp.float32)
            if cfg.upsample
            else jnp.zeros((1, 1, 1), jnp.float32)
        ),
        intrinsics=jnp.zeros((N, 4), jnp.float32),
        fmaps=jnp.zeros((N, rig, h, w, 128), fd),
        nets=jnp.zeros((N, h, w, 128), fd),
        inps=jnp.zeros((N, h, w, 128), fd),
        damping=jnp.full((N, h, w), 1e-6, jnp.float32),
    )


@jax.jit
def video_append(
    video: VideoState,
    index: jnp.ndarray,
    tstamp,
    image,
    pose,
    disp,
    disp_sens,
    intrinsics,
    fmap,
    net,
    inp,
) -> VideoState:
    """Write one keyframe at ``index`` (depth_video.py:46-78 semantics:
    sensed depth is subsampled at [3::8, 3::8] by the caller)."""
    return video._replace(
        tstamp=video.tstamp.at[index].set(tstamp),
        images=video.images.at[index].set(image),
        poses=video.poses.at[index].set(pose),
        disps=video.disps.at[index].set(disp),
        disps_sens=video.disps_sens.at[index].set(disp_sens),
        intrinsics=video.intrinsics.at[index].set(intrinsics),
        fmaps=video.fmaps.at[index].set(fmap),
        nets=video.nets.at[index].set(net),
        inps=video.inps.at[index].set(inp),
    )


@jax.jit
def video_remove_keyframe(video: VideoState, ix: jnp.ndarray) -> VideoState:
    """Shift frame ix+1 into slot ix (factor_graph.py:170-184)."""

    def shift(arr):
        src = jnp.clip(ix + 1, 0, arr.shape[0] - 1)
        return arr.at[ix].set(arr[src])

    return VideoState(*[shift(a) for a in video])


@jax.jit
def video_normalize(video: VideoState, count: jnp.ndarray) -> VideoState:
    """Rescale mean disparity to 1 and scale translations accordingly
    (depth_video.py:130-137)."""
    N = video.disps.shape[0]
    m = (jnp.arange(N) < count).astype(video.disps.dtype)
    s = jnp.sum(video.disps * m[:, None, None]) / (
        jnp.sum(m) * video.disps.shape[1] * video.disps.shape[2]
    )
    disps = jnp.where(m[:, None, None] > 0, video.disps / s, video.disps)
    t_scaled = video.poses[:, :3] * s
    poses = video.poses.at[:, :3].set(
        jnp.where(m[:, None] > 0, t_scaled, video.poses[:, :3])
    )
    return video._replace(disps=disps, poses=poses)


class Video:
    """Host-side wrapper: owns the device pytree + the keyframe counter."""

    def __init__(self, cfg: SLAMConfig):
        self.cfg = cfg
        self.state = make_video_state(cfg)
        self.counter = 0
        self.stereo = cfg.stereo
        self.dirty = np.zeros(cfg.buffer, bool)

    # -- mutation -----------------------------------------------------------

    def append(self, tstamp, image, pose, disp, disp_sens, intrinsics,
               fmap, net, inp):
        self.state = video_append(
            self.state, jnp.int32(self.counter), tstamp, image, pose, disp,
            disp_sens, intrinsics, fmap, net, inp,
        )
        self.dirty[self.counter] = True
        self.counter += 1

    def remove_keyframe(self, ix: int):
        self.state = video_remove_keyframe(self.state, jnp.int32(ix))
        self.counter -= 1

    def normalize(self):
        self.state = video_normalize(self.state, jnp.int32(self.counter))
        self.dirty[: self.counter] = True

    # -- geometry -----------------------------------------------------------

    def reproject(self, ii, jj):
        ii = jnp.asarray(ii, jnp.int32)
        jj = jnp.asarray(jj, jnp.int32)
        return projective_transform(
            self.state.poses, self.state.disps, self.state.intrinsics, ii, jj
        )

    def distance(self, ii, jj, beta=0.3, bidirectional=True):
        """Distance for an arbitrary edge list.  Pads to power-of-two
        buckets so jit compiles O(log E) variants, not one per call."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        E = ii.shape[0]
        bucket = max(8, 1 << int(np.ceil(np.log2(max(E, 1)))))
        ii_p = np.zeros(bucket, np.int32)
        jj_p = np.zeros(bucket, np.int32)
        ii_p[:E] = ii
        jj_p[:E] = jj
        intr = self.state.intrinsics[0]
        fn = frame_distance_bidirectional if bidirectional else frame_distance
        d = fn(
            self.state.poses, self.state.disps, intr,
            jnp.asarray(ii_p), jnp.asarray(jj_p), beta,
        )
        return np.asarray(d)[:E]

    def distance_rect(self, i0, i1, j0, j1, beta=0.3):
        """Bidirectional distance for the dense index rectangle
        [i0, i1) x [j0, j1) with NO host index upload: the candidate grid
        is built on device from the scalar corners (proximity planning
        calls this once per keyframe; uploading the meshgrid cost a
        ~27 ms tunnel round-trip per call).  Returns [ni, nj] numpy."""
        ni, nj = i1 - i0, j1 - j0
        Bi = max(8, 1 << int(np.ceil(np.log2(max(ni, 1)))))
        Bj = max(8, 1 << int(np.ceil(np.log2(max(nj, 1)))))
        d = _distance_rect_padded(
            self.state.poses, self.state.disps, self.state.intrinsics[0],
            jnp.int32(i0), jnp.int32(j0), beta, Bi=Bi, Bj=Bj,
        )
        return np.asarray(d)[:ni, :nj]

    def distance_matrix(self, beta=0.3):
        t = self.counter
        ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
        d = self.distance(ii.reshape(-1), jj.reshape(-1), beta=beta)
        return d.reshape(t, t)


@functools.partial(jax.jit, static_argnames=("Bi", "Bj"))
def _distance_rect_padded(poses, disps, intr, i0, j0, beta, Bi, Bj):
    N = poses.shape[0]
    jj_row = jnp.clip(j0 + jnp.arange(Bj, dtype=jnp.int32), 0, N - 1)
    if Bi * Bj <= 4096:
        ii = jnp.clip(i0 + jnp.arange(Bi, dtype=jnp.int32), 0, N - 1)
        ii = jnp.repeat(ii, Bj)
        jj = jnp.tile(jj_row, Bi)
        d = frame_distance_bidirectional(poses, disps, intr, ii, jj, beta)
        return d.reshape(Bi, Bj)

    # large rectangles (backend terminate() plans over the FULL t x t
    # grid — 512x512 = 262k pairs whose per-pixel flow intermediates
    # would need ~36 GB dense): evaluate row-by-row under lax.map so the
    # peak is one row's [Bj, h, w, 2] flow buffer
    def row(i):
        ii = jnp.full((Bj,), jnp.clip(i0 + i, 0, N - 1), jnp.int32)
        return frame_distance_bidirectional(
            poses, disps, intr, ii, jj_row, beta
        )

    return jax.lax.map(row, jnp.arange(Bi, dtype=jnp.int32))
