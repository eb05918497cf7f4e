"""Reconstruction export (reference: droid_slam/visualization.py +
view_reconstruction.py).

The reference runs an interactive Open3D process fed by shared CUDA
tensors.  Open3D is not available here, so this module provides the same
geometry path — back-projection + multi-view consistency filtering
(droid_backends.iproj / depth_filter) — as batch export utilities: point
clouds to .ply (self-contained ASCII/binary writer) and camera frusta to
line sets.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom.depth_filter import depth_filter
from lgu_slam_tpu.geom.projective import iproj


def backproject_points(poses, disps, intrinsics, images=None,
                       filter_thresh=0.005, filter_count=2):
    """Back-project filtered depth into world points
    (visualization.py:84-112).

    poses [N,7] (w2c), disps [N,h,w], intrinsics [4] (1/8 scale), images
    optional [N,H,W,3] for colors (sampled at [3::8, 3::8]).
    Returns (points [M,3], colors [M,3] or None).
    """
    poses = jnp.asarray(poses)
    disps = jnp.asarray(disps)
    N, h, w = disps.shape
    inds = jnp.arange(N)
    thresh = filter_thresh * jnp.mean(disps, axis=(1, 2))
    counts = depth_filter(
        poses, disps, jnp.asarray(intrinsics), inds, thresh
    )

    mask = (np.asarray(counts) >= filter_count) & (
        np.asarray(disps) > 0.5 * np.asarray(disps).mean(axis=(1, 2),
                                                         keepdims=True)
    )

    X = iproj(disps, jnp.broadcast_to(jnp.asarray(intrinsics), (N, 4)))
    Z = 1.0 / jnp.maximum(X[..., 3], 1e-6)
    pts_cam = X[..., :3] * Z[..., None]
    c2w = lie.se3_inv(poses)
    pts_world = lie.se3_act(c2w[:, None, None, :], pts_cam)

    pts = np.asarray(pts_world)[mask]
    colors = None
    if images is not None:
        img8 = np.asarray(images)[:, 3::8, 3::8]
        colors = img8[mask][:, ::-1]  # BGR -> RGB
    return pts, colors


def write_ply(path, points, colors=None):
    """Minimal binary-little-endian PLY writer."""
    n = len(points)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if colors is None:
            f.write(points.astype("<f4").tobytes())
        else:
            rec = np.zeros(
                n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)]
            )
            rec["xyz"] = points
            rec["rgb"] = colors
            f.write(rec.tobytes())


def export_reconstruction(video_state, counter, path, filter_thresh=0.005):
    """Dump the current map as a colored point cloud."""
    s = video_state
    t = counter
    pts, colors = backproject_points(
        s.poses[:t], s.disps[:t], s.intrinsics[0], images=s.images[:t],
        filter_thresh=filter_thresh,
    )
    write_ply(path, pts, colors)
    return len(pts)


class IncrementalReconstruction:
    """Headless incremental consumer of the ``video.dirty`` protocol
    (reference droid_slam/visualization.py:81-154: the viewer wakes,
    reads ``dirty_index = where(video.dirty)``, clears the flags, and
    re-filters/re-projects ONLY those frames, updating per-frame point
    and camera actors).

    Here the "actors" are per-frame point/pose caches; ``export_ply``
    writes the current union, so snapshots grow as tracking proceeds
    without re-processing clean frames.
    """

    def __init__(self, video, filter_thresh=0.005, filter_count=2):
        self.video = video
        self.filter_thresh = filter_thresh
        self.filter_count = filter_count
        self.points = {}   # frame -> (pts [M,3], cols [M,3] | None)
        self.cameras = {}  # frame -> 7-vector world-to-camera pose

    def update(self):
        """Consume dirty flags; returns #frames refreshed."""
        t = self.video.counter
        dirty = np.where(np.asarray(self.video.dirty[:t]))[0]
        if len(dirty) == 0:
            return 0
        self.video.dirty[dirty] = False  # visualization.py:86

        s = self.video.state
        poses = jnp.asarray(s.poses[:t])
        disps = jnp.asarray(s.disps[:t])
        intr = jnp.asarray(s.intrinsics[0])
        d_np = np.asarray(disps)

        # multiview-consistency counts for the dirty frames only
        thresh = self.filter_thresh * jnp.mean(disps, axis=(1, 2))
        counts = np.asarray(depth_filter(
            poses, disps, intr, jnp.asarray(dirty, jnp.int32),
            thresh[jnp.asarray(dirty)],
        ))

        N = t
        X = iproj(disps, jnp.broadcast_to(intr, (N, 4)))
        Z = 1.0 / jnp.maximum(X[..., 3], 1e-6)
        pts_cam = X[..., :3] * Z[..., None]
        c2w = lie.se3_inv(poses)
        pts_world = np.asarray(
            lie.se3_act(c2w[:, None, None, :], pts_cam)
        )
        imgs = np.asarray(s.images[:t])[:, 3::8, 3::8] \
            if s.images is not None else None

        for k, f in enumerate(dirty):
            mask = (counts[k] >= self.filter_count) & (
                d_np[f] > 0.5 * d_np[f].mean()
            )
            pts = pts_world[f][mask]
            cols = imgs[f][mask][:, ::-1] if imgs is not None else None
            self.points[int(f)] = (pts, cols)
            self.cameras[int(f)] = np.asarray(s.poses[f])
        return len(dirty)

    def export_ply(self, path):
        """Write the union of all cached frame clouds."""
        if not self.points:
            write_ply(path, np.zeros((0, 3), np.float32))
            return 0
        pts = np.concatenate([p for p, _ in self.points.values()])
        cols = None
        if next(iter(self.points.values()))[1] is not None:
            cols = np.concatenate([c for _, c in self.points.values()])
        write_ply(path, pts, cols)
        return len(pts)

    def export_frusta(self, path, scale=0.05):
        """Camera frusta as a PLY line set (create_camera_actor analog)."""
        corners = np.asarray([
            [0, 0, 0], [-1, -1, 1.5], [1, -1, 1.5], [1, 1, 1.5],
            [-1, 1, 1.5],
        ], np.float32) * scale
        edges = np.asarray([
            [0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1],
        ], np.int32)
        verts, lines = [], []
        for k, (f, pose) in enumerate(sorted(self.cameras.items())):
            c2w = lie.se3_inv(jnp.asarray(pose)[None])[0]
            v = np.asarray(lie.se3_act(
                jnp.broadcast_to(c2w, (len(corners), 7)),
                jnp.asarray(corners)))
            verts.append(v)
            lines.append(edges + 5 * k)
        verts = np.concatenate(verts) if verts else np.zeros((0, 3))
        lines = np.concatenate(lines) if lines else np.zeros((0, 2), np.int32)
        with open(path, "wb") as fh:
            header = [
                "ply", "format binary_little_endian 1.0",
                f"element vertex {len(verts)}",
                "property float x", "property float y", "property float z",
                f"element edge {len(lines)}",
                "property int vertex1", "property int vertex2",
                "end_header",
            ]
            fh.write(("\n".join(header) + "\n").encode())
            fh.write(verts.astype("<f4").tobytes())
            fh.write(lines.astype("<i4").tobytes())
        return len(self.cameras)
