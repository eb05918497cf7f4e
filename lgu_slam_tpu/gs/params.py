"""Gaussian map parameters with padded capacity (reference:
to3DGS/executeSlam.py:138-227 initialize_params / get_pointcloud /
add_new_gaussians, and utils/gs_external.py prune/densify machinery).

TPU redesign: the Gaussian set lives in fixed-capacity arrays with an
``alive`` mask; additions write into free slots and pruning clears the
mask, so every jit (render, loss, optimizer) compiles once per capacity
bucket instead of per count.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def pointcloud_from_depth(color, depth, intr, c2w_rot, c2w_trans,
                          mask=None):
    """Back-project an RGB-D frame to a world point cloud
    (executeSlam.py get_pointcloud).

    color [H,W,3] in [0,1]; depth [H,W]; intr (fx, fy, cx, cy).
    Returns (pts [M,3], cols [M,3], mean_sq_dist [M]) as numpy (host).
    """
    H, W = depth.shape
    fx, fy, cx, cy = intr
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    Z = np.asarray(depth)
    X = (xs + 0.5 - cx) / fx * Z
    Y = (ys + 0.5 - cy) / fy * Z
    pts_cam = np.stack([X, Y, Z], -1).reshape(-1, 3)
    cols = np.asarray(color).reshape(-1, 3)

    m = Z.reshape(-1) > 0
    if mask is not None:
        m &= np.asarray(mask).reshape(-1)
    pts_cam = pts_cam[m]
    cols = cols[m]
    pts_world = pts_cam @ np.asarray(c2w_rot).T + np.asarray(c2w_trans)
    # projective mean-square distance (scale init): ((z / f))^2
    msq = (pts_cam[:, 2] / ((fx + fy) / 2)) ** 2
    return pts_world, cols, msq


@dataclass
class GaussianMap:
    """Host wrapper over the padded parameter pytree."""

    params: dict  # means3D, rgb_colors, unnorm_rotations, logit_opacities,
    # log_scales — all [cap, ...]
    alive: np.ndarray  # [cap] bool (host copy; device mask in params use)
    count: int
    capacity: int
    timestep: np.ndarray  # [cap] frame each Gaussian was added

    @staticmethod
    def create(capacity: int):
        params = {
            "means3D": jnp.zeros((capacity, 3)),
            "rgb_colors": jnp.zeros((capacity, 3)),
            "unnorm_rotations": jnp.tile(
                jnp.asarray([1.0, 0, 0, 0]), (capacity, 1)
            ),
            "logit_opacities": jnp.zeros((capacity, 1)),
            "log_scales": jnp.full((capacity, 1), -10.0),
        }
        return GaussianMap(
            params, np.zeros(capacity, bool), 0, capacity,
            np.zeros(capacity, np.float32),
        )

    def add_points(self, pts, cols, mean_sq_dist, time_idx: int):
        """Append new isotropic Gaussians (initialize_new_params)."""
        n = len(pts)
        free = self.capacity - self.count
        if n > free:
            pts, cols, mean_sq_dist = pts[:free], cols[:free], mean_sq_dist[:free]
            n = free
        if n == 0:
            return
        idx = jnp.arange(self.count, self.count + n)
        p = self.params
        p = {
            "means3D": p["means3D"].at[idx].set(jnp.asarray(pts, jnp.float32)),
            "rgb_colors": p["rgb_colors"].at[idx].set(
                jnp.asarray(cols, jnp.float32)
            ),
            "unnorm_rotations": p["unnorm_rotations"].at[idx].set(
                jnp.asarray([1.0, 0, 0, 0])
            ),
            "logit_opacities": p["logit_opacities"].at[idx].set(0.0),
            "log_scales": p["log_scales"].at[idx].set(
                jnp.log(jnp.sqrt(jnp.asarray(mean_sq_dist, jnp.float32)))[
                    :, None
                ]
            ),
        }
        self.params = p
        self.alive[self.count : self.count + n] = True
        self.timestep[self.count : self.count + n] = time_idx
        self.count += n

    def prune(self, mask_remove: np.ndarray):
        """Clear alive flags (gs_external.prune_gaussians analog)."""
        self.alive &= ~np.asarray(mask_remove, bool)

    def alive_device(self):
        return jnp.asarray(self.alive)
