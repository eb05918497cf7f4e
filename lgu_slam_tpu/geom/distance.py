"""Frame distance metric (reference: src/droid_kernels.cu:518-657
``frame_distance_kernel`` + depth_video.py:150-180 ``DepthVideo.distance``).

The distance between frames (i, j) is a beta-blend of the mean induced-flow
magnitude under (a) the full relative SE(3) transform and (b) a
translation-only transform, with pixels behind the camera excluded; if
fewer than 75% of (weighted) pixels are valid the distance saturates to
1000.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lgu_slam_tpu.geom.projective import MIN_DEPTH, coords_grid, iproj
from lgu_slam_tpu.lie import se3_act4, se3_rel


def _flow_magnitude(disps_i, intr, Gij, translation_only: bool):
    """Mean flow magnitude for one direction; returns (accum, valid, total)
    per edge, matching the kernel accumulators (:561-637)."""
    E, ht, wd = disps_i.shape
    X = iproj(disps_i, intr)  # [E, H, W, 4]
    if translation_only:
        tij = Gij[..., :3]
        Xj3 = X[..., :3] + X[..., 3:4] * tij[:, None, None, :]
    else:
        Xj3 = se3_act4(Gij[:, None, None, :], X)[..., :3]

    fx, fy, cx, cy = jnp.split(intr[..., None, None, :], 4, axis=-1)
    grid = coords_grid(ht, wd)
    z = Xj3[..., 2:3]
    zsafe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx[..., 0] * Xj3[..., 0] / zsafe[..., 0] + cx[..., 0]
    v = fy[..., 0] * Xj3[..., 1] / zsafe[..., 0] + cy[..., 0]
    d = jnp.sqrt((u - grid[..., 0]) ** 2 + (v - grid[..., 1]) ** 2)

    ok = (z[..., 0] > MIN_DEPTH).astype(d.dtype)
    accum = jnp.sum(ok * d, axis=(1, 2))
    valid = jnp.sum(ok, axis=(1, 2))
    total = jnp.full((E,), float(ht * wd), d.dtype)
    return accum, valid, total


@partial(jax.jit, static_argnames=())
def frame_distance(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    beta: float = 0.3,
) -> jnp.ndarray:
    """One-directional distance d(ii -> jj); poses [N,7], disps [N,h,w],
    intrinsics [4] shared.  Returns [E]."""
    intr = jnp.broadcast_to(intrinsics, (ii.shape[0], 4))
    Gij = se3_rel(poses[ii], poses[jj])
    disps_i = disps[ii]

    a1, v1, t1 = _flow_magnitude(disps_i, intr, Gij, translation_only=False)
    a2, v2, t2 = _flow_magnitude(disps_i, intr, Gij, translation_only=True)

    accum = beta * a1 + (1.0 - beta) * a2
    valid = beta * v1 + (1.0 - beta) * v2
    total = beta * t1 + (1.0 - beta) * t2

    frac = valid / (total + 1e-8)
    return jnp.where(frac < 0.75, 1000.0, accum / jnp.maximum(valid, 1e-8))


def frame_distance_bidirectional(
    poses, disps, intrinsics, ii, jj, beta: float = 0.3
) -> jnp.ndarray:
    """0.5 * (d(i->j) + d(j->i)) (depth_video.py:161-171)."""
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)
