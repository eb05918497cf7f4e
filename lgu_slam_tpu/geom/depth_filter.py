"""Multi-view depth consistency filter (reference:
src/droid_kernels.cu:661-775 ``depth_filter_kernel``): for each query frame,
project every pixel into 6 neighbor frames (i-1..i-3, i+3..i+5) and count in
how many the neighbor's stored disparity agrees with the induced disparity
within a threshold.  Used by visualization/export to mask unreliable depth
(visualization.py:102-107, view_reconstruction.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lgu_slam_tpu.geom.projective import coords_grid, iproj
from lgu_slam_tpu.lie import se3_act4, se3_rel

_NEIGHBOR_OFFSETS = (-1, -2, -3, 3, 4, 5)  # droid_kernels.cu:695


@jax.jit
def depth_filter(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    inds: jnp.ndarray,
    thresh: jnp.ndarray,
) -> jnp.ndarray:
    """poses [N,7], disps [N,h,w], intrinsics [4], inds [K] query frames,
    thresh [K] per-frame disparity tolerance.  Returns counts [K, h, w]."""
    N, ht, wd = disps.shape
    intr = jnp.broadcast_to(intrinsics, (inds.shape[0], 4))
    fx, fy, cx, cy = intrinsics

    X = iproj(disps[inds], intr)  # [K, h, w, 4]

    def count_neighbor(off):
        jx = inds + off
        ok_frame = (jx >= 0) & (jx < N)
        jx_safe = jnp.clip(jx, 0, N - 1)
        Gij = se3_rel(poses[inds], poses[jx_safe])
        Xj = se3_act4(Gij[:, None, None, :], X)
        z = Xj[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        uj = fx * Xj[..., 0] / zs + cx
        vj = fy * Xj[..., 1] / zs + cy
        dj = Xj[..., 3] / zs  # induced disparity in frame j

        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
        u0c = jnp.clip(u0, 0, wd - 2)
        v0c = jnp.clip(v0, 0, ht - 2)

        dflat = disps.reshape(N, ht * wd)

        def corner(dv, du):
            idx = (v0c + dv) * wd + (u0c + du)
            vals = jnp.take_along_axis(
                dflat[jx_safe], idx.reshape(idx.shape[0], -1), axis=1
            ).reshape(idx.shape)
            return jnp.abs(1.0 / dj - 1.0 / vals) < thresh[:, None, None]

        agree = corner(0, 0) | corner(0, 1) | corner(1, 0) | corner(1, 1)
        return (
            agree & inb & ok_frame[:, None, None]
        ).astype(jnp.float32)

    counts = sum(count_neighbor(off) for off in _NEIGHBOR_OFFSETS)
    return counts
