"""Pinhole projective geometry with analytic Jacobians.

Functional re-design of /root/reference/droid_slam/geom/projective_ops.py
(iproj :18-37, proj :39-66, actp :68-96, projective_transform :98-128,
induced_flow :130-141) for JAX: everything is shape-static, vmap/jit
friendly, and the Jacobians use the (v, w) translation-first twist layout
of :mod:`lgu_slam_tpu.lie`.

Shapes (edge-batched): poses ``[N, 7]`` over frames, ``ii/jj [E]`` edge
index vectors, disps ``[N, H, W]`` inverse depth at 1/8 resolution,
intrinsics ``[N, 4]`` = (fx, fy, cx, cy).
"""

from __future__ import annotations

import jax.numpy as jnp

from lgu_slam_tpu.lie import se3_act4, se3_adjT_apply, se3_rel

MIN_DEPTH = 0.2

# fixed stereo baseline used for ii == jj (stereo) edges
# (projective_ops.py:108 and droid_kernels.cu:219-228)
STEREO_TIJ = (-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel coordinate grid [H, W, 2] = (x, y)."""
    y, x = jnp.meshgrid(
        jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij"
    )
    return jnp.stack([x, y], axis=-1)


def iproj(disps: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Inverse projection to homogeneous-depth points (X, Y, 1, d).

    disps: [..., H, W]; intrinsics: [..., 4] broadcast over pixels.
    Returns pts [..., H, W, 4].  dpts/dd = (0, 0, 0, 1), handled in closed
    form by callers.
    """
    ht, wd = disps.shape[-2], disps.shape[-1]
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    fx, fy, cx, cy = jnp.split(intrinsics[..., None, None, :], 4, axis=-1)
    X = (grid[..., 0:1] - cx) / fx
    Y = (grid[..., 1:2] - cy) / fy
    ones = jnp.ones_like(disps[..., None])
    return jnp.concatenate([X, Y, ones, disps[..., None]], axis=-1)


def proj(
    Xs: jnp.ndarray,
    intrinsics: jnp.ndarray,
    jacobian: bool = False,
    return_depth: bool = False,
):
    """Pinhole projection of homogeneous-depth points.

    Xs: [..., H, W, 4]; returns coords [..., H, W, 2] (or 3 with depth) and
    optionally the 2x4 projection Jacobian (projective_ops.py:55-64).
    """
    fx, fy, cx, cy = jnp.split(intrinsics[..., None, None, :], 4, axis=-1)
    X, Y, Z, D = (Xs[..., i : i + 1] for i in range(4))
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * X * d + cx
    y = fy * Y * d + cy
    if return_depth:
        coords = jnp.concatenate([x, y, D * d], axis=-1)
    else:
        coords = jnp.concatenate([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [
            jnp.concatenate([fx * d, o, -fx * X * d * d, o], axis=-1),
            jnp.concatenate([o, fy * d, -fy * Y * d * d, o], axis=-1),
        ],
        axis=-2,
    )  # [..., H, W, 2, 4]
    return coords, Jp


def _act_jacobian(X1: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of the SE(3) action wrt a left-multiplied twist on g_ij,
    evaluated at the transformed point X1 = (X, Y, Z, d): [..., 4, 6].

    Columns: (vx, vy, vz, wx, wy, wz) — projective_ops.py:79-84.
    """
    X, Y, Z, d = (X1[..., i : i + 1] for i in range(4))
    o = jnp.zeros_like(d)
    r0 = jnp.concatenate([d, o, o, o, Z, -Y], axis=-1)
    r1 = jnp.concatenate([o, d, o, -Z, o, X], axis=-1)
    r2 = jnp.concatenate([o, o, d, Y, -X, o], axis=-1)
    r3 = jnp.concatenate([o, o, o, o, o, o], axis=-1)
    return jnp.stack([r0, r1, r2, r3], axis=-2)


def projective_transform(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    jacobian: bool = False,
    return_depth: bool = False,
):
    """Map pixels of frames ii into frames jj.

    poses [N, 7] (world-to-camera, as in the reference state), disps
    [N, H, W], intrinsics [N, 4].  Stereo edges (ii == jj) use the fixed
    baseline transform STEREO_TIJ (projective_ops.py:108).

    Returns (coords [E, H, W, 2(|3)], valid [E, H, W, 1]) and, when
    ``jacobian``, the tuple (Ji, Jj, Jz) with shapes
    ([E, H, W, 2, 6], [E, H, W, 2, 6], [E, H, W, 2, 1]).
    """
    X0 = iproj(disps[ii], intrinsics[ii])  # [E, H, W, 4]

    Gij = se3_rel(poses[ii], poses[jj])  # [E, 7]
    stereo = (ii == jj)[:, None]
    Gij = jnp.where(stereo, jnp.asarray(STEREO_TIJ, dtype=Gij.dtype), Gij)

    X1 = se3_act4(Gij[:, None, None, :], X0)  # [E, H, W, 4]
    x1, Jp = proj(X1, intrinsics[jj], jacobian=jacobian, return_depth=return_depth)

    valid = (
        (X1[..., 2:3] > MIN_DEPTH) & (X0[..., 2:3] > MIN_DEPTH)
    ).astype(disps.dtype)

    if not jacobian:
        return x1, valid

    Ja = _act_jacobian(X1)  # [E, H, W, 4, 6]
    Jj = jnp.einsum("...ij,...jk->...ik", Jp, Ja)  # [E, H, W, 2, 6]
    Ji = -se3_adjT_apply(Gij[:, None, None, None, :], Jj)

    # depth Jacobian: dX1/dd = g_ij acting on (0,0,0,1) = (t_ij, 1)
    tij = Gij[..., :3]
    Jz_dir = jnp.concatenate([tij, jnp.ones_like(tij[..., :1])], axis=-1)
    Jz = jnp.einsum(
        "...ij,...j->...i", Jp, Jz_dir[:, None, None, :]
    )[..., None]  # [E, H, W, 2, 1]

    return x1, valid, (Ji, Jj, Jz)


def induced_flow(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
):
    """Optical flow induced by camera motion (projective_ops.py:130-141)."""
    ht, wd = disps.shape[-2], disps.shape[-1]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
