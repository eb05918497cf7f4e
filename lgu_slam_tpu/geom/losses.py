"""Training losses (reference: droid_slam/geom/losses.py): geodesic pose
loss with gamma decay and optional scale fit, residual loss, and induced
optical-flow loss with EPE metrics."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom.projective import projective_transform


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm whose gradient is 0 (not NaN) at exactly 0.

    ``jnp.linalg.norm`` backprops 0/0 at the origin; the geodesic loss
    hits the origin *exactly* whenever an estimated relative pose equals
    ground truth (always true at unroll step 1 for edges between the two
    BA-fixed poses), which silently NaN-poisons every gradient."""
    ss = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(ss, 1e-24))


def _adjacent_edges(N: int):
    ii = jnp.asarray(
        [i for i in range(N) for j in (i - 1, i + 1) if 0 <= j < N]
    )
    jj = jnp.asarray(
        [j for i in range(N) for j in (i - 1, i + 1) if 0 <= j < N]
    )
    return ii, jj


def fit_scale(dP: jnp.ndarray, dG: jnp.ndarray) -> jnp.ndarray:
    """Least-squares translation scale (losses.py:21-27)."""
    t1 = dP[..., :3].reshape(dP.shape[0], -1)
    t2 = dG[..., :3].reshape(dG.shape[0], -1)
    return jnp.sum(t1 * t2, -1) / (jnp.sum(t2 * t2, -1) + 1e-8)


def geodesic_loss(Ps, Gs_list, ii, jj, gamma=0.9, do_scale=True):
    """Ps [B,N,7] ground truth; Gs_list: list of [B,N,7] per unroll step
    (losses.py:30-74).  Returns (loss, metrics)."""
    dP = lie.se3_rel(Ps[:, ii], Ps[:, jj])
    n = len(Gs_list)
    total = 0.0
    for i, Gs in enumerate(Gs_list):
        w = gamma ** (n - i - 1)
        dG = lie.se3_rel(Gs[:, ii], Gs[:, jj])
        if do_scale:
            s = fit_scale(dP, dG)
            dG = dG.at[..., :3].multiply(s[:, None, None])
        d = lie.se3_log(lie.se3_mul(dG, lie.se3_inv(dP)))
        tau, phi = d[..., :3], d[..., 3:6]
        total = total + w * (
            jnp.mean(safe_norm(tau)) + jnp.mean(safe_norm(phi))
        )

    dE = lie.se3_mul(dG, lie.se3_inv(dP))
    r_err = (180.0 / jnp.pi) * jnp.linalg.norm(
        lie.so3_log(dE[..., 3:7]), axis=-1
    )
    t_err = jnp.linalg.norm(dE[..., :3], axis=-1)
    metrics = {
        "rot_error": jnp.mean(r_err),
        "tr_error": jnp.mean(t_err),
        "bad_rot": jnp.mean((r_err < 0.1).astype(jnp.float32)),
        "bad_tr": jnp.mean((t_err < 0.01).astype(jnp.float32)),
    }
    return total, metrics


def residual_loss(residuals, gamma=0.9):
    """losses.py:77-86."""
    n = len(residuals)
    total = 0.0
    for i, r in enumerate(residuals):
        total = total + gamma ** (n - i - 1) * jnp.mean(jnp.abs(r))
    return total, {"residual": total}


def flow_loss(Ps, disps, poses_est, disps_est, intrinsics, gamma=0.9):
    """Induced-flow EPE against ground truth over adjacent frames
    (losses.py:89-118).  disps/disps_est full-res [B,N,H,W]; intrinsics
    full-res [B,N,4]."""
    B, N = Ps.shape[:2]
    ii, jj = _adjacent_edges(N)

    def transform(poses, disps_):
        def one(g, d, k):
            return projective_transform(g, d, k, ii, jj)

        return jax.vmap(one)(poses, disps_, intrinsics)

    coords0, val0 = transform(Ps, disps)
    val0 = val0 * (disps[:, ii, :, :, None] > 0).astype(val0.dtype)

    n = len(poses_est)
    total = 0.0
    epe = None
    v = None
    for i in range(n):
        w = gamma ** (n - i - 1)
        coords1, val1 = transform(poses_est[i], disps_est[i])
        v = (val0 * val1)[..., 0]
        epe = v * safe_norm(coords1 - coords0)
        total = total + w * jnp.mean(epe)

    denom = jnp.maximum(jnp.sum(v), 1.0)
    f_error = jnp.sum(epe) / denom
    px1 = jnp.sum((epe < 1.0).astype(jnp.float32) * v) / denom
    return total, {"f_error": f_error, "1px": px1}
