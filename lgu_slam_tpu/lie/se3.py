"""SE(3) / SO(3) quaternion ops in pure JAX.

Conventions
-----------
- quaternion layout (x, y, z, w), Hamilton product, unit norm.
- SE(3) element ``g = [t(3), q(4)]`` acts on points as ``x' = R(q) x + t``.
- tangent vector ``xi = [v(3), w(3)]`` (translation first), matching the
  Jacobian column layout of the reference DBA kernels
  (/root/reference/src/droid_kernels.cu:312-318 — columns 0-2 translation,
  3-5 rotation) and lietorch's SE3 convention.
- retraction is *left*-multiplicative: ``retr(g, xi) = exp(xi) * g``
  (droid_kernels.cu:877-895 ``retrSE3``).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, layout (x, y, z, w)."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by unit quaternion q: R(q) v.

    Uses the expanded form (no matrix materialization) so it fuses cleanly.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    # v' = v + 2 qw (qv × v) + 2 qv × (qv × v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def so3_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from unit quaternion; shape [..., 3, 3]."""
    x, y, z, w = jnp.split(q, 4, axis=-1)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.concatenate([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.concatenate([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.concatenate([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ---------------------------------------------------------------------------
# SO(3) exp / log with small-angle series
# ---------------------------------------------------------------------------

def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector [..., 3] -> unit quaternion [..., 4]."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    half = 0.5 * theta
    small = theta_sq < 1e-8
    # sin(t/2)/t, cos(t/2)
    s = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    c = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([s * w, c], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Log map: unit quaternion -> rotation vector [..., 3]."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # force w >= 0 (shortest geodesic)
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    nv = jnp.sqrt(jnp.maximum(nv_sq, 1e-24))
    # angle = 2 atan2(|qv|, qw); factor = angle / |qv|
    angle = 2.0 * jnp.arctan2(nv, qw)
    small = nv_sq < 1e-8
    factor = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), angle / nv)
    return factor * qv


def _so3_left_jacobian_terms(w: jnp.ndarray):
    """Coefficients (A, B) of V = I + A [w]x + B [w]x^2 (left Jacobian of SO3)."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < 1e-8
    A = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    B = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta)
    )
    return A, B


def _apply_V(w: jnp.ndarray, v: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Apply the SO(3) left Jacobian V(w) (or its inverse) to v."""
    A, B = _so3_left_jacobian_terms(w)
    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    if not inverse:
        return v + A * wxv + B * wxwxv
    # V^{-1} = I - 1/2 [w]x + C [w]x^2,  C = (1 - A/(2B')) / theta^2 form
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < 1e-8
    half = 0.5 * theta
    cot = jnp.where(small, 1.0, half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-20))
    C = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - cot) / jnp.maximum(theta_sq, 1e-24))
    return v - 0.5 * wxv + C * wxwxv


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return g.at[..., 6].set(1.0)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """exp: twist [..., 6] (v, w) -> SE(3) element [..., 7]."""
    v, w = xi[..., :3], xi[..., 3:6]
    q = so3_exp(w)
    t = _apply_V(w, v)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g: jnp.ndarray) -> jnp.ndarray:
    """log: SE(3) element -> twist [..., 6] (v, w)."""
    t, q = g[..., :3], g[..., 3:7]
    w = so3_log(q)
    v = _apply_V(w, t, inverse=True)
    return jnp.concatenate([v, w], axis=-1)


def se3_inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_conj(q)
    ti = -quat_rotate(qi, t)
    return jnp.concatenate([ti, qi], axis=-1)


def se3_mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    """Group composition g1 * g2 (apply g2 first)."""
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    q = quat_mul(q1, q2)
    t = quat_rotate(q1, t2) + t1
    return jnp.concatenate([t, q], axis=-1)


def se3_rel(gi: jnp.ndarray, gj: jnp.ndarray) -> jnp.ndarray:
    """Relative transform g_ij = g_j * g_i^{-1} (maps frame-i coords to frame-j)."""
    return se3_mul(gj, se3_inv(gi))


def se3_act(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Act on 3-D points: x' = R x + t."""
    t, q = g[..., :3], g[..., 3:7]
    return quat_rotate(q, x) + t


def se3_act4(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Act on homogeneous-depth points (X, Y, Z, D): (R X[:3] + D t, D).

    Mirrors ``actSE3`` in droid_kernels.cu — the 4th component is the
    inverse depth carried through unchanged.
    """
    t, q = g[..., :3], g[..., 3:7]
    p = quat_rotate(q, X[..., :3]) + X[..., 3:4] * t
    return jnp.concatenate([p, X[..., 3:4]], axis=-1)


def se3_adjT_apply(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply the transpose of the adjoint: y = Ad_g^T x, for twists x=[a, b].

    With Ad_g = [[R, [t]x R], [0, R]] acting on (v, w)-ordered twists,
    Ad_g^T [a; b] = [R^T a ; R^T ([t]x^T a + b)] = [R^T a; R^T (b - t × a)].

    This is the operation used to map the pose-j Jacobian to the pose-i
    Jacobian: Ji = -Ad_{g_ij}^T Jj (projective_ops.py:120-121 and
    droid_kernels.cu adjSE3 usage at :325-326).
    """
    t, q = g[..., :3], g[..., 3:7]
    a, b = x[..., :3], x[..., 3:6]
    qi = quat_conj(q)
    ya = quat_rotate(qi, a)
    yb = quat_rotate(qi, b - jnp.cross(t, a))
    return jnp.concatenate([ya, yb], axis=-1)


def se3_retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: exp(xi) * g (droid_kernels retrSE3)."""
    return se3_mul(se3_exp(xi), g)


def se3_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix."""
    t, q = g[..., :3], g[..., 3:7]
    R = so3_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), t.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`se3_matrix` (batched, numerically safe)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate extractions; pick the best-conditioned per element
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
    qx = 0.5 * jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12))
    qy = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12))
    qz = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12))
    qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    q = quat_normalize(jnp.stack([qx, qy, qz, qw], axis=-1))
    return jnp.concatenate([t, q], axis=-1)
