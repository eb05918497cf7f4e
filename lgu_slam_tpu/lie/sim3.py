"""Sim(3) ops (scale-augmented SE(3)) — used by training losses and eval
alignment (reference: lietorch Sim3 as used in geom/losses.py:57-64).

Layout: ``[..., 8]`` = (tx, ty, tz, qx, qy, qz, qw, s); tangent is
``[..., 7]`` = (v, w, sigma) with s = exp(sigma).
Action: x' = s R x + t.
"""

from __future__ import annotations

import jax.numpy as jnp

from lgu_slam_tpu.lie.se3 import (
    quat_conj,
    quat_mul,
    quat_rotate,
    so3_exp,
    so3_log,
)


def sim3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(tuple(shape) + (8,), dtype=dtype)
    g = g.at[..., 6].set(1.0)
    return g.at[..., 7].set(1.0)


def sim3_from_se3(g: jnp.ndarray, s: jnp.ndarray | None = None) -> jnp.ndarray:
    if s is None:
        s = jnp.ones(g.shape[:-1] + (1,), dtype=g.dtype)
    elif s.ndim == g.ndim - 1:
        s = s[..., None]
    return jnp.concatenate([g, jnp.broadcast_to(s, g.shape[:-1] + (1,))], axis=-1)


def sim3_mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    q = quat_mul(q1, q2)
    t = s1 * quat_rotate(q1, t2) + t1
    return jnp.concatenate([t, q, s1 * s2], axis=-1)


def sim3_inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qi = quat_conj(q)
    si = 1.0 / s
    ti = -si * quat_rotate(qi, t)
    return jnp.concatenate([ti, qi, si], axis=-1)


def sim3_act(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    return s * quat_rotate(q, x) + t


def sim3_scale(g: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply the scale component (lietorch ``Sim3.scale`` analog used by
    the scale-fitted geodesic loss, geom/losses.py:45-46)."""
    if s.ndim == g.ndim - 1:
        s = s[..., None]
    return jnp.concatenate([g[..., :7], g[..., 7:8] * s], axis=-1)


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Simplified exp: treats the translation coupling with scale to first
    order via the SE(3) V-matrix (adequate for loss weighting / alignment)."""
    from lgu_slam_tpu.lie.se3 import _apply_V  # noqa: PLC0415

    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(w)
    t = _apply_V(w, v)
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def sim3_log(g: jnp.ndarray) -> jnp.ndarray:
    from lgu_slam_tpu.lie.se3 import _apply_V  # noqa: PLC0415

    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    w = so3_log(q)
    v = _apply_V(w, t, inverse=True)
    return jnp.concatenate([v, w, jnp.log(jnp.maximum(s, 1e-12))], axis=-1)
