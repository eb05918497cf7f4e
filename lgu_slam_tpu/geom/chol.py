"""Damped Cholesky / Schur solvers (reference: droid_slam/geom/chol.py).

TPU-first redesign notes:
- the reference wraps torch.linalg.cholesky in a try/except that silently
  returns zeros on failure (chol.py:8-19).  Under jit there is no exception
  path, so we detect failure by checking the factor for NaNs and zero the
  solution — the same "don't crash training" semantics, branch-free.
- solves run in fp32 on device; the damping (ep + lm*diag) keeps the GN
  systems well-conditioned (reference uses ep=0.1, lm=1e-4; chol.py:32-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def _safe_cho_solve(H: jnp.ndarray, b: jnp.ndarray):
    """Cholesky solve with zero-on-failure semantics.

    H: [..., D, D] SPD (after damping); b: [..., D, K].
    Returns x with x == 0 wherever the factorization produced non-finite
    values (mirrors CholeskySolver's failure fallback, chol.py:13-18).
    """
    L = jsl.cholesky(H, lower=True)
    ok = jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
    L_safe = jnp.where(ok, L, jnp.broadcast_to(jnp.eye(H.shape[-1], dtype=H.dtype), L.shape))
    x = jsl.cho_solve((L_safe, True), b)
    return jnp.where(ok, x, jnp.zeros_like(x))


def block_solve(
    H: jnp.ndarray, b: jnp.ndarray, ep: float = 0.1, lm: float = 1e-4
) -> jnp.ndarray:
    """Solve the block normal equations (chol.py:32-43).

    H: [B, N, N, D, D] pose-block Hessian; b: [B, N, D].
    Returns dx: [B, N, D].
    """
    B, N, _, D, _ = H.shape
    I = jnp.eye(D, dtype=H.dtype)
    H = H + (ep + lm * H) * I
    H = H.transpose(0, 1, 3, 2, 4).reshape(B, N * D, N * D)
    b = b.reshape(B, N * D, 1)
    x = _safe_cho_solve(H, b)
    return x.reshape(B, N, D)


def schur_solve(
    H: jnp.ndarray,
    E: jnp.ndarray,
    C: jnp.ndarray,
    v: jnp.ndarray,
    w: jnp.ndarray,
    ep: float = 0.1,
    lm: float = 1e-4,
):
    """Schur-complement solve of the pose/depth system (chol.py:46-73).

    H: [B, P, P, D, D], E: [B, P, M, D, HW], C: [B, M, HW] (depth diag),
    v: [B, P, D], w: [B, M, HW].
    Returns (dx [B, P, D], dz [B, M, HW]).
    """
    B, P, M, D, HW = E.shape
    H = H.transpose(0, 1, 3, 2, 4).reshape(B, P * D, P * D)
    E = E.transpose(0, 1, 3, 2, 4).reshape(B, P * D, M * HW)
    Q = (1.0 / C).reshape(B, M * HW, 1)

    I = jnp.eye(P * D, dtype=H.dtype)
    H = H + (ep + lm * H) * I

    v = v.reshape(B, P * D, 1)
    w = w.reshape(B, M * HW, 1)

    Et = E.transpose(0, 2, 1)
    S = H - jnp.matmul(E, Q * Et)
    rhs = v - jnp.matmul(E, Q * w)

    dx = _safe_cho_solve(S, rhs)
    dz = Q * (w - jnp.matmul(Et, dx))
    return dx.reshape(B, P, D), dz.reshape(B, M, HW)
