"""Gradient clipping pass-through (reference:
droid_slam/modules/clipping.py — identity forward, backward zeroes gradient
entries with |g| > 0.01 or NaN)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRAD_CLIP = 0.01


@jax.custom_vjp
def grad_clip(x: jnp.ndarray) -> jnp.ndarray:
    return x


def _fwd(x):
    return x, None


def _bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    g = jnp.where(jnp.abs(g) > GRAD_CLIP, 0.0, g)
    return (g,)


grad_clip.defvjp(_fwd, _bwd)
