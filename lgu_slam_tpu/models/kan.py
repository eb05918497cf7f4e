"""Kolmogorov–Arnold (B-spline) linear layer (reference:
droid_slam/modules/kan.py:6-238, "efficient-KAN" style).

Output = base_weight @ silu(x) + spline_weight' @ B(x), where B(x) are
Cox–de-Boor B-spline bases over a fixed per-feature grid.  The grid is a
non-trainable constant here (the reference's ``update_grid`` is an offline
utility it never invokes during SLAM training).

The basis recursion is a short static unroll (spline_order iterations) of
pure elementwise ops — XLA fuses it; the two matmuls land on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def bspline_bases(
    x: jnp.ndarray, grid: jnp.ndarray, spline_order: int
) -> jnp.ndarray:
    """Cox–de-Boor bases (kan.py:78-111).

    x: [B, I]; grid: [I, G + 2*order + 1].
    Returns [B, I, G + order].
    """
    x = x[..., None]  # [B, I, 1]
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1 :] - x) / (grid[:, k + 1 :] - grid[:, 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


class KANLinear(nn.Module):
    """Spline + base linear layer (kan.py:153-166).

    in/out: [..., in_features] -> [..., out_features].
    """

    in_features: int
    out_features: int
    grid_size: int = 3
    spline_order: int = 3
    grid_range: tuple = (-1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        I, O = self.in_features, self.out_features
        G, K = self.grid_size, self.spline_order

        h = (self.grid_range[1] - self.grid_range[0]) / G
        grid = jnp.asarray(
            np.tile(
                np.arange(-K, G + K + 1) * h + self.grid_range[0], (I, 1)
            ).astype(np.float32)
        )

        base_w = self.param(
            "base_weight", nn.initializers.lecun_normal(), (I, O)
        )
        spline_w = self.param(
            "spline_weight",
            nn.initializers.normal(0.02),
            (I, G + K, O),
        )
        spline_scale = self.param(
            "spline_scaler", nn.initializers.lecun_normal(), (I, O)
        )

        shape = x.shape
        x2 = x.reshape(-1, I)
        base_out = nn.silu(x2) @ base_w
        bases = bspline_bases(x2, grid, K)  # [B, I, G+K]
        scaled_spline = spline_w * spline_scale[:, None, :]  # [I, G+K, O]
        spline_out = jnp.einsum("big,igo->bo", bases, scaled_spline)
        out = base_out + spline_out
        return out.reshape(shape[:-1] + (O,))


def curve2coeff(x: jnp.ndarray, y: jnp.ndarray, grid: jnp.ndarray,
                spline_order: int) -> jnp.ndarray:
    """Least-squares spline coefficients interpolating y(x)
    (kan.py:113-143 ``curve2coeff``).

    x: [B, I]; y: [B, I, O]; grid: [I, G + 2*order + 1].
    Returns [I, G + order, O] (this package's spline-weight layout).
    """
    A = bspline_bases(x, grid, spline_order)  # [B, I, G+K]
    A = jnp.transpose(A, (1, 0, 2))  # [I, B, G+K]
    B = jnp.transpose(y, (1, 0, 2))  # [I, B, O]
    # batched least squares via normal equations with a small ridge —
    # XLA has no batched lstsq; G+K is tiny (≤ 6) so this is exact enough
    AtA = jnp.einsum("ibk,ibl->ikl", A, A)
    AtB = jnp.einsum("ibk,ibo->iko", A, B)
    ridge = 1e-8 * jnp.eye(A.shape[-1], dtype=A.dtype)
    return jnp.linalg.solve(AtA + ridge, AtB)  # [I, G+K, O]


def update_grid(x: jnp.ndarray, grid: jnp.ndarray, spline_weight: jnp.ndarray,
                spline_scaler: jnp.ndarray, grid_size: int, spline_order: int,
                margin: float = 0.01, grid_eps: float = 0.02):
    """Refit the per-feature grid to the data distribution of x and refit
    the spline weights to preserve the learned curve (kan.py:168-215
    ``update_grid``).  Offline utility — pure function returning
    (new_grid [I, G+2K+1], new_spline_weight [I, G+K, O]).
    """
    B, I = x.shape
    G, K = grid_size, spline_order

    bases = bspline_bases(x, grid, K)  # [B, I, G+K]
    scaled = spline_weight * spline_scaler[:, None, :]  # [I, G+K, O]
    y = jnp.einsum("big,igo->bio", bases, scaled)  # [B, I, O]

    x_sorted = jnp.sort(x, axis=0)
    idx = jnp.linspace(0, B - 1, G + 1).astype(jnp.int32)
    grid_adaptive = x_sorted[idx]  # [G+1, I]
    step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / G
    grid_uniform = (
        jnp.arange(G + 1, dtype=x.dtype)[:, None] * step
        + x_sorted[0] - margin
    )
    core = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    below = core[:1] - step * jnp.arange(K, 0, -1, dtype=x.dtype)[:, None]
    above = core[-1:] + step * jnp.arange(1, K + 1, dtype=x.dtype)[:, None]
    new_grid = jnp.concatenate([below, core, above], 0).T  # [I, G+2K+1]

    new_spline_weight = curve2coeff(x, y, new_grid, K)
    # the scaler multiplies the stored weight on the forward pass; divide
    # it back out so scaled weights reproduce the refit curve
    new_spline_weight = new_spline_weight / jnp.where(
        jnp.abs(spline_scaler[:, None, :]) < 1e-12, 1.0,
        spline_scaler[:, None, :],
    )
    return new_grid, new_spline_weight


def kan_regularization_loss(spline_weight, regularize_activation=1.0,
                            regularize_entropy=1.0):
    """L1 + entropy regularizer on the spline weights (kan.py:217-237);
    spline_weight: [I, G+K, O] (this package's layout)."""
    l1 = jnp.mean(jnp.abs(spline_weight), axis=1)  # [I, O]
    act = jnp.sum(l1)
    p = l1 / jnp.maximum(act, 1e-12)
    ent = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)))
    return regularize_activation * act + regularize_entropy * ent
