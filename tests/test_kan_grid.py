"""KAN grid-update utilities (reference kan.py:113-215): curve2coeff must
reproduce a NumPy least-squares oracle, and update_grid must keep the
learned spline curve (scaled-weight forward output) invariant on the data
it was refit to."""

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.models.kan import (
    bspline_bases,
    curve2coeff,
    update_grid,
)

G, K, I, O = 5, 3, 4, 3


def _uniform_grid(grid_range=(-1.0, 1.0)):
    h = (grid_range[1] - grid_range[0]) / G
    g = np.arange(-K, G + K + 1) * h + grid_range[0]
    return jnp.asarray(np.tile(g, (I, 1)).astype(np.float32))


def test_curve2coeff_matches_numpy_lstsq(rng):
    grid = _uniform_grid()
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, I)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(64, I, O)), jnp.float32)
    coeff = np.asarray(curve2coeff(x, y, grid, K))

    A = np.asarray(bspline_bases(x, grid, K))  # [B, I, G+K]
    for i in range(I):
        sol, *_ = np.linalg.lstsq(A[:, i], np.asarray(y)[:, i], rcond=None)
        np.testing.assert_allclose(coeff[i], sol, atol=5e-3)


def test_update_grid_preserves_curve(rng):
    grid = _uniform_grid()
    x = jnp.asarray(rng.uniform(-0.8, 0.8, size=(128, I)), jnp.float32)
    spline_w = jnp.asarray(rng.normal(size=(I, G + K, O)) * 0.3, jnp.float32)
    scaler = jnp.asarray(1.0 + 0.1 * rng.normal(size=(I, O)), jnp.float32)

    before = jnp.einsum(
        "big,igo->bio", bspline_bases(x, grid, K),
        spline_w * scaler[:, None, :],
    )
    new_grid, new_w = update_grid(x, grid, spline_w, scaler, G, K)
    assert new_grid.shape == grid.shape
    assert new_w.shape == spline_w.shape
    after = jnp.einsum(
        "big,igo->bio", bspline_bases(x, new_grid, K),
        new_w * scaler[:, None, :],
    )
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               atol=2e-2)


def test_update_grid_adapts_to_distribution(rng):
    """A skewed input distribution must pull grid knots toward its mass."""
    grid = _uniform_grid()
    x = jnp.asarray(np.clip(rng.normal(0.5, 0.1, size=(256, I)), -1, 1),
                    jnp.float32)
    spline_w = jnp.zeros((I, G + K, O), jnp.float32)
    scaler = jnp.ones((I, O), jnp.float32)
    new_grid, _ = update_grid(x, grid, spline_w, scaler, G, K)
    core = np.asarray(new_grid)[:, K:-K]  # interior knots
    assert core.mean() > 0.2  # moved toward the 0.5-centered data
