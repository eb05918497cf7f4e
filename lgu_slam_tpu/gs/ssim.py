"""SSIM for the mapping loss (reference: to3DGS/utils/slam_external.py
``calc_ssim`` — 11x11 Gaussian window, C1/C2 for [0,1] images)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


_WIN = _gaussian_window()


def _filter(x, win):
    """Depthwise 11x11 filter on [H, W, C] with same padding."""
    import jax

    k = win[:, :, None, None]
    x = x.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    y = jax.lax.conv_general_dilated(
        x, jnp.broadcast_to(k[:, :, 0, 0][None, None], (1, 1, 11, 11)),
        (1, 1), "SAME",
    )
    return y[:, 0].transpose(1, 2, 0)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C] in [0, 1].  Returns mean SSIM scalar."""
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    mu1 = _filter(img1, _WIN)
    mu2 = _filter(img2, _WIN)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    s1 = _filter(img1 * img1, _WIN) - mu1_sq
    s2 = _filter(img2 * img2, _WIN) - mu2_sq
    s12 = _filter(img1 * img2, _WIN) - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return jnp.mean(m)
