"""Learnable 2-D Gaussian uncertainty mask over the correlation volume
(reference: droid_slam/gaussianMask_cuda.py:35-88 + the CUDA window kernel
offersample_LGS/gaussianAttn.cu).

From the concatenated feature pair (256ch) a small MLP predicts a per-pixel
mean offset and diagonal covariance; the correlation volume is re-weighted
by a windowed Gaussian bump centred at (pixel + mean offset) and combined
as ``corr + masked/(2*pi*sqrt(det))``.

TPU redesign: the window op is a dense fused elementwise expression
(ops.sampler.gaussian_window_mask) so XLA fuses it into the volume
computation and autodiff reproduces the hand-written CUDA gradients.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgu_slam_tpu.ops.sampler import gaussian_window_mask

TWO_PI = 6.28  # the reference uses the literal 6.28 (gaussianMask_cuda.py:85)


def _map_normalize(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Whole-map normalization per batch element
    (gaussianMask_cuda.py:26-33: mean/var over dims [1, 2] of [B, HW, 2])."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True) + eps
    return (x - mean) / jnp.sqrt(var)


class GaussianMask(nn.Module):
    """Predict (mean, cov) and re-weight the correlation volume.

    radius 4 window (gaussianMask_cuda.py:84).
    """

    radius: int = 4

    @nn.compact
    def predict(self, x: jnp.ndarray):
        """x: [B, H, W, 256] -> (mean [B,H,W,2], cov [B,H,W,2],
        det [B,H,W]) — the learned per-pixel Gaussian parameters."""
        b, h, w, _ = x.shape

        tt = jnp.tanh(nn.Dense(16, name="map")(x))
        mean_ofs = nn.Dense(
            2, kernel_init=nn.initializers.zeros, name="meanMap"
        )(tt)

        c = nn.Dense(2, name="covMap")(tt).reshape(b, h * w, 2)
        c = _map_normalize(c)
        c = nn.sigmoid(c) * 5.0 + 0.05
        det = (c[..., 0] * c[..., 1]).reshape(b, h, w)
        cov = c.reshape(b, h, w, 2)

        # mean = pixel coordinate + learned offset (gaussianMask_cuda.py:81-83)
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=x.dtype), jnp.arange(w, dtype=x.dtype),
            indexing="ij",
        )
        coord = jnp.stack([xs, ys], axis=-1)
        mean = coord[None] + mean_ofs
        return mean, cov, det

    def __call__(self, x: jnp.ndarray, corr: jnp.ndarray):
        """x: [B, H, W, 256] concatenated fmap pair; corr: [B, H, W, H2, W2].

        Returns (masked corr [B,H,W,H2,W2], mean [B,H,W,2], det [B,H,W]).
        """
        mean, cov, det = self.predict(x)
        masked = gaussian_window_mask(
            corr.astype(jnp.float32), mean, cov, self.radius
        )
        b, h, w = det.shape
        denom = TWO_PI * jnp.sqrt(det).reshape(b, h, w, 1, 1)
        out = masked / denom + corr
        return out, mean, det
