"""RAFT-style feature/context encoders (reference:
droid_slam/modules/extractor.py:6-198).

TPU notes: NHWC layout throughout; instance norm is the affine-free
per-sample-per-channel normalization matching torch's
``nn.InstanceNorm2d(affine=False)``; batch-norm mode is intentionally
implemented as its inference form only (the reference never trains with
it — fnet uses 'instance', cnet uses 'none').
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

DIM = 32


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free instance normalization over spatial dims (NHWC)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _norm(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "instance":
        return instance_norm(x)
    if kind == "none":
        return x
    if kind == "group":
        # GroupNorm with C//8 groups (extractor.py:14-18); affine handled by
        # the following conv bias in practice — keep affine-free like the
        # instance path for simplicity (reference training uses 'instance').
        b, h, w, c = x.shape
        g = max(1, c // 8)
        xg = x.reshape(b, h, w, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        return ((xg - mean) / jnp.sqrt(var + eps_default)).reshape(b, h, w, c)
    raise ValueError(kind)


eps_default = 1e-5


class ResidualBlock(nn.Module):
    """Two 3x3 convs with norm + identity/downsample skip
    (extractor.py:6-55).  ``dtype`` sets the conv compute dtype (bf16 on
    the TPU inference path); normalization statistics stay fp32."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    name="conv1", dtype=self.dtype)(x)
        y = nn.relu(_norm(y.astype(jnp.float32), self.norm_fn))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.relu(_norm(y.astype(jnp.float32), self.norm_fn))

        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        name="downsample", dtype=self.dtype)(x)
            x = _norm(x.astype(jnp.float32), self.norm_fn)
        return nn.relu(x.astype(jnp.float32) + y)


class BasicEncoder(nn.Module):
    """7x7 stem (stride 2) + 3 residual stages -> 1/8 resolution features
    (extractor.py:118-198).

    Input [B, H, W, 3] normalized RGB; output [B, H/8, W/8, output_dim].
    """

    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.relu(_norm(x.astype(jnp.float32), self.norm_fn))

        for stage, (dim, stride) in enumerate(
            [(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)]
        ):
            x = ResidualBlock(dim, self.norm_fn, stride, dtype=self.dtype,
                              name=f"layer{stage + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, dtype=self.dtype,
                              name=f"layer{stage + 1}_1")(x)

        return nn.Conv(self.output_dim, (1, 1), name="conv2",
                       dtype=self.dtype)(x).astype(jnp.float32)
