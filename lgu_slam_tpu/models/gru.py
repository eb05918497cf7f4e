"""ConvGRU update cells.

- :class:`KanBiasConvGRU` — ConvGRU whose z/r/q gates receive a per-channel
  global bias produced by KAN spline layers from gated global pooling
  (reference: droid_slam/modules/gru_kanBias.py:5-37).
- :class:`ConvGRU` — vanilla DROID ConvGRU with conv global bias
  (reference: to3DGS/modules/gru.py:5-40), kept for the reconstruction
  replay path of the 3DGS stage.

NHWC layout; hidden state 128 channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgu_slam_tpu.models.kan import KANLinear


class KanBiasConvGRU(nn.Module):
    h_planes: int = 128
    i_planes: int = 320
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 on TPU)

    @nn.compact
    def __call__(self, net, *inputs):
        """net [B,H,W,128]; inputs concatenated along channels."""
        inp = jnp.concatenate(inputs, axis=-1)
        net_inp = jnp.concatenate([net, inp], axis=-1)
        c = self.h_planes
        dt = self.dtype

        # gated global pooling (gru_kanBias.py:25-26)
        gate = nn.sigmoid(nn.Conv(c, (1, 1), name="w", dtype=dt)(net))
        # the pooled KAN path is tiny [B, C]: keep it fp32 (spline bases
        # are sensitive to input precision)
        glo = jnp.mean(
            (gate * net).astype(jnp.float32), axis=(1, 2)
        )  # [B, C]

        kz = KANLinear(c, c, grid_size=3, name="kanz_glo")(glo)[:, None, None, :]
        kr = KANLinear(c, c, grid_size=3, name="kanr_glo")(glo)[:, None, None, :]
        kq = KANLinear(c, c, grid_size=3, name="kanq_glo")(glo)[:, None, None, :]

        z = nn.sigmoid(nn.Conv(c, (3, 3), padding=1, name="convz",
                               dtype=dt)(net_inp) + kz)
        r = nn.sigmoid(nn.Conv(c, (3, 3), padding=1, name="convr",
                               dtype=dt)(net_inp) + kr)
        q = nn.tanh(
            nn.Conv(c, (3, 3), padding=1, name="convq", dtype=dt)(
                jnp.concatenate([r * net.astype(r.dtype), inp], axis=-1)
            )
            + kq
        )
        return (1.0 - z) * net + z * q


class ConvGRU(nn.Module):
    """Vanilla DROID ConvGRU with 3x3-conv global context bias
    (to3DGS/modules/gru.py:5-40)."""

    h_planes: int = 128
    i_planes: int = 320

    @nn.compact
    def __call__(self, net, *inputs):
        inp = jnp.concatenate(inputs, axis=-1)
        net_inp = jnp.concatenate([net, inp], axis=-1)
        c = self.h_planes

        glo = jnp.mean(net, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        z_g = nn.Conv(c, (1, 1), name="convz_glo")(glo)
        r_g = nn.Conv(c, (1, 1), name="convr_glo")(glo)
        q_g = nn.Conv(c, (1, 1), name="convq_glo")(glo)

        z = nn.sigmoid(nn.Conv(c, (3, 3), padding=1, name="convz")(net_inp) + z_g)
        r = nn.sigmoid(nn.Conv(c, (3, 3), padding=1, name="convr")(net_inp) + r_g)
        q = nn.tanh(
            nn.Conv(c, (3, 3), padding=1, name="convq")(
                jnp.concatenate([r * net, inp], axis=-1)
            )
            + q_g
        )
        return (1.0 - z) * net + z * q
