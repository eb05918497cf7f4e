"""Update operator: correlation/flow encoders + KAN-biased ConvGRU +
delta/weight heads + graph aggregation (reference:
droid_slam/droid_net.py:38-136) and convex upsampling (:15-35).

Shapes are edge-batched NHWC: net/inp [B, E, H, W, 128],
corr [B, E, H, W, 196], flow [B, E, H, W, 4].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lgu_slam_tpu.models.clipping import grad_clip
from lgu_slam_tpu.models.gru import KanBiasConvGRU

COR_PLANES = 4 * (2 * 3 + 1) ** 2  # 196


def cvx_upsample(data: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (droid_net.py:15-29).

    data: [B, H, W, D]; mask: [B, H, W, 9*8*8] (softmax over the 9 taps).
    Returns [B, 8H, 8W, D].
    """
    b, h, w, d = data.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax_softmax(mask, axis=3)

    # 3x3 neighborhood patches via shifts (zero padded)
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [
            pad[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B, H, W, 9, D]

    up = jnp.einsum("bhwkyx,bhwkd->bhwyxd", mask, patches)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [B, H, 8, W, 8, D]
    return up.reshape(b, 8 * h, 8 * w, d)


def jax_softmax(x, axis):
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def upsample_disp(disp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """disp [B, H, W] + mask [B, H, W, 576] -> [B, 8H, 8W]."""
    return cvx_upsample(disp[..., None], mask)[..., 0]


class GraphAgg(nn.Module):
    """Edge-to-frame aggregation producing per-frame damping eta and the
    upsampling mask (droid_net.py:38-69).

    Redesign: the reference scatter-means over ``unique(ii)``; here the
    caller provides a static number of *frame slots* and a per-edge slot
    index (host-planned), so the convs run only over frames that actually
    have edges while shapes stay static.
    """

    num_frames: int | None = None  # unused; kept for config symmetry
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 on TPU)

    @nn.compact
    def __call__(self, net: jnp.ndarray, ii: jnp.ndarray, num_frames: int,
                 edge_mask: jnp.ndarray | None = None):
        """net: [B, E, H, W, 128]; ii: [E] per-edge frame-slot index in
        [0, num_frames); returns (eta [B, F, H, W],
        upmask [B, F, H, W, 576], slot_mask [F])."""
        b, e, h, w, c = net.shape
        x = nn.relu(
            nn.Conv(128, (3, 3), padding=1, name="conv1", dtype=self.dtype)(
                net.reshape(b * e, h, w, c)
            )
        ).reshape(b, e, h, w, c)

        if edge_mask is None:
            edge_mask = jnp.ones((e,), x.dtype)
        w_e = edge_mask.astype(x.dtype)
        num = jnp.zeros((b, num_frames, h, w, c), x.dtype).at[:, ii].add(
            x * w_e[None, :, None, None, None]
        )
        den = jnp.zeros((num_frames,), x.dtype).at[ii].add(w_e)
        frame_mask = den > 0
        x = num / jnp.maximum(den, 1.0)[None, :, None, None, None]

        x = nn.relu(
            nn.Conv(128, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(x.reshape(b * num_frames, h, w, c))
        )
        eta = nn.softplus(
            grad_clip(nn.Conv(1, (3, 3), padding=1, name="eta",
                              dtype=self.dtype)(x).astype(jnp.float32))
        )
        upmask = nn.Conv(8 * 8 * 9, (1, 1), name="upmask",
                         dtype=self.dtype)(x)
        return (
            0.01 * eta.reshape(b, num_frames, h, w),
            upmask.reshape(b, num_frames, h, w, 8 * 8 * 9)
            .astype(jnp.float32),
            frame_mask,
        )


class UpdateModule(nn.Module):
    """RAFT-SLAM update operator (droid_net.py:71-136).

    ``dtype`` sets the conv compute dtype: the SLAM inference path runs
    bf16 (params stay fp32; MXU convs take bf16 inputs) while training
    and parity tests keep fp32.  Geometry-facing outputs (delta, weight,
    eta, upmask) are always returned fp32 for the DBA solver.
    """

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        net: jnp.ndarray,
        inp: jnp.ndarray,
        corr: jnp.ndarray,
        flow: jnp.ndarray | None = None,
        ii: jnp.ndarray | None = None,
        num_frames: int | None = None,
        edge_mask: jnp.ndarray | None = None,
    ):
        """net/inp [B,E,H,W,128], corr [B,E,H,W,196], flow [B,E,H,W,4]."""
        b, e, h, w, _ = net.shape
        dt = self.dtype
        if flow is None:
            flow = jnp.zeros((b, e, h, w, 4), net.dtype)

        def flat(x):
            return x.reshape((b * e, h, w) + x.shape[4:])

        cor = nn.Sequential(
            [
                nn.Conv(128, (1, 1), name="corr_enc1", dtype=dt),
                nn.relu,
                nn.Conv(128, (3, 3), padding=1, name="corr_enc2", dtype=dt),
                nn.relu,
            ]
        )(flat(corr))
        flo = nn.Sequential(
            [
                nn.Conv(128, (7, 7), padding=3, name="flow_enc1", dtype=dt),
                nn.relu,
                nn.Conv(64, (3, 3), padding=1, name="flow_enc2", dtype=dt),
                nn.relu,
            ]
        )(flat(flow))

        h_new = KanBiasConvGRU(128, 128 + 128 + 64, name="gru", dtype=dt)(
            flat(net), flat(inp), cor, flo
        )

        delta = nn.Conv(2, (3, 3), padding=1, name="delta2", dtype=dt)(
            nn.relu(nn.Conv(128, (3, 3), padding=1, name="delta1",
                            dtype=dt)(h_new))
        )
        delta = grad_clip(delta.astype(jnp.float32))

        weight = nn.Conv(2, (3, 3), padding=1, name="weight2", dtype=dt)(
            nn.relu(nn.Conv(128, (3, 3), padding=1, name="weight1",
                            dtype=dt)(h_new))
        )
        weight = nn.sigmoid(grad_clip(weight.astype(jnp.float32)))

        net_out = h_new.reshape(b, e, h, w, 128)
        delta = delta.reshape(b, e, h, w, 2)
        weight = weight.reshape(b, e, h, w, 2)

        if ii is not None:
            eta, upmask, frame_mask = GraphAgg(name="agg", dtype=dt)(
                net_out, ii, num_frames, edge_mask
            )
            return net_out, delta, weight, eta, upmask, frame_mask
        return net_out, delta, weight
