"""Pallas TPU kernel: fused all-pairs correlation + Gaussian-uncertainty
masking (level-0 corr pyramid construction).

Replaces the XLA pipeline ``corr = (f1/4)(f2/4)^T; corr' = corr +
window_gauss * corr / (2*pi*sqrt(det))`` (models/corr.py + ops/sampler.py
gaussian_window_mask) with one kernel per (edge, pixel-tile):

- MXU: the [TILE_P, C] x [C, H2*W2] feature dot product;
- VPU epilogue: the per-pixel windowed Gaussian re-weighting computed
  in-register from (mean, cov) — no fp32 volume is ever materialized in
  HBM (the output is written directly in the pyramid storage dtype).

Grid: (E, H1*W1 / TILE_P).  f2 for the edge stays resident in VMEM across
the pixel tiles (its block index is constant in the tile axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_P = 256  # pixels per tile (rows of the corr block)


def _kernel(f1_ref, f2_ref, mean_ref, cov_ref, out_ref, *, H2, W2, radius,
            tile_p):
    f1 = f1_ref[0]  # [tile_p, C]
    f2 = f2_ref[0]  # [H2*W2, C]
    corr = jax.lax.dot_general(
        f1, f2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / 16.0)  # both features carry the reference's 1/4 scaling

    mx = mean_ref[0, :, 0:1]  # [tile_p, 1]
    my = mean_ref[0, :, 1:2]
    c1 = cov_ref[0, :, 0:1]
    c2 = cov_ref[0, :, 1:2]

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_p, H2 * W2), 1)
    x2 = (col % W2).astype(jnp.float32)
    y2 = (col // W2).astype(jnp.float32)
    ddx = x2 - mx
    ddy = y2 - my
    fx = jnp.floor(mx)
    fy = jnp.floor(my)
    in_win = (jnp.abs(x2 - fx) <= radius) & (jnp.abs(y2 - fy) <= radius)

    g = 3.0 * jnp.exp(-0.5 * (ddx * ddx / c1 + ddy * ddy / c2))
    denom = 6.28 * jnp.sqrt(c1 * c2)
    scale = jnp.where(in_win, 1.0 + g / denom, 1.0)
    out_ref[0] = (corr * scale).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("radius", "out_dtype", "interpret", "flat")
)
def masked_corr_level0(
    fmap1,
    fmap2,
    mean,
    cov,
    radius: int = 4,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    flat: bool = False,
):
    """fmap1/fmap2: [E, H, W, C] raw features (the kernel applies the 1/16
    joint scaling); mean/cov: [E, H, W, 2].
    Returns the masked level-0 volume [E, H, W, H, W] in ``out_dtype``.

    Equivalent to ``gaussian_window_mask(c, mean, cov)/denom + c`` with
    c = all_pairs_correlation (verified in tests/test_pallas.py).
    """
    E, H, W, C = fmap1.shape
    P = H * W
    tile_p = TILE_P if P % TILE_P == 0 else P

    f1 = fmap1.reshape(E, P, C).astype(jnp.float32)
    f2 = fmap2.reshape(E, P, C).astype(jnp.float32)
    mean2 = mean.reshape(E, P, 2).astype(jnp.float32)
    cov2 = cov.reshape(E, P, 2).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, H2=H, W2=W, radius=radius, tile_p=tile_p
    )
    out = pl.pallas_call(
        kernel,
        grid=(E, P // tile_p),
        in_specs=[
            pl.BlockSpec((1, tile_p, C), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, P, C), lambda e, p: (e, 0, 0)),
            pl.BlockSpec((1, tile_p, 2), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, tile_p, 2), lambda e, p: (e, p, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_p, P), lambda e, p: (e, p, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P, P), out_dtype),
        interpret=interpret,
    )(f1, f2, mean2, cov2)
    if flat:
        return out  # [E, P, P]
    return out.reshape(E, H, W, H, W)
