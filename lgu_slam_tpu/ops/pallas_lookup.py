"""Pallas TPU kernel: windowed (deformable) correlation-pyramid lookup.

Replaces the XLA gather formulation of ``ops.sampler`` on the inference
path.  XLA lowers per-element gathers to a scalar loop on TPU — a single
frontend lookup measured **2.5 s** on v5e; every alternative XLA
formulation (take_along_axis over any axis, vmapped dynamic_slice,
one-hot einsums over tiny dims) measured 0.6-9 s because the per-pixel
window is data-dependent and the shapes are lane-hostile.

The kernel exploits the one fast data-dependent primitive Mosaic has —
``tpu.dynamic_gather``, a per-lane shuffle within 128-wide rows — plus
per-pixel dynamic *sublane* slices:

for each (edge, pixel-tile) block, with the level volume stored
row-padded as [E, P1, S, 128] (W2 padded to a divisor ``W2p`` of 128,
``k = 128 // W2p`` feature rows interleaved per stored row):

1. **slice**: per pixel, copy ``NS`` stored rows starting at a
   data-dependent row ``s0`` (covers the tap window in h) — dynamic
   sublane slices are cheap;
2. **repeat**: tile the slab ``k``x so each target h-row has a dedicated
   output row (lane-group ``j // NS`` selects the h-subrow);
3. **gather**: one ``tpu.dynamic_gather`` fetches, for every tap, both
   bilinear x-corners (lanes [0:64) = floor corner, [64:128) = +1);
4. **blend**: bilinear x-weights then a dense separable *tent* over the
   NR window rows reduces to [TP, K] outputs.

Out-of-bounds semantics match the CUDA sampler exactly
(/root/reference/offersample_LGS/defCorrSample_kernel.cu:48-66): taps
whose floor corner is out of bounds produce 0 (folded into the x
weights), partial corners are zero-padded (pad cols/rows are stored as
zeros; h rows outside the window get zero tent weight).

Forward-only: the SLAM inference path runs without gradients; training
uses the differentiable XLA patch formulation in ``ops.sampler``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIVISORS = (8, 16, 32, 64, 128)

# lookup geometry shared with models/corr.py: window radius 3, learned
# offsets bounded by tanh x4 on pyramid levels 0-1, none on levels 2-3
RADIUS = 3
MAX_OFFSET = 4


def level_layout(W2: int, level: int):
    """(W2p, NS) for a pyramid level's packed storage and window slice."""
    W2p = pad_w2(W2)
    rh = RADIUS + (MAX_OFFSET if level < 2 else 0)
    NS = pick_ns(2 * rh + 2, 128 // W2p)
    return W2p, NS


def pad_w2(W2: int) -> int:
    """Smallest divisor of 128 >= W2 (lane-row width of the stored level)."""
    for d in _DIVISORS:
        if d >= W2:
            return d
    raise ValueError(f"W2={W2} > 128 unsupported by the pallas lookup")


def pick_ns(A: int, k: int) -> int:
    """Smallest NS with NS*k >= A + k - 1 and NS*k a multiple of 8 (the
    in-kernel [TP, NR, 128] -> [TP*NR, 128] reshape must be layout-free)."""
    ns = -(-(A + k - 1) // k)
    while (ns * k) % 8:
        ns += 1
    return ns


def pack_level(vol_flat: jnp.ndarray, H2: int, W2: int, NS: int):
    """[E, P1, H2*W2] -> [E, P1, S, 128] row-padded storage (zero pad)."""
    E, P1, _ = vol_flat.shape
    W2p = pad_w2(W2)
    v = vol_flat.reshape(E, P1, H2, W2)
    if W2p != W2:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, W2p - W2)))
    k = 128 // W2p
    S = max(-(-H2 // k), NS)
    pad_h = S * k - H2
    if pad_h:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    return v.reshape(E, P1, S, 128), W2p


def _window_kernel(s0s_ref, s0v_ref, pxd_ref, pyd_ref, vol_ref, out_ref,
                   vol32_scr, slab_scr, *, NS, k, W2p, H2, W2, KP, do_slice):
    TP = out_ref.shape[1]
    NR = NS * k

    if do_slice:
        # dynamic sublane slices require fp32 tiling (bf16's 16-row tile
        # breaks the Mosaic lowering) -> convert the block once, slice
        # from the fp32 copy
        vol32_scr[...] = vol_ref[0].astype(jnp.float32)

        def body(p, _):
            slab_scr[p] = vol32_scr[p, pl.ds(s0s_ref[0, p, 0], NS), :]
            return 0
        jax.lax.fori_loop(0, TP, body, 0)
        slab = slab_scr[...]
    else:
        slab = vol_ref[0].astype(jnp.float32)

    rep = pltpu.repeat(slab, k, 1)  # [TP, NR, 128] tiled: row j = slab[j % NS]

    # row j of rep = stored row (j % NS); lane-group g = j // NS selects the
    # h-subrow within the stored row: h(j) = k*(s0 + j % NS) + (j // NS).
    jio = jax.lax.broadcasted_iota(jnp.int32, (TP, NR, 128), 1)
    grp = jio // NS

    pxd = pxd_ref[0]  # [TP, 128]: tap x, duplicated halves
    l128 = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    corner1 = l128 >= 64
    x1d = jnp.floor(pxd).astype(jnp.int32) + corner1.astype(jnp.int32)
    xi = jnp.clip(x1d, 0, W2p - 1)
    idx = grp * W2p + xi[:, None, :]
    g = jnp.take_along_axis(
        rep.reshape(TP * NR, 128), idx.reshape(TP * NR, 128), axis=-1
    ).reshape(TP, NR, 128)

    # bilinear x weights with CUDA boundary semantics: floor corner of the
    # tap must be fully in bounds (both axes) else the tap is 0; the +1
    # corner is zero-padded when it falls outside the real W2/H2 extent.
    pyd = pyd_ref[0]  # [TP, 64]
    y1 = jnp.floor(pyd)
    x1 = jnp.floor(pxd[:, :64])
    ok = ((x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)).astype(jnp.float32)
    frx = pxd[:, :64] - x1
    wx0 = (1.0 - frx) * ok
    wx1 = frx * ok * (x1 + 1 < W2)
    gx = g[:, :, 0:64] * wx0[:, None, :] + g[:, :, 64:128] * wx1[:, None, :]

    # dense tent over the NR window rows (the y bilinear: nonzero only at
    # floor(py) and floor(py)+1; rows outside the window are implicit 0)
    h0 = (s0v_ref[0][:, 0:1] * k).astype(jnp.float32)  # [TP, 1]
    ty = pyd - h0  # [TP, 64]
    jio64 = jax.lax.broadcasted_iota(jnp.int32, (TP, NR, 64), 1)
    hr = (k * (jio64 % NS) + jio64 // NS).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty[:, None, :] - hr))
    out_ref[0] = jnp.sum(wy * gx, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("H2", "W2", "W2p", "NS", "interpret", "tile_p"),
)
def window_lookup_packed(
    vol4: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    H2: int,
    W2: int,
    W2p: int,
    NS: int,
    interpret: bool = False,
    tile_p: int = 128,
):
    """Windowed bilinear lookup on a packed level.

    vol4: [E, P1, S, 128] (from :func:`pack_level`); px/py: [E, P1, K]
    absolute tap positions in level pixels.  Returns [E, P1, K] float32.
    All K tap positions of a pixel must lie within an ``NS*k - k + 1``-row
    window in h (guaranteed by radius + bounded learned offsets).
    """
    E, P1, S, _ = vol4.shape
    K = px.shape[-1]
    if K > 64:
        raise ValueError("at most 64 taps per kernel call")
    k = 128 // W2p
    NR = NS * k

    TP = tile_p if P1 % tile_p == 0 else P1
    fy = jnp.floor(py).astype(jnp.int32)
    # window start: rows [k*s0, k*s0 + NR) must contain every tap's floor
    # corner and its +1 neighbour.  The taps of one pixel span at most
    # NR - k + 1 rows (radius + bounded offsets), so anchoring at the
    # minimum corner suffices; clips keep the slice in the stored rows
    # (valid taps stay covered — see kernel docstring).
    fy_min = jnp.min(fy, axis=-1)  # [E, P1]
    s0 = jnp.clip(fy_min // k, 0, S - NS).astype(jnp.int32)

    pad64 = jnp.zeros(px.shape[:2] + (64 - K,), px.dtype)
    px64 = jnp.concatenate([px, pad64], axis=-1)
    py64 = jnp.concatenate([py, pad64], axis=-1)
    pxd = jnp.concatenate([px64, px64], axis=-1)  # [E, P1, 128]

    kern = functools.partial(
        _window_kernel, NS=NS, k=k, W2p=W2p, H2=H2, W2=W2, KP=64,
        do_slice=(S != NS),
    )
    out = pl.pallas_call(
        kern,
        grid=(E, P1 // TP),
        in_specs=[
            pl.BlockSpec((1, TP, 1), lambda e, p: (e, p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TP, 1), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, S, 128), lambda e, p: (e, p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P1, 64), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TP, S, 128), jnp.float32),
            pltpu.VMEM((TP, NS, 128), jnp.float32),
        ],
        interpret=interpret,
    )(s0[..., None], s0[..., None], pxd, py64, vol4)
    return out[..., :K]


def _dense_kernel(pxd_ref, pyd_ref, vol_ref, out_ref, *, H2, W2, W2p, S, KP):
    """Whole-plane dense tent evaluation (tiny levels, P2 <= ~256)."""
    TP = out_ref.shape[1]
    V = vol_ref[0].astype(jnp.float32)  # [TP, S, 128]
    qio = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    qh = (qio // W2p).astype(jnp.float32)
    qw = (qio % W2p).astype(jnp.float32)

    pxd = pxd_ref[0]
    pyd = pyd_ref[0]
    x1 = jnp.floor(pxd)
    y1 = jnp.floor(pyd)
    ok = ((x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)).astype(jnp.float32)
    for kk in range(KP):
        tx = pxd[:, kk:kk + 1, None]
        ty = pyd[:, kk:kk + 1, None]
        t = (jnp.maximum(0.0, 1.0 - jnp.abs(tx - qw[None]))
             * jnp.maximum(0.0, 1.0 - jnp.abs(ty - qh[None])))
        r = jnp.sum(V * t, axis=(1, 2))[:, None]  # [TP, 1]
        out_ref[0, :, kk:kk + 1] = r * ok[:, kk:kk + 1]


@functools.partial(
    jax.jit, static_argnames=("H2", "W2", "W2p", "interpret", "tile_p")
)
def dense_lookup_packed(
    vol4: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    H2: int,
    W2: int,
    W2p: int,
    interpret: bool = False,
    tile_p: int = 128,
):
    """Dense whole-plane lookup for tiny levels (no window machinery).

    vol4: [E, P1, S, 128]; px/py: [E, P1, K] -> [E, P1, K] float32.
    """
    E, P1, S, _ = vol4.shape
    K = px.shape[-1]
    TP = tile_p if P1 % tile_p == 0 else P1
    kern = functools.partial(
        _dense_kernel, H2=H2, W2=W2, W2p=W2p, S=S, KP=K
    )
    return pl.pallas_call(
        kern,
        grid=(E, P1 // TP),
        in_specs=[
            pl.BlockSpec((1, TP, K), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, K), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, S, 128), lambda e, p: (e, p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TP, K), lambda e, p: (e, p, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P1, K), jnp.float32),
        interpret=interpret,
    )(px, py, vol4)
