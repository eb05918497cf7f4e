"""Pallas TPU kernel: windowed (deformable) correlation-pyramid lookup.

Replaces the XLA gather formulation of ``ops.sampler`` on the inference
path.  XLA lowers per-element gathers to a scalar loop on TPU — a single
frontend lookup measured **2.5 s** on v5e; every alternative XLA
formulation (take_along_axis over any axis, vmapped dynamic_slice,
one-hot einsums over tiny dims) measured 0.6-9 s because the per-pixel
window is data-dependent and the shapes are lane-hostile.

The kernel exploits the one fast data-dependent primitive Mosaic has —
``tpu.dynamic_gather``, a per-lane shuffle within 128-wide rows.  The
level volume is stored row-padded as [E, P1, S, 128]: W2 padded to a
divisor ``W2p`` of 128, ``k = 128 // W2p`` target rows interleaved per
stored row (stored row ``s``, lane ``l`` holds target cell
``h = s*k + l // W2p``, ``w = l % W2p``), so the whole target plane of a
pixel is S lane-rows.

For each (edge, pixel-tile) block and each bilinear y-corner, ONE lane
index fully resolves a tap's (h % k, x) within its stored row; the stored
row ``s = h // k`` is selected by an unrolled masked sum over the S rows:

    acc[t, tap] = sum_s (s == h[t,tap] // k) *
                  dynamic_gather(vol[t, s, :], (h % k) * W2p + x)[tap]

This replaces the earlier design's per-pixel *serial* dynamic sublane
slices (a 128-iteration scalar loop per block — measured as ~60% of the
kernel) and its k-fold ``pltpu.repeat`` + dense NR-row tent (the other
~40%): the masked sum touches S rows instead of NS*k and needs no repeat,
no iota tables, no scratch.  Profiled on v5 lite: 27.5 ms/iteration ->
see BASELINE.md (the five per-iteration lookup calls were the dominant
term of the whole frontend device program).

Out-of-bounds semantics match the CUDA sampler exactly
(/root/reference/offersample_LGS/defCorrSample_kernel.cu:48-66): taps
whose floor corner is out of bounds produce 0 (folded into the x
weights), partial corners are zero-padded (pad cols/rows are stored as
zeros; the +1 corners are weight-gated at the true W2/H2 extents).

Forward-only: the SLAM inference path runs without gradients; training
uses the differentiable XLA patch formulation in ``ops.sampler``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_DIVISORS = (8, 16, 32, 64, 128)

# lookup geometry shared with models/corr.py: window radius 3, learned
# offsets bounded by tanh x4 on pyramid levels 0-1, none on levels 2-3
RADIUS = 3
MAX_OFFSET = 4


def level_layout(W2: int, level: int):
    """(W2p, NS) for a pyramid level's packed storage.  NS is retained
    for API stability; the resolved-gather kernel no longer windows."""
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
    """Legacy window-row count (unused by the kernel; kept so stored
    plans/tests that compute it keep working)."""
    ns = -(-(A + k - 1) // k)
    while (ns * k) % 8:
        ns += 1
    return ns


def pick_tp(P1: int, cap: int = 128) -> int:
    """Pixel-tile size: the largest divisor of P1 <= cap (multiple of 8
    when possible) so odd (TUM-like) plane sizes don't force one giant
    block."""
    best = P1
    for tp in range(min(cap, P1), 0, -1):
        if P1 % tp == 0:
            best = tp
            break
    return best


def pack_level(vol_flat: jnp.ndarray, H2: int, W2: int, NS: int = 0):
    """[E, P1, H2*W2] -> [E, P1, S, 128] row-padded storage (zero pad).

    ``NS`` is accepted for call-site compatibility and ignored: the
    resolved-gather kernel reads whole planes, so S = ceil(H2 / k).
    """
    E, P1, _ = vol_flat.shape
    W2p = pad_w2(W2)
    v = vol_flat.reshape(E, P1, H2, W2)
    if W2p != W2:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, W2p - W2)))
    k = 128 // W2p
    S = -(-H2 // k)
    pad_h = S * k - H2
    if pad_h:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    return v.reshape(E, P1, S, 128), W2p


def _window_kernel(pxd_ref, pyd_ref, vol_ref, out_ref, *, k, W2p, H2, W2, S):
    TP = out_ref.shape[1]
    V = vol_ref[0]  # [TP, S, 128] (volume dtype; select chain casts late)

    pxd = pxd_ref[0]  # [TP, 128]: tap x, duplicated halves
    pyd = pyd_ref[0]  # [TP, 64]

    # bilinear weights with CUDA boundary semantics: the floor corner of a
    # tap must be fully in bounds (both axes) else the tap is 0; +1
    # corners falling outside the real W2/H2 extent are zero-padded
    # (pad lanes hold zeros; the h extent is weight-gated).
    x1 = jnp.floor(pxd[:, :64])
    y1 = jnp.floor(pyd)
    ok = ((x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)).astype(jnp.float32)
    frx = pxd[:, :64] - x1
    fry = pyd - y1
    wx0 = (1.0 - frx) * ok
    wx1 = frx * ok * (x1 + 1 < W2)
    wy0 = 1.0 - fry
    wy1 = fry * (y1 + 1 < H2)

    # lane index of both x-corners (lanes [0:64) floor, [64:128) +1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    corner1 = (l128 >= 64).astype(jnp.int32)
    x1d = jnp.floor(pxd).astype(jnp.int32) + corner1
    xi = jnp.clip(x1d, 0, W2p - 1)

    y1i = jnp.floor(pyd).astype(jnp.int32)

    def corner_acc(hrow):
        """hrow [TP, 64] int target row -> gathered values [TP, 128]
        (both x-corners), selecting stored row h//k (each lane matches
        exactly one stored row, so a select chain suffices)."""
        h = jnp.clip(hrow, 0, S * k - 1)
        hd = jnp.concatenate([h, h], axis=-1)  # [TP, 128]
        s_t = hd // k
        idx = (hd - s_t * k) * W2p + xi
        acc = jnp.zeros((TP, 128), jnp.float32)
        for s in range(S):
            g = jnp.take_along_axis(V[:, s, :].astype(jnp.float32), idx,
                                    axis=-1)
            acc = jnp.where(s_t == s, g, acc)
        return acc

    a0 = corner_acc(y1i)
    a1 = corner_acc(y1i + 1)
    out_ref[0] = (
        wy0 * (wx0 * a0[:, :64] + wx1 * a0[:, 64:])
        + wy1 * (wx0 * a1[:, :64] + wx1 * a1[:, 64:])
    )


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
    NS: int = 0,
    interpret: bool = False,
    tile_p: int = 128,
):
    """Windowed bilinear lookup on a packed level.

    vol4: [E, P1, S, 128] (from :func:`pack_level`); px/py: [E, P1, K]
    absolute tap positions in level pixels.  Returns [E, P1, K] float32.
    ``NS`` is ignored (API compatibility).
    """
    E, P1, S, _ = vol4.shape
    K = px.shape[-1]
    if K > 64:
        raise ValueError("at most 64 taps per kernel call")
    k = 128 // W2p

    TP = tile_p if P1 % tile_p == 0 else pick_tp(P1, tile_p)

    pad64 = jnp.zeros(px.shape[:2] + (64 - K,), px.dtype)
    px64 = jnp.concatenate([px, pad64], axis=-1)
    py64 = jnp.concatenate([py, pad64], axis=-1)
    pxd = jnp.concatenate([px64, px64], axis=-1)  # [E, P1, 128]

    kern = functools.partial(
        _window_kernel, k=k, W2p=W2p, H2=H2, W2=W2, S=S,
    )
    out = pl.pallas_call(
        kern,
        grid=(E, P1 // TP),
        in_specs=[
            pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0)),
            pl.BlockSpec((1, TP, S, 128), lambda e, p: (e, p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P1, 64), jnp.float32),
        interpret=interpret,
    )(pxd, py64, vol4)
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
    TP = tile_p if P1 % tile_p == 0 else pick_tp(P1, tile_p)
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


# ---------------------------------------------------------------------------
# fused whole-pyramid lookup: 4 levels + variance probe + gate in ONE kernel
# ---------------------------------------------------------------------------
#
# The per-level kernel above is dominated by per-block fixed costs (DMA
# latency + grid stepping: a level with S=1 still measured ~2.5 us/block,
# and one frontend iteration issues 5 kernels x E*P1/TP blocks).  Fusing
# the probe, the variance gate, and all four level lookups into one kernel
# over one packed [E, P1, S_tot, 128] tensor cuts the block count 5x and
# reads each pixel's volume rows exactly once.

RD = 2 * RADIUS + 1  # 7
NUM_LEVELS = 4


def pyramid_meta(H: int, W: int):
    """Static layout of the packed whole-pyramid tensor for a base plane
    (H, W): per level (H2, W2, W2p, k, S, s_off) plus total rows."""
    meta = []
    h2, w2 = H, W
    s_off = 0
    for _ in range(NUM_LEVELS):
        W2p = pad_w2(w2)
        k = 128 // W2p
        S = -(-h2 // k)
        meta.append((h2, w2, W2p, k, S, s_off))
        s_off += S
        h2, w2 = h2 // 2, w2 // 2
    return tuple(meta), s_off


def pack_pyramid(levels_flat, H: int, W: int):
    """Per-level flat volumes [E, P1, H2*W2] -> tuple of packed
    [E, P1, S_l, 128] tensors (zero padding), matching pyramid_meta.
    Kept per-level (no concat): level 0 packs as a free reshape at
    reference scale, and a concatenated copy of the ~1.6 GB pyramid
    measured ~10 ms per build."""
    meta, _ = pyramid_meta(H, W)
    return tuple(
        pack_level(vol, meta[lvl][0], meta[lvl][1])[0]
        for lvl, vol in enumerate(levels_flat)
    )


def pack_offsets(off: jnp.ndarray) -> jnp.ndarray:
    """[E, P1, rd, rd, 2] tap offsets -> [E, P1, 128] lane-packed
    (x offsets in lanes [0:49), y offsets in lanes [64:113))."""
    E, P1 = off.shape[:2]
    o = off.reshape(E, P1, RD * RD, 2)
    pad = jnp.zeros((E, P1, 64 - RD * RD), off.dtype)
    return jnp.concatenate([o[..., 0], pad, o[..., 1], pad], axis=-1)


def _corner_acc(V4, S, k, W2p, hrow, xi, okd, acc_ref):
    """Gather both x-corners for target rows ``hrow`` [TP, 64] over one
    level's packed rows V4 [TP, S, 128].

    Row-range culling: per block, only stored rows within the
    [min, max] row range of the *valid* taps are visited (``pl.when``
    predication) — SLAM reprojections are smooth, so a pixel tile
    typically touches a small band of the S rows.  Invalid taps gather
    garbage-free zero (their rows are excluded from the range and their
    bilinear weights are zero anyway).
    """
    TP = hrow.shape[0]
    h = jnp.clip(hrow, 0, S * k - 1)
    hd = jnp.concatenate([h, h], axis=-1)  # [TP, 128]
    s_t = hd // k
    idx = (hd - s_t * k) * W2p + xi
    # each lane's tap lives in exactly ONE stored row, so the "masked sum"
    # is really a select chain (no convert/multiply/add per row; Mosaic
    # dynamic_gather is 32-bit only, so rows still cast f32 before gather)
    if S <= 2:
        acc = jnp.zeros((TP, 128), jnp.float32)
        for s in range(S):
            g = jnp.take_along_axis(V4[:, s, :].astype(jnp.float32), idx,
                                    axis=-1)
            acc = jnp.where(s_t == s, g, acc)
        return acc
    smin = jnp.min(s_t * okd + S * (1 - okd))
    smax = jnp.max(s_t * okd - (1 - okd))
    acc_ref[...] = jnp.zeros((TP, 128), acc_ref.dtype)
    for s in range(S):
        @pl.when(jnp.logical_and(s >= smin, s <= smax))
        def _():
            g = jnp.take_along_axis(V4[:, s, :].astype(jnp.float32), idx,
                                    axis=-1)
            acc_ref[...] = jnp.where(s_t == s, g, acc_ref[...])
    return acc_ref[...].astype(jnp.float32)


def _corner_acc_pair(V4, S, k, W2p, h0row, xi, okd, acc0_ref, acc1_ref):
    """Both y-corners (rows h0 and h0+1) in ONE row sweep.

    Two independent :func:`_corner_acc` sweeps load and bf16->f32 cast
    each visited stored row twice (the corner-1 range is corner-0's
    shifted by one); fusing them halves the row loads/casts — the cast
    is VPU work of the same order as the gather itself, and this sweep
    is the kernel's dominant cost (see BASELINE.md roofline note)."""
    TP = h0row.shape[0]
    h0 = jnp.clip(h0row, 0, S * k - 1)
    h1 = jnp.clip(h0row + 1, 0, S * k - 1)
    hd0 = jnp.concatenate([h0, h0], axis=-1)  # [TP, 128]
    hd1 = jnp.concatenate([h1, h1], axis=-1)
    s0 = hd0 // k
    s1 = hd1 // k
    idx0 = (hd0 - s0 * k) * W2p + xi
    idx1 = (hd1 - s1 * k) * W2p + xi

    if S <= 2:
        acc0 = jnp.zeros((TP, 128), jnp.float32)
        acc1 = jnp.zeros((TP, 128), jnp.float32)
        for s in range(S):
            Vs = V4[:, s, :].astype(jnp.float32)
            acc0 = jnp.where(s0 == s, jnp.take_along_axis(Vs, idx0, axis=-1),
                             acc0)
            acc1 = jnp.where(s1 == s, jnp.take_along_axis(Vs, idx1, axis=-1),
                             acc1)
        return acc0, acc1

    # union row range of the valid taps' two corners
    smin = jnp.min(jnp.minimum(s0, s1) * okd + S * (1 - okd))
    smax = jnp.max(jnp.maximum(s0, s1) * okd - (1 - okd))
    acc0_ref[...] = jnp.zeros((TP, 128), acc0_ref.dtype)
    acc1_ref[...] = jnp.zeros((TP, 128), acc1_ref.dtype)
    for s in range(S):
        @pl.when(jnp.logical_and(s >= smin, s <= smax))
        def _():
            Vs = V4[:, s, :].astype(jnp.float32)
            acc0_ref[...] = jnp.where(
                s0 == s, jnp.take_along_axis(Vs, idx0, axis=-1),
                acc0_ref[...])
            acc1_ref[...] = jnp.where(
                s1 == s, jnp.take_along_axis(Vs, idx1, axis=-1),
                acc1_ref[...])
    return acc0_ref[...].astype(jnp.float32), \
        acc1_ref[...].astype(jnp.float32)


def _bilinear_level(V4, meta_l, px_d, py, acc_ref, acc1_ref=None):
    """Full bilinear window lookup at one packed level V4 [TP, S, 128].

    px_d [TP, 128] (x positions, dup halves = the two x-corners),
    py [TP, 64].  Returns [TP, 64] float32 (CUDA boundary semantics).
    """
    H2, W2, W2p, k, S, _ = meta_l
    TP = py.shape[0]
    x1 = jnp.floor(px_d[:, :64])
    y1 = jnp.floor(py)
    ok = (x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)
    okf = ok.astype(jnp.float32)
    frx = px_d[:, :64] - x1
    fry = py - y1
    wx0 = (1.0 - frx) * okf
    wx1 = frx * okf * (x1 + 1 < W2)
    wy0 = 1.0 - fry
    wy1 = fry * (y1 + 1 < H2)

    l128 = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    corner1 = (l128 >= 64).astype(jnp.int32)
    xi = jnp.clip(jnp.floor(px_d).astype(jnp.int32) + corner1, 0, W2p - 1)
    y1i = jnp.floor(py).astype(jnp.int32)
    oki = ok.astype(jnp.int32)
    okd = jnp.concatenate([oki, oki], axis=-1)

    if acc1_ref is None:
        a0 = _corner_acc(V4, S, k, W2p, y1i, xi, okd, acc_ref)
        r0 = wy0 * (wx0 * a0[:, :64] + wx1 * a0[:, 64:])
        a1 = _corner_acc(V4, S, k, W2p, y1i + 1, xi, okd, acc_ref)
        return r0 + wy1 * (wx0 * a1[:, :64] + wx1 * a1[:, 64:])

    a0, a1 = _corner_acc_pair(V4, S, k, W2p, y1i, xi, okd, acc_ref,
                              acc1_ref)
    return (wy0 * (wx0 * a0[:, :64] + wx1 * a0[:, 64:])
            + wy1 * (wx0 * a1[:, :64] + wx1 * a1[:, 64:]))


def _fused_kernel(cxy_ref, off0_ref, off1_ref, v0_ref, v1_ref, v2_ref,
                  v3_ref, out0_ref, out1_ref, out2_ref, out3_ref, acc_ref,
                  acc1_ref, *, meta):
    TP = out0_ref.shape[1]
    Vs = (v0_ref[0], v1_ref[0], v2_ref[0], v3_ref[0])  # [TP, S_l, 128]
    cxy = cxy_ref[0]  # [TP, 128] (lane 0 = x, lane 1 = y)
    cx = cxy[:, 0:1]
    cy = cxy[:, 1:2]

    # tap deltas on 64 lanes (x-major channel order i*rd+j).  NB: Mosaic
    # miscompiles lane-slices of computed 128-lane iota expressions — keep
    # all tap-index math 64-lane wide and duplicate via concat.
    l64 = jax.lax.broadcasted_iota(jnp.int32, (TP, 64), 1)
    live = (l64 < RD * RD).astype(jnp.float32)
    dx = ((l64 // RD) - RADIUS).astype(jnp.float32) * live
    dy = ((l64 % RD) - RADIUS).astype(jnp.float32) * live

    def tap_positions(off_pk, scale, gate):
        """Packed offsets [TP, 128] -> (px_d [TP, 128], py [TP, 64]) with
        gate multiply, center-tap zeroing and clip (models/corr.py
        _tap_positions semantics)."""
        ox = off_pk[:, :64]
        oy = off_pk[:, 64:]
        if gate is not None:
            ox = ox * gate
            oy = oy * gate
        notc = (l64 != (RADIUS * RD + RADIUS)).astype(jnp.float32)
        ox = jnp.clip(ox * notc, -4.0, 4.0)
        oy = jnp.clip(oy * notc, -4.0, 4.0)
        px = cx * scale + ox + dx
        py = cy * scale + oy + dy
        return jnp.concatenate([px, px], axis=-1), py

    # variance probe: radius-1 plain window at level 1 (corr.py:94-99)
    livep = (l64 < 9).astype(jnp.float32)
    dxp = ((l64 // 3) - 1).astype(jnp.float32) * livep
    dyp = ((l64 % 3) - 1).astype(jnp.float32) * livep
    pxp = cx * 0.5 + dxp
    probe = _bilinear_level(
        Vs[1], meta[1], jnp.concatenate([pxp, pxp], axis=-1),
        cy * 0.5 + dyp, acc_ref, acc1_ref,
    )
    m = jnp.sum(probe[:, :9], axis=-1, keepdims=True) / 9.0
    var = jnp.sum((probe[:, :9] - m) ** 2, axis=-1, keepdims=True) / 8.0
    gate = jax.nn.sigmoid(var)  # [TP, 1]

    o0 = off0_ref[0]
    o1 = off1_ref[0]
    px0, py0 = tap_positions(o0, 1.0, None)
    px1, py1 = tap_positions(o1, 0.5, gate)
    out0_ref[0] = _bilinear_level(Vs[0], meta[0], px0, py0, acc_ref,
                                  acc1_ref)
    out1_ref[0] = _bilinear_level(Vs[1], meta[1], px1, py1, acc_ref,
                                  acc1_ref)
    for lvl, oref in ((2, out2_ref), (3, out3_ref)):
        scale = 0.5 ** lvl
        px = cx * scale + dx
        py = cy * scale + dy
        oref[0] = _bilinear_level(
            Vs[lvl], meta[lvl], jnp.concatenate([px, px], axis=-1), py,
            acc_ref, acc1_ref,
        )


@functools.partial(
    jax.jit, static_argnames=("H", "W", "interpret", "tile_p")
)
def fused_pyramid_lookup(
    vols,
    cflat: jnp.ndarray,
    off0: jnp.ndarray,
    off1: jnp.ndarray,
    H: int,
    W: int,
    interpret: bool = False,
    tile_p: int = 256,  # 256 measured ~13% faster than 128 on v5 lite
):
    """One-kernel deformable pyramid lookup (corr.py:88-109 semantics).

    vols: tuple of 4 packed levels [E, P1, S_l, 128] (from
    :func:`pack_pyramid`); cflat: [E, P1, 2] base coords in level-0
    pixels; off0/off1: [E, P1, rd, rd, 2] learned offsets for levels 0/1
    (pre-gate).  The radius-1 level-1 variance probe, sigmoid gate,
    center-tap zeroing, clip, and all four level lookups run inside the
    kernel.  Returns [E, P1, 4*49] float32 ordered level-major (tap
    channel i*rd+j, x-major), matching the chained CorrSampler outputs.
    """
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    E, P1 = cflat.shape[:2]
    meta, _ = pyramid_meta(H, W)
    for lvl, v in enumerate(vols):
        assert v.shape[2] == meta[lvl][4], (lvl, v.shape, meta[lvl])
    TP = tile_p if P1 % tile_p == 0 else pick_tp(P1, tile_p)

    cxy = jnp.concatenate(
        [cflat, jnp.zeros((E, P1, 126), cflat.dtype)], axis=-1
    )
    o0 = pack_offsets(off0)
    o1 = pack_offsets(off1)

    kern = functools.partial(_fused_kernel, meta=meta)
    ospec = pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0))
    oshape = jax.ShapeDtypeStruct((E, P1, 64), jnp.float32)
    outs = pl.pallas_call(
        kern,
        grid=(E, P1 // TP),
        in_specs=[pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0))] * 3
        + [
            pl.BlockSpec((1, TP, meta[lvl][4], 128),
                         lambda e, p: (e, p, 0, 0))
            for lvl in range(NUM_LEVELS)
        ],
        out_specs=[ospec] * 4,
        out_shape=[oshape] * 4,
        scratch_shapes=[pltpu.VMEM((TP, 128), jnp.float32),
                        pltpu.VMEM((TP, 128), jnp.float32)],
        interpret=interpret,
    )(cxy, o0, o1, *vols)
    K = RD * RD
    return jnp.concatenate([o[..., :K] for o in outs], axis=-1)
