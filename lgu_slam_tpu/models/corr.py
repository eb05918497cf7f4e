"""Correlation pyramid construction + deformable lookup (reference:
droid_slam/modules/corr.py).

Two implementations, mirroring the reference:

- **Volume path** (frontend / motion filter / training): materialize the
  all-pairs volume, apply the Gaussian uncertainty mask, build a 4-level
  avg-pool pyramid, then do deformable lookups per level
  (corr.py:52-152 ``CorrBlock``).
- **Fused low-memory path** (backend): compute windowed correlations
  directly from feature maps without materializing the O(H^2 W^2) volume
  (corr.py:155-249 ``AltCorrBlock`` + the altcorr/lowMem_defSample CUDA
  kernels).  Note the reference applies *no* Gaussian mask on this path.

All functions are pure; the pyramid is a pytree the caller owns (the SLAM
factor graph stores it in padded edge-slot buffers).

Design deviation (documented): the reference's ``CorrBlock.__call__``
multiplies the stored level-1 offsets by the variance-gate *in place*, so
repeated lookups compound the gate (corr.py:99).  Here the gate is applied
per lookup (pure), which is the evidently intended semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lgu_slam_tpu.ops.sampler import corr_index, defcorr_index

NUM_LEVELS = 4
RADIUS = 3


class CorrPyramid(NamedTuple):
    """Per-edge correlation state (all arrays lead with the edge axis).

    Levels are stored *flat* — [E, H*W, (H/2^i) * (W/2^i)] — so the TPU
    lane dimension stays large (no padding of the small trailing W/2^i
    dims, no relayout copy per lookup).  Level target dims derive
    statically from the base (H, W) carried by ``offsets``.
    """

    levels: tuple  # level i: [E, H*W, h_i * w_i]
    offsets: tuple  # (off0, off1): [E, H, W, 7, 7, 2]
    mean: jnp.ndarray  # [E, H, W, 2] Gaussian means (training loss)
    theta: jnp.ndarray  # [E, H, W] 2*det (training loss)

    def level_dims(self):
        h, w = self.offsets[0].shape[1:3]
        dims = []
        for _ in range(NUM_LEVELS):
            dims.append((h, w))
            h, w = h // 2, w // 2
        return dims

    @property
    def is_packed(self):
        """True when levels hold the fused-lookup packed tensors
        [E, P1, S_l, 128] instead of NUM_LEVELS flat planes."""
        return self.levels[0].ndim == 4


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs feature correlation (corr.py:144-152).

    fmap1/fmap2: [E, H, W, C] -> [E, H, W, H, W] (f1/4 . f2/4).
    """
    e, h, w, c = fmap1.shape
    a = (fmap1 / 4.0).reshape(e, h * w, c)
    b = (fmap2 / 4.0).reshape(e, h * w, c)
    corr = jnp.einsum(
        "eic,ejc->eij", a, b, preferred_element_type=jnp.float32
    )
    return corr.reshape(e, h, w, h, w)


def _avg_pool_last2(vol: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool over the last two (target) dims, flooring
    odd extents like F.avg_pool2d (TUM-size feature maps are odd)."""
    *lead, h2, w2 = vol.shape
    ho, wo = h2 // 2, w2 // 2
    v = vol[..., : ho * 2, : wo * 2]
    v = v.reshape(-1, ho, 2, wo, 2).mean(axis=(2, 4))
    return v.reshape(*lead, ho, wo)


def _map_normalize_nhwc(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """per_Corr_Normalization over (H, W, C) per batch (corr.py:44-51)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True) + eps
    return (x - mean) / jnp.sqrt(var)


def fpn_offsets(ofs_map_fn, ofs_residual_fn, t: jnp.ndarray):
    """FPN offset fields for pyramid levels 0/1 (corr.py:117-135).

    t: [E, H, W, 256] concatenated feature pair.  ``ofs_map_fn`` /
    ``ofs_residual_fn`` are bound 3x3 conv applies (256 -> 98).
    Returns (off0, off1) with shape [E, H, W, 7, 7, 2]; levels 2/3 use
    zeros (and are detached in the reference).
    """
    e, h, w, _ = t.shape
    o0 = ofs_map_fn(t)  # [E, H, W, 98]
    t1 = t[:, : h // 2 * 2, : w // 2 * 2].reshape(
        e, h // 2, 2, w // 2, 2, t.shape[-1]
    ).mean(axis=(2, 4))
    o1 = ofs_residual_fn(t1)
    o1 = jax.image.resize(o1, (e, h, w, o1.shape[-1]), method="nearest")

    o0 = jnp.tanh(_map_normalize_nhwc(o0)) * 4.0
    o1 = (jnp.tanh(_map_normalize_nhwc(o1)) * 4.0 + o0) / 2.0
    rd = 2 * RADIUS + 1
    return (
        o0.reshape(e, h, w, rd, rd, 2),
        o1.reshape(e, h, w, rd, rd, 2),
    )


def build_corr_pyramid(
    ga_predict_fn,
    ofs_map_fn,
    ofs_residual_fn,
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    volume_dtype=jnp.float32,
    edge_chunk: int = 8,
    use_pallas: bool | None = None,
    pack: bool | None = None,
) -> CorrPyramid:
    """Full CorrBlock construction (corr.py:53-86).

    fmap1/fmap2: [E, H, W, 128].  ``ga_predict_fn(t)`` returns the
    GaussianMask parameters (mean, cov, det).

    On TPU the masked level-0 volume is built by the fused Pallas kernel
    (ops/pallas_corr.py: MXU matmul + in-register Gaussian epilogue, output
    written directly in ``volume_dtype``); elsewhere a chunked XLA path
    bounds the fp32 transients.  Pooled levels are derived level-by-level
    in edge chunks.
    """
    E, H, W, _ = fmap1.shape
    P = H * W
    t = jnp.concatenate([fmap1, fmap2], axis=-1)  # [E,H,W,256]
    off0, off1 = fpn_offsets(ofs_map_fn, ofs_residual_fn, t)
    mean, cov, det = ga_predict_fn(t)

    if use_pallas is None:
        if pack is False:
            # training forward: the fused Pallas build is forward-only
            # (no VJP); gradients need the XLA formulation on every
            # backend, TPU included
            use_pallas = False
        else:
            from lgu_slam_tpu.ops.pallas_corr import TILE_P  # noqa: PLC0415

            # honour an active jax.default_device(cpu) override (used to
            # initialize parameters host-side): Pallas has no CPU lowering
            dd = jax.config.jax_default_device
            platform = dd.platform if dd is not None else (
                jax.default_backend()
            )
            use_pallas = platform == "tpu" and (
                P % TILE_P == 0 or P <= 1500
            )

    def masked_level0(f1, f2, mean_c, cov_c, det_c):
        corr = all_pairs_correlation(f1, f2)  # fp32
        from lgu_slam_tpu.ops.sampler import gaussian_window_mask  # noqa: PLC0415

        masked = gaussian_window_mask(corr, mean_c, cov_c, 4)
        denom = 6.28 * jnp.sqrt(det_c)[..., None, None]
        return (masked / denom + corr).astype(volume_dtype)

    if use_pallas:
        from lgu_slam_tpu.ops.pallas_corr import masked_corr_level0  # noqa: PLC0415

        lvl0 = masked_corr_level0(
            fmap1, fmap2, mean, cov, out_dtype=volume_dtype, flat=True
        )  # [E, P, P]
    elif E % edge_chunk == 0 and E > edge_chunk:
        n = E // edge_chunk

        def chunk(args):
            return masked_level0(*args).reshape(edge_chunk, P, P)

        lvl0 = jax.lax.map(
            chunk,
            (
                fmap1.reshape((n, edge_chunk) + fmap1.shape[1:]),
                fmap2.reshape((n, edge_chunk) + fmap2.shape[1:]),
                mean.reshape((n, edge_chunk) + mean.shape[1:]),
                cov.reshape((n, edge_chunk) + cov.shape[1:]),
                det.reshape((n, edge_chunk) + det.shape[1:]),
            ),
        ).reshape((E, P, P))
    else:
        lvl0 = masked_level0(fmap1, fmap2, mean, cov, det).reshape(E, P, P)

    if pack is None:
        pack = use_pallas  # inference on TPU; training passes pack=False

    # pooled levels (flat)
    levels = [lvl0]
    v = lvl0
    h2, w2 = H, W
    for _ in range(NUM_LEVELS - 1):
        ho, wo = h2 // 2, w2 // 2

        if pack:
            # inference path: pool in volume_dtype in one shot (the fp32
            # chunked variant below round-trips the 1.2 GB level through
            # fp32 under a lax.map and measured ~40 ms of the build)
            v = v.reshape(E, P, h2, w2)[..., : ho * 2, : wo * 2]
            v = v.reshape(E, P, ho, 2, wo, 2).mean(axis=(3, 5))
            v = v.reshape(E, P, ho * wo)
        else:
            def pool_flat(x, h2=h2, w2=w2, ho=ho, wo=wo):
                x = x.astype(jnp.float32).reshape(-1, P, h2, w2)
                x = x[..., : ho * 2, : wo * 2].reshape(-1, P, ho, 2, wo, 2)
                return x.mean(axis=(3, 5)).reshape(-1, P, ho * wo).astype(
                    volume_dtype
                )

            if E % edge_chunk == 0 and E > edge_chunk:
                n = E // edge_chunk
                v = jax.lax.map(
                    pool_flat, v.reshape((n, edge_chunk, P, h2 * w2))
                ).reshape((E, P, ho * wo))
            else:
                v = pool_flat(v)
        levels.append(v)
        h2, w2 = ho, wo

    if pack:
        # pack all levels row-padded [E, P1, S_l, 128] per level
        # for the fused Pallas pyramid lookup (paid once per pyramid
        # build, amortized over the 8/16 GRU iterations that look it up)
        from lgu_slam_tpu.ops.pallas_lookup import pack_pyramid  # noqa: PLC0415

        levels = list(pack_pyramid(levels, H, W))

    return CorrPyramid(tuple(levels), (off0, off1), mean, 2.0 * det)


def _tap_positions(cflat, offset, radius):
    """Absolute tap positions (px, py) [E, P1, K] from base coords and the
    (optionally zero) per-tap offsets, reproducing the center-tap zeroing."""
    rd = 2 * radius + 1
    dx, dy = _window_deltas(radius)
    if offset is None:
        px = cflat[..., 0:1] + dx
        py = cflat[..., 1:2] + dy
        return px, py
    center = jnp.zeros((rd, rd, 1), offset.dtype).at[radius, radius, 0].set(1.0)
    offset = offset - center * jax.lax.stop_gradient(offset)
    offset = jnp.clip(offset, -4.0, 4.0)
    off = offset.reshape(offset.shape[:2] + (rd * rd, 2))
    px = cflat[..., 0:1] + off[..., 0] + dx
    py = cflat[..., 1:2] + off[..., 1] + dy
    return px, py


def _window_deltas(radius):
    rd = 2 * radius + 1
    di = jnp.arange(rd, dtype=jnp.float32) - radius
    dx = jnp.repeat(di, rd)  # channel-major i*rd+j, i = x
    dy = jnp.tile(di, rd)
    return dx, dy


def corr_lookup(pyr: CorrPyramid, coords: jnp.ndarray) -> jnp.ndarray:
    """Deformable pyramid lookup (corr.py:88-109).

    coords: [E, H, W, 2] (x, y) at 1/8 resolution.
    Returns [E, H, W, 196] correlation features.

    Two equivalent execution paths selected by the pyramid storage layout:
    a packed whole-pyramid tensor (built on TPU) runs the single fused
    Pallas kernel (ops/pallas_lookup.py — probe + gate + 4 levels in one
    launch, forward-only); flat 3D levels (CPU, training) run the
    differentiable patch formulation (ops/sampler.py).
    """
    E, H, W, _ = coords.shape
    P1 = H * W
    dims = pyr.level_dims()
    cflat = coords.reshape(E, P1, 2)
    rd = 2 * RADIUS + 1
    off0 = pyr.offsets[0].reshape(E, P1, rd, rd, 2)
    off1 = pyr.offsets[1].reshape(E, P1, rd, rd, 2)

    if pyr.is_packed:
        from lgu_slam_tpu.ops.pallas_lookup import (  # noqa: PLC0415
            fused_pyramid_lookup,
        )

        feats = fused_pyramid_lookup(
            tuple(pyr.levels), cflat, off0, off1, H, W
        )
        return feats.reshape(E, H, W, 196)

    from lgu_slam_tpu.ops.sampler import sample_taps_patch_flat  # noqa: PLC0415

    # level-1 variance gate of the deformable offsets (corr.py:94-99)
    h1, w1 = dims[1]
    ppx, ppy = _tap_positions(cflat / 2.0, None, 1)
    probe = sample_taps_patch_flat(
        pyr.levels[1], h1, w1, cflat / 2.0, ppx, ppy, 1
    )
    var = jnp.var(probe, axis=-1, ddof=1)  # torch.var is unbiased
    gate = jax.nn.sigmoid(var)[..., None, None, None]  # [E, P1, 1,1,1]

    offs = (off0, off1 * gate, None, None)

    out = []
    for i in range(NUM_LEVELS):
        hh, ww = dims[i]
        px, py = _tap_positions(cflat / (2.0 ** i), offs[i], RADIUS)
        R = RADIUS + (4 if i < 2 else 0)
        c = sample_taps_patch_flat(
            pyr.levels[i], hh, ww, cflat / (2.0 ** i), px, py, R
        )
        out.append(c)  # [E, P1, 49]
    feats = jnp.concatenate(out, axis=-1)  # [E, P1, 196]
    return feats.reshape(E, H, W, 196)


# ---------------------------------------------------------------------------
# fused low-memory path (backend AltCorrBlock)
# ---------------------------------------------------------------------------

def default_use_volume() -> bool:
    """True on TPU: the low-memory path builds per-chunk MXU level
    volumes + the Pallas lookup; elsewhere the fused-tap (gather)
    formulation is used (and wants fp32 feature maps)."""
    dd = jax.config.jax_default_device
    platform = dd.platform if dd is not None else jax.default_backend()
    return platform == "tpu"


def build_fmap_pyramid(fmaps: jnp.ndarray):
    """Average-pool pyramid of feature maps (corr.py:164-172).

    fmaps: [N, H, W, C] -> tuple of [N, H/2^i, W/2^i, C], pre-scaled by 1/4.
    """
    levels = [fmaps / 4.0]
    x = levels[0]
    for _ in range(NUM_LEVELS - 1):
        n, h, w, c = x.shape
        x = x[:, : h // 2 * 2, : w // 2 * 2].reshape(
            n, h // 2, 2, w // 2, 2, c
        ).mean(axis=(2, 4))
        levels.append(x)
    return tuple(levels)


def _fused_tap_dot(f1, f2, px, py):
    """corr(b, y, x) = <f1[b,y,x], bilinear(f2)[b, py, px]> with the
    reference boundary rules (lowMem_defSample.cu).

    f1: [E, H1, W1, C]; f2: [E, H2, W2, C]; px/py: [E, H1, W1].
    """
    e, h2, w2, c = f2.shape
    x1 = jnp.floor(px)
    y1 = jnp.floor(py)
    dx = (px - x1)[..., None]
    dy = (py - y1)[..., None]
    x1 = x1.astype(jnp.int32)
    y1 = y1.astype(jnp.int32)
    base_ok = (x1 >= 0) & (x1 < w2) & (y1 >= 0) & (y1 < h2)

    f2f = f2.reshape(e, h2 * w2, c)

    def corner(iy, ix):
        ok = (iy >= 0) & (iy < h2) & (ix >= 0) & (ix < w2)
        idx = jnp.where(ok, iy * w2 + ix, 0)
        g = jnp.take_along_axis(
            f2f, idx.reshape(e, -1, 1), axis=1
        ).reshape(f1.shape[:3] + (c,))
        return g * ok[..., None]

    v = (
        corner(y1, x1) * (1 - dy) * (1 - dx)
        + corner(y1, x1 + 1) * (1 - dy) * dx
        + corner(y1 + 1, x1) * dy * (1 - dx)
        + corner(y1 + 1, x1 + 1) * dy * dx
    )
    out = jnp.sum(f1 * v, axis=-1)
    return jnp.where(base_ok, out, 0.0)


def alt_corr_level(
    f1: jnp.ndarray,
    f2_lvl: jnp.ndarray,
    coords_lvl: jnp.ndarray,
    offsets: jnp.ndarray,
    radius: int = RADIUS,
) -> jnp.ndarray:
    """Fused deformable correlation at one pyramid level.

    f1: [E, H1, W1, C] (level-0 features / 4); f2_lvl: [E, H2, W2, C];
    coords_lvl: [E, H1, W1, 2] in level pixels; offsets: [E,H1,W1,rd,rd,2].
    Returns [E, rd*rd, H1, W1].  Scans over taps to bound memory at
    4 corner-gathers of [E, H1, W1, C] per step.
    """
    rd = 2 * radius + 1
    # center tap offset forced to zero (value); gradient path not needed on
    # this no-grad backend path
    offsets = offsets.at[..., radius, radius, :].set(0.0)
    offs = offsets.reshape(offsets.shape[:3] + (rd * rd, 2))

    di = jnp.repeat(jnp.arange(rd) - radius, rd)  # x taps (channel i*rd+j)
    dj = jnp.tile(jnp.arange(rd) - radius, rd)

    def tap(k):
        px = coords_lvl[..., 0] + offs[..., k, 0] + di[k]
        py = coords_lvl[..., 1] + offs[..., k, 1] + dj[k]
        return _fused_tap_dot(f1, f2_lvl, px, py)

    out = jax.lax.map(tap, jnp.arange(rd * rd))  # [K, E, H1, W1]
    return out.transpose(1, 0, 2, 3)


def alt_corr_lookup(
    fmap_pyr,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    coords: jnp.ndarray,
    ofs_map_fn,
    ofs_residual_fn,
    use_volume: bool | None = None,
    sub_chunk: int = 8,
) -> jnp.ndarray:
    """Backend on-the-fly correlation features (corr.py:174-215).

    fmap_pyr: tuple of [N, H/2^i, W/2^i, C] (from build_fmap_pyramid);
    ii/jj: [E] frame indices (already rig-expanded by the caller);
    coords: [E, H, W, 2].  Returns [E, H, W, 196].

    Two execution strategies with identical math (pooling commutes with
    the feature dot: <f1, pool(f2)[tap]> == pool-over-targets(volume)[tap]):

    - **fused taps** (CPU / training oracle): per-tap bilinear feature dot
      — the direct analog of lowMem_defSample.cu.  On TPU this formulation
      is pathological (4 data-dependent XLA gathers per tap, lax.map over
      196 taps).
    - **chunked volume** (TPU): per sub-chunk of edges, build each pyramid
      level's correlation plane directly as one MXU matmul against the
      *pooled* f2 maps (no O(N H^2 W^2) global volume, no volume pooling),
      then run the packed Pallas window lookup.  Transients are bounded by
      sub_chunk * P1 * P2 bf16 (~150 MB at reference scale).
    """
    if use_volume is None:
        use_volume = default_use_volume()
    if use_volume:
        return _alt_corr_lookup_volume(
            fmap_pyr, ii, jj, coords, ofs_map_fn, ofs_residual_fn,
            sub_chunk=sub_chunk,
        )

    f1 = fmap_pyr[0][ii]  # [E, H, W, C], scaled by 1/4
    # offsets from the *unscaled* feature pair (corr.py:177-189 multiplies
    # the /4 pyramid back by 4)
    t = jnp.concatenate([f1 * 4.0, fmap_pyr[0][jj] * 4.0], axis=-1)
    off0, off1 = fpn_offsets(ofs_map_fn, ofs_residual_fn, t)

    # level-1 variance gate via plain 3x3 fused correlation (corr.py:201-206)
    f2_l1 = fmap_pyr[1][jj]
    zeros9 = jnp.zeros(coords.shape[:3] + (3, 3, 2), coords.dtype)
    probe = alt_corr_level(f1, f2_l1, coords / 2.0, zeros9, radius=1)
    var = jnp.var(probe.transpose(0, 2, 3, 1), axis=-1, ddof=1)
    gate = jax.nn.sigmoid(var)[..., None, None, None]

    offs = (off0, off1 * gate, jnp.zeros_like(off0), jnp.zeros_like(off0))

    out = []
    for lvl in range(NUM_LEVELS):
        f2 = fmap_pyr[lvl][jj]
        c = alt_corr_level(f1, f2, coords / (2.0 ** lvl), offs[lvl])
        out.append(c)
    feats = jnp.concatenate(out, axis=1)
    return feats.transpose(0, 2, 3, 1)


def _alt_corr_lookup_volume(
    fmap_pyr,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    coords: jnp.ndarray,
    ofs_map_fn,
    ofs_residual_fn,
    volume_dtype=jnp.bfloat16,
    sub_chunk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """TPU strategy for :func:`alt_corr_lookup` (see its docstring)."""
    from lgu_slam_tpu.ops.pallas_lookup import (  # noqa: PLC0415
        fused_pyramid_lookup, pack_pyramid,
    )

    E = ii.shape[0]
    H, W = coords.shape[1:3]
    P1 = H * W
    rd = 2 * RADIUS + 1

    f1 = fmap_pyr[0][ii]  # [E, H, W, C] (/4)
    t = jnp.concatenate([f1 * 4.0, fmap_pyr[0][jj] * 4.0], axis=-1)
    off0, off1 = fpn_offsets(ofs_map_fn, ofs_residual_fn, t)

    SC = sub_chunk
    while E % SC:
        SC //= 2
    n = E // SC
    cflat = coords.reshape(E, P1, 2)
    dims = [lvl.shape[1:3] for lvl in fmap_pyr]

    def group(args):
        f1g, jg, cg, o0g, o1g = args
        f1f = f1g.reshape(SC, P1, -1)

        def level_volume(lvl):
            h2, w2 = dims[lvl]
            f2 = fmap_pyr[lvl][jg].reshape(SC, h2 * w2, -1)
            return jnp.einsum(
                "epc,eqc->epq", f1f, f2,
                preferred_element_type=jnp.float32,
            ).astype(volume_dtype)

        packed = pack_pyramid(
            [level_volume(lvl) for lvl in range(NUM_LEVELS)], H, W
        )
        return fused_pyramid_lookup(
            packed, cg,
            o0g.reshape(SC, P1, rd, rd, 2),
            o1g.reshape(SC, P1, rd, rd, 2),
            H, W, interpret=interpret,
        )  # [SC, P1, 196]

    feats = jax.lax.map(
        group,
        (
            f1.reshape((n, SC) + f1.shape[1:]),
            jj.reshape(n, SC),
            cflat.reshape(n, SC, P1, 2),
            off0.reshape((n, SC) + off0.shape[1:]),
            off1.reshape((n, SC) + off1.shape[1:]),
        ),
    ).reshape(E, P1, 4 * rd * rd)
    return feats.reshape(E, H, W, 4 * rd * rd)
