"""Oracle tests for correlation sampling ops against naive NumPy loops
implementing the exact CUDA kernel semantics (defCorrSample_kernel.cu,
gaussianAttn.cu, lowMem_defSample.cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.models.corr import (
    all_pairs_correlation,
    alt_corr_level,
)
from lgu_slam_tpu.ops.sampler import (
    corr_index,
    defcorr_index,
    gaussian_window_mask,
)


def naive_defcorr(volume, coords, offset, r):
    """Direct transcription of defCorr_index_forward_kernel semantics."""
    B, H1, W1, H2, W2 = volume.shape
    rd = 2 * r + 1
    out = np.zeros((B, rd, rd, H1, W1), np.float32)
    off = offset.copy()
    off[:, :, :, r, r, :] = 0.0
    for n in range(B):
        for y in range(H1):
            for x in range(W1):
                x0, y0 = coords[n, y, x]
                for i in range(rd):
                    for j in range(rd):
                        ofsX = off[n, y, x, i, j, 0] + x0
                        ofsY = off[n, y, x, i, j, 1] + y0
                        fx, fy = np.floor(ofsX), np.floor(ofsY)
                        dx, dy = ofsX - fx, ofsY - fy
                        x1 = int(fx) - r + i
                        y1 = int(fy) - r + j
                        x2, y2 = x1 + 1, y1 + 1
                        if 0 <= y1 < H2 and 0 <= x1 < W2:
                            q11 = volume[n, y, x, y1, x1]
                            q21 = volume[n, y, x, y1, x2] if x2 < W2 else 0.0
                            q12 = volume[n, y, x, y2, x1] if y2 < H2 else 0.0
                            q22 = (
                                volume[n, y, x, y2, x2]
                                if (y2 < H2 and x2 < W2)
                                else 0.0
                            )
                            out[n, i, j, y, x] = (
                                q11 * (1 - dy) * (1 - dx)
                                + q21 * (1 - dy) * dx
                                + q12 * dy * (1 - dx)
                                + q22 * dy * dx
                            )
    return out.reshape(B, rd * rd, H1, W1)


def naive_gaussian_mask(volume, means, covs, r):
    """Transcription of gaussianMask_kernel (gaussianAttn.cu:20-68)."""
    B, H1, W1, H2, W2 = volume.shape
    out = np.zeros_like(volume)
    rd = 2 * r + 1
    for n in range(B):
        for y in range(H1):
            for x in range(W1):
                mx, my = means[n, y, x]
                c1, c2 = covs[n, y, x]
                cx, cy = int(np.floor(mx)), int(np.floor(my))
                for i in range(rd):
                    for j in range(rd):
                        x1 = cx - r + i
                        y1 = cy - r + j
                        if 0 <= y1 < H2 and 0 <= x1 < W2:
                            f = -0.5 * (
                                (x1 - mx) ** 2 / c1 + (y1 - my) ** 2 / c2
                            )
                            out[n, y, x, y1, x1] = (
                                volume[n, y, x, y1, x1] * 3 * np.exp(f)
                            )
    return out


def test_defcorr_index_matches_naive(rng):
    B, H1, W1, H2, W2, r = 2, 4, 5, 6, 7, 2
    volume = rng.normal(size=(B, H1, W1, H2, W2)).astype(np.float32)
    coords = (
        rng.random(size=(B, H1, W1, 2)).astype(np.float32)
        * np.array([W2 + 2, H2 + 2], np.float32)
        - 1.0
    )
    offset = rng.normal(size=(B, H1, W1, 5, 5, 2)).astype(np.float32)

    out = defcorr_index(
        jnp.asarray(volume), jnp.asarray(coords), jnp.asarray(offset), r
    )
    ref = naive_defcorr(volume, coords, offset, r)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_corr_index_is_defcorr_with_zero_offsets(rng):
    B, H1, W1, H2, W2, r = 1, 3, 4, 5, 6, 1
    volume = rng.normal(size=(B, H1, W1, H2, W2)).astype(np.float32)
    coords = rng.random(size=(B, H1, W1, 2)).astype(np.float32) * 4
    out1 = corr_index(jnp.asarray(volume), jnp.asarray(coords), r)
    out2 = defcorr_index(
        jnp.asarray(volume), jnp.asarray(coords),
        jnp.zeros((B, H1, W1, 3, 3, 2)), r,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_gaussian_window_mask_matches_naive(rng):
    B, H1, W1, H2, W2, r = 2, 3, 4, 9, 11, 4
    volume = rng.normal(size=(B, H1, W1, H2, W2)).astype(np.float32)
    means = (
        rng.random(size=(B, H1, W1, 2)).astype(np.float32)
        * np.array([W2, H2], np.float32)
    )
    covs = (0.1 + 5 * rng.random(size=(B, H1, W1, 2))).astype(np.float32)
    out = gaussian_window_mask(
        jnp.asarray(volume), jnp.asarray(means), jnp.asarray(covs), r
    )
    ref = naive_gaussian_mask(volume, means, covs, r)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gaussian_mask_gradients_finite(rng):
    B, H1, W1, H2, W2 = 1, 2, 3, 5, 5
    volume = jnp.asarray(rng.normal(size=(B, H1, W1, H2, W2)), jnp.float32)
    means = jnp.asarray(rng.random(size=(B, H1, W1, 2)) * 4, jnp.float32)
    covs = jnp.asarray(0.5 + rng.random(size=(B, H1, W1, 2)), jnp.float32)

    def loss(m, c):
        return jnp.sum(gaussian_window_mask(volume, m, c, 2))

    gm, gc = jax.grad(loss, argnums=(0, 1))(means, covs)
    assert np.all(np.isfinite(np.asarray(gm)))
    assert np.all(np.isfinite(np.asarray(gc)))
    assert float(jnp.abs(gc).max()) > 0


def test_defcorr_center_tap_straight_through(rng):
    """Center-tap offset has zero value effect but non-zero gradient."""
    B, H1, W1, H2, W2, r = 1, 2, 2, 6, 6, 1
    volume = jnp.asarray(rng.normal(size=(B, H1, W1, H2, W2)), jnp.float32)
    coords = jnp.asarray(rng.random(size=(B, H1, W1, 2)) * 3 + 1, jnp.float32)
    offset = jnp.asarray(rng.normal(size=(B, H1, W1, 3, 3, 2)), jnp.float32)

    out1 = defcorr_index(volume, coords, offset, r)
    offset2 = offset.at[..., r, r, :].set(5.0)
    out2 = defcorr_index(volume, coords, offset2, r)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    g = jax.grad(lambda o: jnp.sum(defcorr_index(volume, coords, o, r)))(
        offset
    )
    # gradients exist for the center tap (straight-through, CUDA parity)
    assert float(jnp.abs(np.asarray(g)[..., r, r, :]).sum()) > 0


def test_alt_corr_matches_volume_path(rng):
    """Fused low-memory sampling == materialized-volume deformable lookup."""
    E, H, W, C, r = 2, 6, 8, 16, 3
    f1 = rng.normal(size=(E, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(E, H, W, C)).astype(np.float32)
    coords = (
        rng.random(size=(E, H, W, 2)).astype(np.float32)
        * np.array([W - 1, H - 1], np.float32)
    )
    offset = rng.normal(size=(E, H, W, 7, 7, 2)).astype(np.float32)

    volume = all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    ref = defcorr_index(volume, jnp.asarray(coords), jnp.asarray(offset), r)

    out = alt_corr_level(
        jnp.asarray(f1) / 4.0,
        jnp.asarray(f2) / 4.0,
        jnp.asarray(coords),
        jnp.asarray(offset),
        radius=r,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_patch_sampler_matches_gather(rng):
    """Patch fast path (one-hot extraction + separable tents) == the
    gather-formulation oracle, including boundary zeroing and gradients."""
    import jax

    from lgu_slam_tpu.ops.sampler import (
        corr_index_flat,
        corr_index_patch_flat,
        defcorr_index_flat,
        defcorr_index_patch_flat,
    )

    B, H2, W2, P1, r = 3, 12, 16, 20, 3
    vol = jnp.asarray(rng.normal(size=(B, P1, H2 * W2)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(-3, 1, size=(B, P1, 2)) * np.asarray([W2, H2]),
        jnp.float32,
    )
    a = corr_index_flat(vol, H2, W2, coords, r)
    b = corr_index_patch_flat(vol, H2, W2, coords, r)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # integer coords hit the tent kinks exactly
    ci = jnp.floor(coords)
    a = corr_index_flat(vol, H2, W2, ci, r)
    b = corr_index_patch_flat(vol, H2, W2, ci, r)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    off = jnp.asarray(rng.uniform(-4, 4, size=(B, P1, 7, 7, 2)), jnp.float32)
    a = defcorr_index_flat(vol, H2, W2, coords, off, r)
    b = defcorr_index_patch_flat(vol, H2, W2, coords, off, r)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    g1 = jax.grad(
        lambda c, o: jnp.sum(defcorr_index_flat(vol, H2, W2, c, o, r) ** 2),
        argnums=(0, 1),
    )(coords, off)
    g2 = jax.grad(
        lambda c, o: jnp.sum(
            defcorr_index_patch_flat(vol, H2, W2, c, o, r) ** 2
        ),
        argnums=(0, 1),
    )(coords, off)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_alt_corr_volume_strategy_matches_fused(rng):
    """The TPU backend strategy (_alt_corr_lookup_volume: per-sub-chunk MXU
    level volumes + packed Pallas lookups, interpret mode here) must equal
    the fused-tap oracle path of alt_corr_lookup across the full 4-level
    output, including the variance gate and center-tap zeroing."""
    from lgu_slam_tpu.models.corr import (
        _alt_corr_lookup_volume,
        alt_corr_lookup,
        build_fmap_pyramid,
    )

    N, H, W, C = 5, 12, 16, 32
    E = 4
    fmaps = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.float32)
    pyr = build_fmap_pyramid(fmaps)
    ii = jnp.asarray([0, 2, 4, 1], jnp.int32)
    jj = jnp.asarray([1, 0, 3, 4], jnp.int32)
    coords = jnp.asarray(
        rng.uniform(-1, 1.1, size=(E, H, W, 2))
        * np.asarray([W, H], np.float32),
        jnp.float32,
    )

    # stand-in conv heads (random linear maps), shapes as the real FPN
    k0 = jnp.asarray(rng.normal(size=(2 * C, 98)) * 0.2, jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(2 * C, 98)) * 0.2, jnp.float32)
    ofs_map = lambda t: t @ k0  # noqa: E731
    ofs_res = lambda t: t @ k1  # noqa: E731

    ref = alt_corr_lookup(
        pyr, ii, jj, coords, ofs_map, ofs_res, use_volume=False
    )
    out = _alt_corr_lookup_volume(
        pyr, ii, jj, coords, ofs_map, ofs_res,
        volume_dtype=jnp.float32, sub_chunk=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-4
    )
