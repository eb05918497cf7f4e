"""Pallas kernel equivalence tests (interpret mode on CPU; the same kernel
compiles for TPU)."""

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.models.corr import all_pairs_correlation
from lgu_slam_tpu.ops.pallas_corr import masked_corr_level0
from lgu_slam_tpu.ops.sampler import gaussian_window_mask


def reference_masked_corr(f1, f2, mean, cov, radius=4):
    corr = all_pairs_correlation(f1, f2)
    masked = gaussian_window_mask(corr, mean, cov, radius)
    det = cov[..., 0] * cov[..., 1]
    denom = 6.28 * jnp.sqrt(det)[..., None, None]
    return masked / denom + corr


def test_masked_corr_kernel_matches_reference(rng):
    E, H, W, C = 2, 8, 16, 128
    f1 = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    mean = jnp.asarray(
        rng.random(size=(E, H, W, 2)) * np.asarray([W, H]), jnp.float32
    )
    cov = jnp.asarray(0.1 + 5 * rng.random(size=(E, H, W, 2)), jnp.float32)

    ref = reference_masked_corr(f1, f2, mean, cov)
    out = masked_corr_level0(
        f1, f2, mean, cov, out_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


def test_masked_corr_kernel_bf16_close(rng):
    E, H, W, C = 1, 8, 16, 128
    f1 = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    mean = jnp.asarray(
        rng.random(size=(E, H, W, 2)) * np.asarray([W, H]), jnp.float32
    )
    cov = jnp.asarray(0.5 + rng.random(size=(E, H, W, 2)), jnp.float32)

    ref = reference_masked_corr(f1, f2, mean, cov)
    out = masked_corr_level0(
        f1, f2, mean, cov, out_dtype=jnp.bfloat16, interpret=True
    ).astype(jnp.float32)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err / (np.abs(np.asarray(ref)) + 1.0)
    assert rel.max() < 0.02


def test_window_lookup_kernel_matches_oracle(rng):
    """Pallas window/dense lookup kernels (interpret mode) == the gather
    oracle across level geometries, including OOB taps."""
    from lgu_slam_tpu.ops.pallas_lookup import (
        dense_lookup_packed,
        pack_level,
        pad_w2,
        pick_ns,
        window_lookup_packed,
    )
    from lgu_slam_tpu.ops.sampler import sample_taps_flat

    def check(H2, W2, r, max_off, dense=False, P1=16, E=2):
        Rh = r + max_off
        rd = 2 * r + 1
        K = rd * rd
        vol = jnp.asarray(rng.normal(size=(E, P1, H2 * W2)), jnp.float32)
        base = jnp.asarray(
            rng.uniform(-2, 1.2, size=(E, P1, 2)) * np.asarray([W2, H2]),
            jnp.float32,
        )
        off = jnp.asarray(
            rng.uniform(-max_off, max_off, size=(E, P1, K, 2)), jnp.float32
        )
        d = np.stack(
            np.meshgrid(np.arange(rd) - r, np.arange(rd) - r, indexing="ij"),
            -1,
        ).reshape(K, 2).astype(np.float32)
        px = base[..., 0:1] + off[..., 0] + d[:, 0]
        py = base[..., 1:2] + off[..., 1] + d[:, 1]
        ref = sample_taps_flat(vol, H2, W2, px, py)
        W2p = pad_w2(W2)
        NS = pick_ns(2 * Rh + 2, 128 // W2p)
        vol4, _ = pack_level(vol, H2, W2, NS)
        if dense:
            out = dense_lookup_packed(
                vol4, px, py, H2, W2, W2p, interpret=True, tile_p=8
            )
        else:
            out = window_lookup_packed(
                vol4, px, py, H2, W2, W2p, NS, interpret=True, tile_p=8
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4,
            err_msg=f"H2={H2} W2={W2} r={r} off={max_off}",
        )

    check(48, 64, 3, 4)          # level 0 deformable
    check(24, 32, 3, 4)          # level 1 deformable
    check(12, 16, 3, 0)          # level 2 plain
    check(6, 8, 3, 0, dense=True)  # level 3 dense variant
    check(24, 32, 1, 0)          # variance probe
    check(13, 17, 3, 4)          # odd (TUM-like) sizes


def test_fused_pyramid_lookup_matches_flat_path(rng):
    """One-kernel fused lookup (probe + gate + 4 levels, interpret mode)
    == the differentiable flat-path corr_lookup across geometries."""
    from lgu_slam_tpu.models.corr import CorrPyramid, corr_lookup
    from lgu_slam_tpu.ops.pallas_lookup import (
        fused_pyramid_lookup,
        pack_pyramid,
    )

    def check(H, W, E=2):
        P1 = H * W
        dims = []
        h2, w2 = H, W
        for _ in range(4):
            dims.append((h2, w2))
            h2, w2 = h2 // 2, w2 // 2
        levels = [
            jnp.asarray(rng.normal(size=(E, P1, a * b)), jnp.float32)
            for a, b in dims
        ]
        off0 = jnp.asarray(
            rng.uniform(-4, 4, size=(E, H, W, 7, 7, 2)), jnp.float32
        )
        off1 = jnp.asarray(
            rng.uniform(-4, 4, size=(E, H, W, 7, 7, 2)), jnp.float32
        )
        mean = jnp.zeros((E, H, W, 2), jnp.float32)
        theta = jnp.ones((E, H, W), jnp.float32)
        coords = jnp.asarray(
            rng.uniform(-0.2, 1.2, size=(E, H, W, 2))
            * np.asarray([W, H], np.float32),
            jnp.float32,
        )

        pyr = CorrPyramid(tuple(levels), (off0, off1), mean, theta)
        ref = corr_lookup(pyr, coords)  # flat differentiable path

        packed = pack_pyramid(levels, H, W)
        out = fused_pyramid_lookup(
            tuple(packed), coords.reshape(E, P1, 2),
            off0.reshape(E, P1, 7, 7, 2), off1.reshape(E, P1, 7, 7, 2),
            H, W, interpret=True, tile_p=8,
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(E, H, W, 196), np.asarray(ref),
            atol=2e-4, err_msg=f"H={H} W={W}",
        )

    check(16, 16)
    check(12, 24)   # odd halving chain + padding
