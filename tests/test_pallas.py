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
