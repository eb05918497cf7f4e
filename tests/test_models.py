"""Model component tests: encoder shapes, KAN vs NumPy oracle, GRU, update
module, corr pyramid, convex upsampling, and a tiny end-to-end training
forward of LGUNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgu_slam_tpu import lie
from lgu_slam_tpu.models.extractor import BasicEncoder
from lgu_slam_tpu.models.gru import ConvGRU, KanBiasConvGRU
from lgu_slam_tpu.models.kan import KANLinear, bspline_bases
from lgu_slam_tpu.models.net import LGUNet
from lgu_slam_tpu.models.update import UpdateModule, cvx_upsample


def test_basic_encoder_shapes(rng):
    m = BasicEncoder(output_dim=128, norm_fn="instance")
    x = jnp.asarray(rng.normal(size=(2, 64, 80, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 10, 128)
    assert np.all(np.isfinite(np.asarray(y)))


def test_bspline_bases_partition_of_unity(rng):
    """Cubic B-spline bases sum to 1 inside the core grid interval."""
    I, G, K = 4, 3, 3
    h = 2.0 / G
    grid = jnp.asarray(
        np.tile(np.arange(-K, G + K + 1) * h - 1.0, (I, 1)).astype(np.float32)
    )
    x = jnp.asarray(rng.uniform(-0.99, 0.99, size=(16, I)), jnp.float32)
    bases = bspline_bases(x, grid, K)
    assert bases.shape == (16, I, G + K)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(bases, -1)), 1.0, atol=1e-4
    )


def test_kan_linear_forward(rng):
    m = KANLinear(8, 16, grid_size=3)
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (5, 16)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)


@pytest.mark.parametrize("cls", [KanBiasConvGRU, ConvGRU])
def test_gru_shapes(cls, rng):
    m = cls(128, 320)
    net = jnp.tanh(jnp.asarray(rng.normal(size=(2, 6, 8, 128)), jnp.float32))
    inp = jnp.asarray(rng.normal(size=(2, 6, 8, 128)), jnp.float32)
    cor = jnp.asarray(rng.normal(size=(2, 6, 8, 128)), jnp.float32)
    flo = jnp.asarray(rng.normal(size=(2, 6, 8, 64)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), net, inp, cor, flo)
    out = m.apply(params, net, inp, cor, flo)
    assert out.shape == net.shape
    # convex combination of tanh(q) and a state already in [-1, 1]
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_cvx_upsample_constant_field(rng):
    data = jnp.ones((1, 4, 5, 1)) * 3.25
    mask = jnp.asarray(rng.normal(size=(1, 4, 5, 9 * 64)), jnp.float32)
    up = cvx_upsample(data, mask)
    assert up.shape == (1, 32, 40, 1)
    # interior of a constant field must stay constant under any convex mask
    np.testing.assert_allclose(
        np.asarray(up[:, 8:-8, 8:-8]), 3.25, atol=1e-5
    )


def test_update_module_shapes(rng):
    m = UpdateModule()
    B, E, H, W, N = 1, 4, 6, 8, 5
    net = jnp.asarray(rng.normal(size=(B, E, H, W, 128)), jnp.float32)
    inp = jnp.asarray(rng.normal(size=(B, E, H, W, 128)), jnp.float32)
    corr = jnp.asarray(rng.normal(size=(B, E, H, W, 196)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(B, E, H, W, 4)), jnp.float32)
    ii = jnp.asarray([0, 1, 2, 3])
    params = m.init(jax.random.PRNGKey(0), net, inp, corr, flow, ii, N)
    net2, delta, weight, eta, upmask, fmask = m.apply(
        params, net, inp, corr, flow, ii, N
    )
    assert net2.shape == net.shape
    assert delta.shape == (B, E, H, W, 2)
    assert weight.shape == (B, E, H, W, 2)
    assert float(weight.min()) >= 0 and float(weight.max()) <= 1
    assert eta.shape == (B, N, H, W)
    assert float(eta.min()) >= 0  # 0.01 * softplus
    assert upmask.shape == (B, N, H, W, 576)
    assert np.asarray(fmask).tolist() == [True, True, True, True, False]


def test_lgunet_corr_and_update_paths(rng):
    """Build pyramid -> lookup -> update step through bound LGUNet methods."""
    net = LGUNet()
    B, N, H, W = 1, 3, 64, 64
    images = jnp.asarray(rng.integers(0, 255, size=(B, N, H, W, 3)), jnp.float32)
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 2, 0])
    Gs = jnp.broadcast_to(lie.se3_identity(), (B, N, 7))
    disps = jnp.ones((B, N, 8, 8), jnp.float32)
    intr = jnp.broadcast_to(
        jnp.asarray([10.0, 10.0, 4.0, 4.0]), (B, N, 4)
    )
    params = net.init(
        jax.random.PRNGKey(0), Gs, images, disps, intr, ii, jj, 2, 1
    )
    poses, disps_up, resid, nll = net.apply(
        params, Gs, images, disps, intr, ii, jj, 2, 1
    )
    assert len(poses) == 2 and len(disps_up) == 2
    assert poses[0].shape == (B, N, 7)
    assert disps_up[0].shape == (B, N, 64, 64)
    assert resid[0].shape == (B, 3, 8, 8, 2)
    assert np.all(np.isfinite(np.asarray(poses[-1])))
    assert np.all(np.isfinite(np.asarray(disps_up[-1])))
    assert np.isfinite(float(nll))
