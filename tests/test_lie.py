"""Oracle tests for the SE(3)/Sim(3) library against NumPy matrix math."""

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie


def random_se3(rng, n=8, scale=1.0):
    w = rng.normal(size=(n, 3)) * scale
    v = rng.normal(size=(n, 3)) * scale
    return lie.se3_exp(jnp.asarray(np.concatenate([v, w], -1), jnp.float32))


def np_quat_to_R(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def test_quat_rotate_matches_matrix(rng):
    g = np.asarray(random_se3(rng))
    v = rng.normal(size=(8, 3)).astype(np.float32)
    out = np.asarray(lie.quat_rotate(jnp.asarray(g[:, 3:]), jnp.asarray(v)))
    ref = np.einsum("nij,nj->ni", np_quat_to_R(g[:, 3:]), v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_so3_matrix_consistency(rng):
    g = np.asarray(random_se3(rng))
    R = np.asarray(lie.so3_matrix(jnp.asarray(g[:, 3:])))
    np.testing.assert_allclose(R, np_quat_to_R(g[:, 3:]), atol=1e-5)
    # orthonormality
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.broadcast_to(np.eye(3), R.shape), atol=1e-5
    )


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.7
    g = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(g))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_exp_log_small_angle(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 1e-6
    g = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(g))
    np.testing.assert_allclose(xi2, xi, atol=1e-9)


def test_mul_inv_identity(rng):
    g = random_se3(rng)
    gi = lie.se3_inv(g)
    e = np.asarray(lie.se3_mul(g, gi))
    np.testing.assert_allclose(e[:, :3], 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(e[:, 6]), 1, atol=1e-5)
    np.testing.assert_allclose(e[:, 3:6], 0, atol=1e-5)


def test_mul_matches_matrix(rng):
    g1, g2 = random_se3(rng), random_se3(rng)
    T = np.asarray(lie.se3_matrix(lie.se3_mul(g1, g2)))
    Tref = np.asarray(lie.se3_matrix(g1)) @ np.asarray(lie.se3_matrix(g2))
    np.testing.assert_allclose(T, Tref, atol=1e-5)


def test_act_matches_matrix(rng):
    g = random_se3(rng)
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    out = np.asarray(lie.se3_act(g, x))
    T = np.asarray(lie.se3_matrix(g))
    ref = np.einsum("nij,nj->ni", T[:, :3, :3], np.asarray(x)) + T[:, :3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_act4_carries_inverse_depth(rng):
    g = random_se3(rng)
    X = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    out = np.asarray(lie.se3_act4(g, X))
    T = np.asarray(lie.se3_matrix(g))
    ref3 = np.einsum("nij,nj->ni", T[:, :3, :3], np.asarray(X[:, :3]))
    ref3 = ref3 + np.asarray(X[:, 3:4]) * T[:, :3, 3]
    np.testing.assert_allclose(out[:, :3], ref3, atol=1e-5)
    np.testing.assert_allclose(out[:, 3], np.asarray(X)[:, 3], atol=1e-6)


def test_retr_is_left_multiplication(rng):
    g = random_se3(rng)
    xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.1, jnp.float32)
    out = lie.se3_retr(g, xi)
    ref = lie.se3_mul(lie.se3_exp(xi), g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_adjT_identity(rng):
    """Verify <Ad^T x, y> = <x, Ad y> numerically via the matrix adjoint."""
    g = np.asarray(random_se3(rng, n=4))
    T = np.asarray(lie.se3_matrix(jnp.asarray(g)))
    R, t = T[:, :3, :3], T[:, :3, 3]

    def hat(v):
        o = np.zeros_like(v[..., 0])
        return np.stack(
            [
                np.stack([o, -v[..., 2], v[..., 1]], -1),
                np.stack([v[..., 2], o, -v[..., 0]], -1),
                np.stack([-v[..., 1], v[..., 0], o], -1),
            ],
            -2,
        )

    Ad = np.zeros((4, 6, 6))
    Ad[:, :3, :3] = R
    Ad[:, :3, 3:] = np.einsum("nij,njk->nik", hat(t), R)
    Ad[:, 3:, 3:] = R

    x = np.random.default_rng(1).normal(size=(4, 6)).astype(np.float32)
    out = np.asarray(lie.se3_adjT_apply(jnp.asarray(g), jnp.asarray(x)))
    ref = np.einsum("nji,nj->ni", Ad, x)  # Ad^T x
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sim3_roundtrip(rng):
    from lgu_slam_tpu.lie import sim3_act, sim3_inv, sim3_mul

    g = np.asarray(random_se3(rng))
    s = np.abs(rng.normal(size=(8, 1))).astype(np.float32) + 0.5
    G = jnp.asarray(np.concatenate([g, s], -1))
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    y = sim3_act(G, x)
    x2 = sim3_act(sim3_inv(G), y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    e = np.asarray(sim3_mul(G, sim3_inv(G)))
    np.testing.assert_allclose(e[:, :3], 0, atol=1e-5)
    np.testing.assert_allclose(e[:, 7], 1, atol=1e-5)


def test_jit_and_grad():
    xi = jnp.ones((6,)) * 0.1

    @jax.jit
    def f(xi):
        g = lie.se3_exp(xi)
        return jnp.sum(lie.se3_act(g, jnp.ones(3)))

    v, grad = jax.value_and_grad(f)(xi)
    assert np.isfinite(np.asarray(v))
    assert np.all(np.isfinite(np.asarray(grad)))
