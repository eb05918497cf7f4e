"""Optimizer-state checkpoint/resume (scripts/train.py): killing and
restoring mid-run must reproduce the uninterrupted trajectory exactly —
params, Adam moments, and the OneCycle schedule position (the optax step
counter inside opt_state).  The reference saves params only
(train.py:181-184) and silently restarts its LR schedule."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lgu_slam_tpu import lie  # noqa: E402
from lgu_slam_tpu.models.net import LGUNet  # noqa: E402
from lgu_slam_tpu.parallel.train_dp import (  # noqa: E402
    make_data_mesh,
    make_optimizer,
    make_train_step,
    replicate,
    shard_batch,
)
from lgu_slam_tpu.utils.checkpoint import (  # noqa: E402
    load_train_state,
    save_train_state,
)
from lgu_slam_tpu.utils.config import SLAMConfig, TrainConfig  # noqa: E402


def _make_batch(rng, B, N, H, W):
    images = rng.integers(0, 255, size=(B, N, H, W, 3)).astype(np.float32)
    xi = np.cumsum(rng.normal(size=(B, N, 6)) * 0.01, axis=1).astype(
        np.float32
    )
    poses = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    disps = (0.5 + rng.random((B, N, H, W))).astype(np.float32)
    intr = np.broadcast_to(
        np.asarray([W * 2.0, W * 2.0, W / 2.0, H / 2.0], np.float32),
        (B, N, 4),
    ).copy()
    return images, poses, disps, intr


def test_kill_and_resume_reproduces_run(tmp_path):
    B, N, H, W = 8, 3, 64, 64
    tcfg = TrainConfig(batch=B, iters=2, steps=50, lr=1e-3, n_frames=N,
                       image_size=(H, W))
    from lgu_slam_tpu.slam.system import init_params

    net, params0 = init_params(SLAMConfig(image_size=(H, W)), seed=0)
    tx = make_optimizer(tcfg)
    mesh = make_data_mesh()

    ii = np.asarray([0, 1, 1, 2], np.int32)
    jj = np.asarray([1, 0, 2, 1], np.int32)
    step_fn = make_train_step(net, tx, tcfg, ii, jj)

    rng = np.random.default_rng(0)
    batches = [
        shard_batch(_make_batch(rng, B, N, H, W), mesh) for _ in range(4)
    ]
    Gs0 = np.zeros((B, N, 7), np.float32)
    disp0 = np.zeros((B, N, H // 8, W // 8), np.float32)

    # uninterrupted: 4 steps
    params = replicate(params0, mesh)
    opt_state = tx.init(params)
    metrics_straight = []
    for b in batches:
        params, opt_state, m, _ = step_fn(params, opt_state, b, Gs0, disp0)
        metrics_straight.append(float(m["loss"]))
    params_straight = jax.device_get(params)

    # interrupted: 2 steps, save, "kill", restore, 2 more steps
    params = replicate(params0, mesh)
    opt_state = tx.init(params)
    for b in batches[:2]:
        params, opt_state, m, _ = step_fn(params, opt_state, b, Gs0, disp0)
    ckpt = tmp_path / "ckpt.pkl"
    save_train_state(str(ckpt), params, opt_state, 2,
                     rng.bit_generator.state)
    del params, opt_state

    params_r, opt_r, step_r, rng_state = load_train_state(str(ckpt))
    assert step_r == 2
    assert rng_state is not None
    params = replicate(params_r, mesh)
    opt_state = replicate(opt_r, mesh)
    metrics_resumed = []
    for b in batches[2:]:
        params, opt_state, m, _ = step_fn(params, opt_state, b, Gs0, disp0)
        metrics_resumed.append(float(m["loss"]))
    params_resumed = jax.device_get(params)

    np.testing.assert_allclose(
        metrics_resumed, metrics_straight[2:], rtol=1e-6
    )
    flat_s = jax.tree_util.tree_leaves(params_straight)
    flat_r = jax.tree_util.tree_leaves(params_resumed)
    for a, b in zip(flat_s, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_legacy_params_only_checkpoint(tmp_path):
    """Old {"params": ...} pickles still load (opt_state/step default)."""
    import pickle

    path = tmp_path / "legacy.pkl"
    with open(path, "wb") as f:
        pickle.dump({"params": {"w": np.ones(3)}}, f)
    params, opt_state, step, rng_state = load_train_state(str(path))
    assert opt_state is None and step == 0 and rng_state is None
    np.testing.assert_array_equal(params["w"], np.ones(3))
