"""Training-step sanity on synthetic data (VERDICT r4 missing #1).

Regression for the NaN-gradient bug (safe norms in geom/losses.py +
net.py NLL): gradients at init must be finite for every loss term, and a
few real optimizer steps must keep everything finite while changing the
parameters.  The *convergence* proof (loss/flow-EPE decrease over
hundreds of steps + trained-vs-random holdout ATE) is
scripts/train_synthetic.py; its numbers are pinned in BASELINE.md.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lgu_slam_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from lgu_slam_tpu.parallel.train_dp import (  # noqa: E402
    make_data_mesh, make_optimizer, make_train_step, replicate, shard_batch,
)
from lgu_slam_tpu.slam.system import init_params  # noqa: E402
from lgu_slam_tpu.utils.config import SLAMConfig, TrainConfig  # noqa: E402

H, W = 64, 96


@pytest.fixture(scope="module")
def setup():
    net, params = init_params(
        SLAMConfig(image_size=(H, W), volume_dtype="float32",
                   compute_dtype="float32", feat_dtype="float32")
    )
    db = SyntheticDataset(n_scenes=1, frames_per_scene=7, n_frames=4,
                          crop_size=(H, W), seed=0)
    N = 4
    ii = np.asarray(
        [i for i in range(N) for j in range(N) if i != j and abs(i - j) <= 2]
    )
    jj = np.asarray(
        [j for i in range(N) for j in range(N) if i != j and abs(i - j) <= 2]
    )
    return net, params, db, ii, jj


def _batch(db, rng, B):
    idx = rng.integers(0, len(db), size=B)
    items = [db[int(i)] for i in idx]
    images = np.stack([it[0] for it in items]).astype(np.float32)
    poses = np.stack([it[1] for it in items])
    depths = np.stack([it[2] for it in items])
    intr = np.stack([it[3] for it in items])
    disps = np.where(depths > 0.01, 1.0 / np.maximum(depths, 0.01), 0.0)
    return images, poses, disps, intr


def test_three_steps_finite_and_params_move(setup):
    """Params went NaN after step 1 before the safe-norm fix (finite
    metrics masked it via the Cholesky zero-update fallback) — so assert
    across MULTIPLE steps and on the params themselves."""
    net, params, db, ii, jj = setup
    tcfg = TrainConfig(batch=2, iters=2, steps=50, lr=4e-4, n_frames=4,
                       image_size=(H, W))
    tx = make_optimizer(tcfg)
    mesh = make_data_mesh(2)
    params = replicate(params, mesh)
    p0 = jax.tree_util.tree_map(np.asarray, params)
    opt = tx.init(params)
    step = make_train_step(net, tx, tcfg, ii, jj)
    rng = np.random.default_rng(0)
    B = 2
    h8, w8 = H // 8, W // 8
    for s in range(3):
        batch = shard_batch(_batch(db, rng, B), mesh)
        Gs0 = np.zeros((B, 4, 7), np.float32)
        disp0 = np.zeros((B, 4, h8, w8), np.float32)
        params, opt, metrics, _ = step(params, opt, batch, Gs0, disp0)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (s, k, float(v))
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, params)
    )
    assert all(np.isfinite(a).all() for a in leaves)
    # and the optimizer actually moved the weights
    l0 = jax.tree_util.tree_leaves(p0)
    moved = sum(float(np.abs(a - b).max()) for a, b in zip(leaves, l0))
    assert moved > 1e-4
