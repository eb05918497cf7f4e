"""Evaluator regression tests against the reference's vendored fixtures.

The reference ships a canned 734-pose trajectory pair
(evaluation/pose_gt.txt + pose_est.txt — tartanair_evaluator.py:80-85
runs them under __main__) and EuRoC ground-truth files
(data/euroc_groundtruth/*.txt, consumed by tools/evaluate_euroc.sh).

The pinned values below were produced by running the REFERENCE evaluator
chain once on those fixtures (ATEEvaluator -> quats2SEs ->
evaluate_trajectory(param_max_pairs=0) -> KittiEvaluator;
evaluation/evaluator_base.py:28-91):

  scale=True :  ate 0.8344983411575012   s 1.0782526734172067
                rpe (0.030204797013637697, 1.2379576829085115)
                kitti (0.07987194481751217, 0.05704519803640045)
  scale=False:  ate 1.204507439280004
                rpe (0.030204797013637697, 1.5884492597852984)
                kitti (0.07987194481751217, 0.07491751635423824)

The shipped RPE default draws 10k unseeded random pairs
(evaluate_rpe.py:83-124); the pins use the deterministic all-pairs
variant (param_max_pairs=0).  RPE/KITTI tolerances are loose-ish (1e-3
relative) because the reference round-trips the aligned trajectory
through quaternions (evaluator_base.py:41-52) — pure fp conversion
noise, amplified by arccos near 1 — while ours applies the (provably
cancelling) alignment analytically.
"""

import os

import numpy as np
import pytest

from lgu_slam_tpu.eval.ate import (
    ate_rmse,
    associate,
    horn_ate,
    load_euroc_gt_txt,
    tartanair_evaluate,
)

REF_EVAL = "/root/reference/evaluation"
REF_EUROC_GT = "/root/reference/data/euroc_groundtruth"

needs_fixtures = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_EVAL, "pose_gt.txt")),
    reason="reference fixtures not mounted",
)


@pytest.fixture(scope="module")
def traj_pair():
    gt = np.loadtxt(os.path.join(REF_EVAL, "pose_gt.txt"))
    est = np.loadtxt(os.path.join(REF_EVAL, "pose_est.txt"))
    return gt, est


@needs_fixtures
def test_tartanair_fixture_mono(traj_pair):
    gt, est = traj_pair
    r = tartanair_evaluate(gt, est, scale=True)
    assert r["ate_score"] == pytest.approx(0.8344983411575012, rel=1e-9)
    assert r["scale"] == pytest.approx(1.0782526734172067, rel=1e-9)
    assert r["rpe_score"][0] == pytest.approx(0.030204797013637697, rel=1e-3)
    assert r["rpe_score"][1] == pytest.approx(1.2379576829085115, rel=1e-3)
    assert r["kitti_score"][0] == pytest.approx(0.07987194481751217, rel=1e-3)
    assert r["kitti_score"][1] == pytest.approx(0.05704519803640045, rel=1e-3)


@needs_fixtures
def test_tartanair_fixture_stereo(traj_pair):
    gt, est = traj_pair
    r = tartanair_evaluate(gt, est, scale=False)
    assert r["ate_score"] == pytest.approx(1.204507439280004, rel=1e-9)
    assert r["scale"] == 1.0
    assert r["rpe_score"][0] == pytest.approx(0.030204797013637697, rel=1e-3)
    assert r["rpe_score"][1] == pytest.approx(1.5884492597852984, rel=1e-3)
    assert r["kitti_score"][0] == pytest.approx(0.07987194481751217, rel=1e-3)
    assert r["kitti_score"][1] == pytest.approx(0.07491751635423824, rel=1e-3)


@needs_fixtures
def test_horn_vs_umeyama_consistency(traj_pair):
    """Both alignments minimise the same objective; on the fixture their
    RMSEs agree to <2% even though the scale parameterization differs
    (Horn scales est, Umeyama scales the fit)."""
    gt, est = traj_pair
    horn, s = horn_ate(gt[:, :3], est[:, :3], calc_scale=True)
    ume, _, _ = ate_rmse(gt[:, :3], est[:, :3], correct_scale=True)
    assert abs(horn - ume) / horn < 0.02
    assert s > 0


@needs_fixtures
def test_tartanair_evaluate_self_is_zero(traj_pair):
    gt, _ = traj_pair
    r = tartanair_evaluate(gt, gt, scale=True)
    assert r["ate_score"] < 1e-9
    assert r["rpe_score"][1] < 1e-9
    assert r["kitti_score"][1] < 1e-9


needs_euroc_gt = pytest.mark.skipif(
    not os.path.isdir(REF_EUROC_GT),
    reason="reference EuRoC gt files not mounted",
)


@needs_euroc_gt
def test_euroc_gt_loads_all_sequences():
    files = sorted(os.listdir(REF_EUROC_GT))
    assert len(files) == 11
    for f in files:
        t, poses = load_euroc_gt_txt(os.path.join(REF_EUROC_GT, f))
        assert poses.shape == (len(t), 7)
        assert len(t) > 1000
        # timestamps are seconds, monotonically increasing
        assert np.all(np.diff(t) > 0)
        # unit quaternions (xyzw)
        qn = np.linalg.norm(poses[:, 3:7], axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-6)


@needs_euroc_gt
def test_euroc_gt_alignment_end_to_end():
    """evaluate_euroc.py's scoring path on real gt: a Sim(3)-transformed,
    subsampled copy of the gt must associate and align back to ~zero ATE."""
    t, poses = load_euroc_gt_txt(os.path.join(REF_EUROC_GT, "MH_01_easy.txt"))
    # fake estimated trajectory: every 7th gt pose under a global Sim(3)
    est_t = t[::7] + 0.004  # slight clock offset, within associate's max_dt
    rng = np.random.default_rng(0)
    ang = 0.7
    R = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ])
    s, tr = 0.37, rng.normal(size=3)
    est_xyz = (s * (R @ poses[::7, :3].T)).T + tr

    pairs = associate(est_t, t, max_dt=0.05)
    assert len(pairs) == len(est_t)
    ia = [a for a, _ in pairs]
    ib = [b for _, b in pairs]
    rmse, _, _ = ate_rmse(poses[ib][:, :3], est_xyz[ia], correct_scale=True)
    assert rmse < 1e-9


@needs_euroc_gt
def test_evaluate_euroc_script_gt_loader():
    """scripts/evaluate_euroc.py --gt_dir path loads the vendored files."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "evaluate_euroc", root / "scripts" / "evaluate_euroc.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    t, poses = mod.load_gt(
        None, gt_txt=os.path.join(REF_EUROC_GT, "V2_03_difficult.txt")
    )
    assert poses.shape[1] == 7
    assert t[0] > 1.4e9 * 0.9  # seconds since epoch scale, not ns
