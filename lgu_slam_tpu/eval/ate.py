"""Trajectory metrics in pure NumPy (no external evo dependency).

Reference parity:
- ATE with Horn alignment + optional scale:
  evaluation/evaluate_ate_scale.py (Horn closed form) and
  evaluation/evaluator_base.py:28-55; also the evo APE
  ``align=True, correct_scale=True`` protocol used by test_tum.py:119-120
  and test_euroc.py:141-142 (Umeyama Sim(3) alignment on translations).
- RPE: evaluation/evaluate_rpe.py (relative pose error over a fixed frame
  delta).
- KITTI-style per-length segment errors: evaluation/evaluate_kitti.py.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity aligning x -> y (both [N, 3]).

    Returns (s, R, t) with y ≈ s R x + t.
    """
    mu_x = x.mean(0)
    mu_y = y.mean(0)
    xc = x - mu_x
    yc = y - mu_y
    cov = yc.T @ xc / x.shape[0]
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / x.shape[0]
    s = float(np.trace(np.diag(d) @ S) / var_x) if with_scale else 1.0
    t = mu_y - s * R @ mu_x
    return s, R, t


def ate_rmse(gt_xyz: np.ndarray, est_xyz: np.ndarray,
             correct_scale: bool = True):
    """Absolute trajectory error after Sim(3)/SE(3) alignment.

    Returns (rmse, aligned_est, (s, R, t)).
    """
    s, R, t = umeyama_alignment(est_xyz, gt_xyz, with_scale=correct_scale)
    aligned = (s * (R @ est_xyz.T)).T + t
    err = np.linalg.norm(aligned - gt_xyz, axis=1)
    return float(np.sqrt((err ** 2).mean())), aligned, (s, R, t)


def _pose_to_matrix(p):
    """(t, q) 7-vec -> 4x4 (q = x, y, z, w)."""
    t, q = p[:3], p[3:7]
    x, y, z, w = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def rpe(gt_poses: np.ndarray, est_poses: np.ndarray, delta: int = 1):
    """Relative pose error over frame pairs (i, i+delta); poses [N, 7]
    camera-to-world.  Returns (trans_rmse, rot_rmse_deg)."""
    N = min(len(gt_poses), len(est_poses))
    terrs, rerrs = [], []
    for i in range(N - delta):
        Tg0 = _pose_to_matrix(gt_poses[i])
        Tg1 = _pose_to_matrix(gt_poses[i + delta])
        Te0 = _pose_to_matrix(est_poses[i])
        Te1 = _pose_to_matrix(est_poses[i + delta])
        dg = np.linalg.inv(Tg0) @ Tg1
        de = np.linalg.inv(Te0) @ Te1
        err = np.linalg.inv(dg) @ de
        terrs.append(np.linalg.norm(err[:3, 3]))
        ang = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)
        rerrs.append(np.degrees(np.arccos(ang)))
    return (
        float(np.sqrt(np.mean(np.square(terrs)))),
        float(np.sqrt(np.mean(np.square(rerrs)))),
    )


def kitti_metrics(gt_poses: np.ndarray, est_poses: np.ndarray,
                  lengths=(100, 200, 300, 400, 500, 600, 700, 800)):
    """KITTI per-length translation (%) / rotation (deg/m) errors."""
    def traj_distances(poses):
        d = [0.0]
        for i in range(1, len(poses)):
            d.append(d[-1] + np.linalg.norm(poses[i, :3] - poses[i - 1, :3]))
        return np.asarray(d)

    dist = traj_distances(gt_poses)
    t_errs, r_errs = [], []
    for first in range(0, len(gt_poses), 10):
        for L in lengths:
            idx = np.searchsorted(dist, dist[first] + L)
            if idx >= len(gt_poses):
                continue
            Tg = np.linalg.inv(_pose_to_matrix(gt_poses[first])) @ \
                _pose_to_matrix(gt_poses[idx])
            Te = np.linalg.inv(_pose_to_matrix(est_poses[first])) @ \
                _pose_to_matrix(est_poses[idx])
            err = np.linalg.inv(Tg) @ Te
            t_errs.append(np.linalg.norm(err[:3, 3]) / L)
            ang = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)
            r_errs.append(np.degrees(np.arccos(ang)) / L)
    if not t_errs:
        return {"t_rel": float("nan"), "r_rel": float("nan")}
    return {
        "t_rel": float(np.mean(t_errs) * 100.0),
        "r_rel": float(np.mean(r_errs)),
    }


# -- trajectory file IO (TUM format: t tx ty tz qx qy qz qw) ----------------

def save_tum_trajectory(path, tstamps, poses):
    with open(path, "w") as f:
        for t, p in zip(tstamps, poses):
            f.write(
                f"{t} " + " ".join(f"{v:.6f}" for v in p[:7]) + "\n"
            )


def load_tum_trajectory(path):
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:8]


def associate(stamps_a, stamps_b, max_dt=0.08, offset=0.0):
    """Greedy nearest-timestamp association
    (data_readers/rgbd_utils.py:16-88 TUM protocol)."""
    pairs = []
    used_b = set()
    for ia, ta in enumerate(stamps_a):
        diffs = np.abs(stamps_b + offset - ta)
        ib = int(np.argmin(diffs))
        if diffs[ib] < max_dt and ib not in used_b:
            pairs.append((ia, ib))
            used_b.add(ib)
    return pairs
