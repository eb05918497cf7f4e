#!/usr/bin/env python
"""EuRoC stereo evaluation (reference: evaluation_scripts/test_euroc.py +
tools/evaluate_euroc.sh): stereo tracking at stride 2, trajectory fill at
stride 1, Sim(3)-aligned ATE against the state-estimate ground truth."""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEQUENCES = [
    "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult",
    "MH_05_difficult", "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]


def load_gt(datapath, gt_txt=None):
    """Ground truth from the dataset's state-estimate csv, or — when
    ``gt_txt`` is given — from a standalone EuRoC gt .txt in the format
    the reference vendors at data/euroc_groundtruth/*.txt
    (tools/evaluate_euroc.sh passes those as --gt)."""
    if gt_txt is not None:
        from lgu_slam_tpu.eval.ate import load_euroc_gt_txt

        return load_euroc_gt_txt(gt_txt)
    path = os.path.join(
        datapath, "mav0", "state_groundtruth_estimate0", "data.csv"
    )
    data = np.loadtxt(path, delimiter=",", skiprows=1)
    # t[ns], px py pz, qw qx qy qz -> (t, q(xyzw))
    t = data[:, 0] / 1e9
    poses = np.concatenate(
        [data[:, 1:4], data[:, [5, 6, 7, 4]]], axis=1
    )
    return t, poses


def evaluate_sequence(datapath, params, net, gt_txt=None):
    from lgu_slam_tpu.data.streams import euroc_stereo_stream
    from lgu_slam_tpu.eval.ate import associate, ate_rmse
    from lgu_slam_tpu.slam.system import LGUSlam
    from lgu_slam_tpu.utils.config import EUROC_CONFIG

    slam = LGUSlam(params, EUROC_CONFIG, net_def=net)
    for t, image, intr in euroc_stereo_stream(datapath, stride=2):
        slam.track(t, image, intrinsics=intr)

    fill = euroc_stereo_stream(datapath, stride=1)
    traj = slam.terminate(fill)
    est_t = [t for t, *_ in euroc_stereo_stream(datapath, stride=1)]

    gt_t, gt_poses = load_gt(datapath, gt_txt=gt_txt)
    pairs = associate(np.asarray(est_t[: len(traj)]), gt_t, max_dt=0.05)
    ia = [a for a, _ in pairs]
    ib = [b for _, b in pairs]
    rmse, _, _ = ate_rmse(
        gt_poses[ib][:, :3], traj[ia][:, :3], correct_scale=True
    )
    return rmse


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--sequences", nargs="*", default=SEQUENCES)
    p.add_argument("--gt_dir", default=None,
                   help="directory of <seq>.txt gt files "
                        "(reference data/euroc_groundtruth format)")
    args = p.parse_args()

    from lgu_slam_tpu.utils.config import EUROC_CONFIG
    from lgu_slam_tpu.slam.system import init_params

    net, _ = init_params(EUROC_CONFIG)
    with open(args.weights, "rb") as f:
        params = pickle.load(f)["params"]

    results = {}
    for seq in args.sequences:
        path = os.path.join(args.datapath, seq)
        if not os.path.isdir(path):
            print("skip", seq)
            continue
        gt_txt = (
            os.path.join(args.gt_dir, seq + ".txt") if args.gt_dir else None
        )
        rmse = evaluate_sequence(path, params, net, gt_txt=gt_txt)
        results[seq] = rmse
        print(f"{seq}: ATE {rmse:.4f} m")

    if results:
        print(json.dumps({"mean_ate": float(np.mean(list(results.values()))),
                          "per_seq": results}))


if __name__ == "__main__":
    main()
