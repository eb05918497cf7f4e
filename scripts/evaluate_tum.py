#!/usr/bin/env python
"""TUM-RGBD evaluation (reference: evaluation_scripts/test_tum.py +
tools/evaluate_tum.sh): runs mono SLAM on fr1 sequences at stride 2 and
scores ATE with Sim(3)-aligned Umeyama (the reference's evo APE protocol).
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# tools/evaluate_tum.sh sequence list
SEQUENCES = [
    "rgbd_dataset_freiburg1_360",
    "rgbd_dataset_freiburg1_desk",
    "rgbd_dataset_freiburg1_desk2",
    "rgbd_dataset_freiburg1_floor",
    "rgbd_dataset_freiburg1_plant",
    "rgbd_dataset_freiburg1_room",
    "rgbd_dataset_freiburg1_rpy",
    "rgbd_dataset_freiburg1_teddy",
    "rgbd_dataset_freiburg1_xyz",
]


def load_gt(datapath):
    gt = np.loadtxt(
        os.path.join(datapath, "groundtruth.txt"), comments="#"
    )
    return gt[:, 0], gt[:, 1:8]


def evaluate_sequence(datapath, params, net, use_depth=False,
                      upsample=False):
    from lgu_slam_tpu.data.streams import tum_rgbd_stream
    from lgu_slam_tpu.eval.ate import associate, ate_rmse
    from lgu_slam_tpu.slam.system import LGUSlam
    from lgu_slam_tpu.utils.config import TUM_CONFIG

    # --upsample mirrors the reference demo flag (depth_video.py:124-128):
    # full-res disparities via the learned convex-upsampling masks
    cfg = TUM_CONFIG.replace(upsample=upsample)
    slam = LGUSlam(params, cfg, net_def=net)

    tstamps = []
    for t, image, depth, intr in tum_rgbd_stream(datapath, stride=2):
        slam.track(t, image, depth=depth if use_depth else None,
                   intrinsics=intr)
        tstamps.append(t)

    def stream():
        for t, image, depth, intr in tum_rgbd_stream(datapath, stride=1):
            yield t, image, intr

    traj = slam.terminate(stream())
    est_t = [t for t, *_ in tum_rgbd_stream(datapath, stride=1)]

    gt_t, gt_poses = load_gt(datapath)
    pairs = associate(np.asarray(est_t[: len(traj)]), gt_t, max_dt=0.08)
    ia = [a for a, _ in pairs]
    ib = [b for _, b in pairs]
    rmse, _, _ = ate_rmse(
        gt_poses[ib][:, :3], traj[ia][:, :3], correct_scale=True
    )
    return rmse, len(traj)


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True, help="TUM root dir")
    p.add_argument("--weights", required=True)
    p.add_argument("--sequences", nargs="*", default=SEQUENCES)
    p.add_argument("--use_depth", action="store_true")
    p.add_argument("--upsample", action="store_true",
                   help="maintain full-res disparities via the learned "
                        "convex-upsampling masks")
    args = p.parse_args()

    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import TUM_CONFIG

    net, params = init_params(TUM_CONFIG)
    with open(args.weights, "rb") as f:
        params = pickle.load(f)["params"]

    results = {}
    for seq in args.sequences:
        path = os.path.join(args.datapath, seq)
        if not os.path.isdir(path):
            print("skip", seq)
            continue
        rmse, n = evaluate_sequence(path, params, net, args.use_depth,
                                    upsample=args.upsample)
        results[seq] = rmse
        print(f"{seq}: ATE {rmse:.4f} m over {n} frames")

    if results:
        print(json.dumps({"mean_ate": float(np.mean(list(results.values()))),
                          "per_seq": results}))


if __name__ == "__main__":
    main()
