#!/usr/bin/env python
"""TartanAir validation (reference: evaluation_scripts/validate_tartanair.py
+ tools/validate_tartanair.sh): per-scene mono/stereo ATE + RPE + KITTI
scores over the official 32-scene test split, with the ATE-vs-threshold
success curve."""

import argparse
import glob
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def tartan_stream(scene, stride=1, image_size=(384, 512)):
    from lgu_slam_tpu.data.tartan import INTRINSICS

    images = sorted(glob.glob(os.path.join(scene, "image_left", "*.png")))
    H, W = image_size
    for t, path in enumerate(images[::stride]):
        img = cv2.imread(path)
        h0, w0 = img.shape[:2]
        img = cv2.resize(img, (W, H))
        intr = INTRINSICS * np.asarray(
            [W / w0, H / h0, W / w0, H / h0], np.float32
        )
        yield t, img, intr


def evaluate_scene(scene, params, net, stereo=False):
    from lgu_slam_tpu.data.tartan import ned_to_xyz
    from lgu_slam_tpu.eval.ate import ate_rmse, kitti_metrics, rpe
    from lgu_slam_tpu.slam.system import LGUSlam
    from lgu_slam_tpu.utils.config import TARTANAIR_CONFIG

    slam = LGUSlam(params, TARTANAIR_CONFIG, net_def=net)
    for t, img, intr in tartan_stream(scene):
        slam.track(t, img, intrinsics=intr)
    traj = slam.terminate(tartan_stream(scene))

    gt = ned_to_xyz(
        np.loadtxt(os.path.join(scene, "pose_left.txt"), delimiter=" ")
    )
    n = min(len(gt), len(traj))
    rmse, _, _ = ate_rmse(gt[:n, :3], traj[:n, :3], correct_scale=True)
    t_rpe, r_rpe = rpe(gt[:n], traj[:n])
    kitti = kitti_metrics(gt[:n], traj[:n])
    return {"ate": rmse, "rpe_trans": t_rpe, "rpe_rot": r_rpe, **kitti}


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True, help="TartanAir test root")
    p.add_argument("--weights", required=True)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--scenes", nargs="*", default=None)
    args = p.parse_args()

    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import TARTANAIR_CONFIG

    net, _ = init_params(TARTANAIR_CONFIG)
    with open(args.weights, "rb") as f:
        params = pickle.load(f)["params"]

    scenes = args.scenes or sorted(
        glob.glob(os.path.join(args.datapath, "*/P*"))
    )
    results = {}
    for scene in scenes:
        r = evaluate_scene(scene, params, net, args.stereo)
        results[scene] = r
        print(scene, json.dumps(r))

    ates = [r["ate"] for r in results.values()]
    # ATE-vs-threshold success curve (validate_tartanair.py:154-163)
    curve = {
        f"<{th}": float(np.mean([a < th for a in ates]))
        for th in (0.05, 0.1, 0.25, 0.5, 1.0)
    }
    print(json.dumps({"mean_ate": float(np.mean(ates)), "success": curve}))


if __name__ == "__main__":
    main()
