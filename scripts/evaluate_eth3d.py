#!/usr/bin/env python
"""ETH3D SLAM evaluation (reference: evaluation_scripts/test_eth3d.py +
tools/evaluate_eth3d.sh): RGB-D tracking (depth/5000) with the
depth-conditioned BA, writing timestamped trajectory files in the official
submission format."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def eth3d_stream(datapath, stride=1, use_depth=True):
    from lgu_slam_tpu.eval.ate import associate

    def read_list(name):
        entries = []
        with open(os.path.join(datapath, name)) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                parts = line.split()
                if parts:
                    entries.append((float(parts[0]), parts[1]))
        return entries

    rgb = read_list("rgb.txt")
    depth = read_list("depth.txt")
    pairs = associate(
        np.asarray([r[0] for r in rgb]), np.asarray([d[0] for d in depth])
    )
    calib = np.loadtxt(os.path.join(datapath, "calibration.txt"))

    for ia, ib in pairs[::stride]:
        image = cv2.imread(os.path.join(datapath, rgb[ia][1]))
        d = cv2.imread(
            os.path.join(datapath, depth[ib][1]), cv2.IMREAD_ANYDEPTH
        ).astype(np.float32) / 5000.0
        h0, w0 = image.shape[:2]
        h1 = h0 - h0 % 8
        w1 = w0 - w0 % 8
        image = cv2.resize(image, (w1, h1))
        d = cv2.resize(d, (w1, h1), interpolation=cv2.INTER_NEAREST)
        intr = np.asarray(
            [calib[0] * w1 / w0, calib[1] * h1 / h0,
             calib[2] * w1 / w0, calib[3] * h1 / h0], np.float32,
        )
        if use_depth:
            yield rgb[ia][0], image, d, intr
        else:
            yield rgb[ia][0], image, intr


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--sequences", nargs="*", default=None)
    p.add_argument("--outdir", default="eth3d_results")
    args = p.parse_args()

    from lgu_slam_tpu.eval.ate import save_tum_trajectory
    from lgu_slam_tpu.slam.system import LGUSlam, init_params
    from lgu_slam_tpu.utils.config import ETH3D_CONFIG

    net, _ = init_params(ETH3D_CONFIG)
    with open(args.weights, "rb") as f:
        params = pickle.load(f)["params"]

    os.makedirs(args.outdir, exist_ok=True)
    seqs = args.sequences or sorted(os.listdir(args.datapath))
    for seq in seqs:
        path = os.path.join(args.datapath, seq)
        if not os.path.isdir(path):
            continue
        slam = LGUSlam(params, ETH3D_CONFIG, net_def=net)
        tstamps = []
        for t, image, d, intr in eth3d_stream(path):
            slam.track(t, image, depth=d, intrinsics=intr)
            tstamps.append(t)
        traj = slam.terminate(eth3d_stream(path, use_depth=False))
        out = os.path.join(args.outdir, f"{seq}.txt")
        save_tum_trajectory(out, tstamps[: len(traj)], traj)
        print(seq, "->", out)


if __name__ == "__main__":
    main()
