#!/usr/bin/env python
"""Convert a quaternion trajectory to 4x4 pose matrices (reference:
to3DGS/q2T.py:13-23, which permutes TartanAir NED quaternion poses and
expands them to rotation matrices for downstream consumers).

Input formats:
  tum      : "t tx ty tz qx qy qz qw" per line (scripts/demo.py output)
  tartan   : TartanAir pose_left.txt "x y z qx qy qz qw" in NED axes
             (permuted to camera xyz exactly as q2T.py:14 / tartan.py:21-71)

Writes an [N, 4, 4] .npy stack, and one flattened 4x4 per line when --txt
is given.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lgu_slam_tpu.data.rgbd_datasets import quat_pose_to_matrix


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trajectory")
    p.add_argument("--format", choices=["tum", "tartan"], default="tum")
    p.add_argument("--out", default=None, help=".npy output (default: "
                   "trajectory path with .npy suffix)")
    p.add_argument("--txt", default=None,
                   help="optional flat-matrix text output")
    args = p.parse_args()

    raw = np.loadtxt(args.trajectory)
    if args.format == "tum":
        pvecs = raw[:, 1:8]  # drop timestamp
    else:
        # NED (z-fwd, x-right, y-down) -> camera xyz axis permute
        pvecs = raw[:, [1, 2, 0, 4, 5, 3, 6]]

    mats = np.stack([quat_pose_to_matrix(v) for v in pvecs])
    out = args.out or os.path.splitext(args.trajectory)[0] + ".npy"
    np.save(out, mats.astype(np.float32))
    if args.txt:
        np.savetxt(args.txt, mats.reshape(len(mats), 16), fmt="%.9f")
    print(f"wrote {len(mats)} poses -> {out}")


if __name__ == "__main__":
    main()
