#!/usr/bin/env python
"""Export a saved reconstruction (.npz from scripts/demo.py) to a filtered
point cloud .ply (reference: view_reconstruction.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--reconstruction", required=True, help=".npz path")
    p.add_argument("--out", default="reconstruction.ply")
    p.add_argument("--filter_thresh", type=float, default=0.005)
    p.add_argument("--serve", action="store_true",
                   help="serve the cloud in the interactive web viewer "
                        "instead of writing a .ply")
    p.add_argument("--port", type=int, default=8090)
    args = p.parse_args()

    from lgu_slam_tpu.slam.visualization import backproject_points, write_ply

    data = np.load(args.reconstruction)
    disps = data["disps"]
    if disps.ndim == 3 and disps.shape[1] == data["images"].shape[1]:
        disps8 = disps[:, 3::8, 3::8]  # full-res disps_up -> 1/8
    else:
        disps8 = disps
    pts, colors = backproject_points(
        data["poses"], disps8, data["intrinsics"][0],
        images=data["images"], filter_thresh=args.filter_thresh,
    )
    if args.serve:
        import time

        from lgu_slam_tpu.slam.live_viewer import LiveViewer

        class _Static:  # duck-typed IncrementalReconstruction snapshot
            points = {0: (pts, colors)}
            cameras = {i: np.asarray(p)
                       for i, p in enumerate(data["poses"])}

            def update(self):
                return 0

        viewer = LiveViewer(_Static(), port=args.port, host="0.0.0.0")
        print(f"serving {len(pts)} points at {viewer.url} (ctrl-c to stop)")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            viewer.close()
        return
    write_ply(args.out, pts, colors)
    print(f"{len(pts)} points -> {args.out}")


if __name__ == "__main__":
    main()
