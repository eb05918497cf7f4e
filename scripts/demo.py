#!/usr/bin/env python
"""Monocular / RGB-D demo (reference: demo.py, demo_depth.py).

Runs the full SLAM system on an image directory and saves the trajectory
(+ optional reconstruction .npz for the 3DGS stage).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--imagedir", required=True)
    p.add_argument("--depthdir", default=None, help="aligned depth (RGB-D)")
    p.add_argument("--calib", required=True)
    p.add_argument("--weights", default=None, help="params pickle")
    p.add_argument("--t0", type=int, default=0)
    p.add_argument("--stride", type=int, default=3)
    p.add_argument("--buffer", type=int, default=512)
    p.add_argument("--filter_thresh", type=float, default=2.4)
    p.add_argument("--warmup", type=int, default=12)
    p.add_argument("--keyframe_thresh", type=float, default=3.5)
    p.add_argument("--frontend_thresh", type=float, default=16.0)
    p.add_argument("--frontend_window", type=int, default=20)
    p.add_argument("--frontend_radius", type=int, default=1)
    p.add_argument("--frontend_nms", type=int, default=1)
    p.add_argument("--backend_thresh", type=float, default=22.0)
    p.add_argument("--backend_radius", type=int, default=2)
    p.add_argument("--backend_nms", type=int, default=3)
    p.add_argument("--upsample", action="store_true")
    p.add_argument("--trajectory_path", default="trajectory.txt")
    p.add_argument("--reconstruction_path", default=None)
    p.add_argument("--target_pixels", type=int, default=384 * 512,
                   help="resize frames to ~this many pixels")
    p.add_argument("--export_every", type=int, default=0,
                   help="write growing .ply snapshots every N frames")
    p.add_argument("--export_dir", default="recon")
    p.add_argument("--viewer", action="store_true",
                   help="serve a live interactive web viewer")
    p.add_argument("--viewer_port", type=int, default=8090)
    args = p.parse_args()

    from lgu_slam_tpu.data.streams import image_stream, rgbd_stream
    from lgu_slam_tpu.eval.ate import save_tum_trajectory
    from lgu_slam_tpu.slam.system import LGUSlam, init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    def make_stream():
        if args.depthdir:
            return rgbd_stream(
                args.imagedir, args.depthdir, args.calib, args.stride,
                target_pixels=args.target_pixels,
            )
        return image_stream(args.imagedir, args.calib, args.stride,
                            target_pixels=args.target_pixels)

    # probe first frame for image size
    first = next(iter(make_stream()))
    H, W = first[1].shape[:2]

    cfg = SLAMConfig(
        image_size=(H, W), buffer=args.buffer,
        filter_thresh=args.filter_thresh, warmup=args.warmup,
        keyframe_thresh=args.keyframe_thresh,
        frontend_thresh=args.frontend_thresh,
        frontend_window=args.frontend_window,
        frontend_radius=args.frontend_radius,
        frontend_nms=args.frontend_nms,
        backend_thresh=args.backend_thresh,
        backend_radius=args.backend_radius,
        backend_nms=args.backend_nms,
        upsample=args.upsample,
    )

    net, params = init_params(cfg)
    if args.weights:
        with open(args.weights, "rb") as f:
            params = pickle.load(f)["params"]

    slam = LGUSlam(params, cfg, net_def=net)
    inc = None
    viewer = None
    if args.export_every or args.viewer:
        from lgu_slam_tpu.slam.visualization import IncrementalReconstruction

        inc = IncrementalReconstruction(slam.video)
    if args.export_every:
        os.makedirs(args.export_dir, exist_ok=True)
    if args.viewer:
        from lgu_slam_tpu.slam.live_viewer import LiveViewer

        viewer = LiveViewer(inc, port=args.viewer_port, host="0.0.0.0")
        print(f"live viewer at {viewer.url}")
    tstamps = []
    n_tracked = 0
    for item in make_stream():
        if args.depthdir:
            t, image, depth, intr = item
            if t < args.t0:
                continue
            slam.track(t, image, depth=depth, intrinsics=intr)
        else:
            t, image, intr = item
            if t < args.t0:
                continue
            slam.track(t, image, intrinsics=intr)
        tstamps.append(t)
        n_tracked += 1
        if viewer is not None:
            viewer.refresh()
        if args.export_every and n_tracked % args.export_every == 0:
            # consume the dirty-flag protocol incrementally
            # (droid_slam/visualization.py:81-112)
            if viewer is not None or inc.update():
                inc.export_ply(os.path.join(
                    args.export_dir, f"points_{n_tracked:05d}.ply"))
                inc.export_frusta(os.path.join(
                    args.export_dir, f"cameras_{n_tracked:05d}.ply"))

    traj = slam.terminate(make_stream())
    if viewer is not None:
        viewer.refresh()
    elif inc is not None:
        inc.update()
    if args.export_every:
        inc.export_ply(os.path.join(args.export_dir, "points_final.ply"))
        inc.export_frusta(os.path.join(args.export_dir, "cameras_final.ply"))
    save_tum_trajectory(args.trajectory_path, tstamps[: len(traj)], traj)
    print(f"trajectory ({len(traj)} poses) -> {args.trajectory_path}")

    if args.reconstruction_path:
        t = slam.video.counter
        s = slam.video.state
        np.savez_compressed(
            args.reconstruction_path,
            tstamps=np.asarray(s.tstamp[:t]),
            images=np.asarray(s.images[:t]),
            disps=np.asarray(s.disps_up[:t]) if args.upsample
            else np.asarray(s.disps[:t]),
            poses=np.asarray(s.poses[:t]),
            intrinsics=np.asarray(s.intrinsics[:t]),
        )
        print("reconstruction ->", args.reconstruction_path)


if __name__ == "__main__":
    main()
