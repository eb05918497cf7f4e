#!/usr/bin/env python
"""Self-contained smoke demo: tracks a generated textured sequence through
the full SLAM system (motion filter -> frontend -> backend -> trajectory
filler) with no external data or weights.

The scene is a textured plane observed by a translating camera (frames
are crops sliding over a large texture), so flow is nonzero and keyframes
accumulate.  With random weights the trajectory is not metric — the
script asserts *pipeline* health: finite poses for every input frame,
keyframes tracked, and (optionally) a live viewer.

Usage:
    LGU_PLATFORM=cpu python scripts/synthetic_demo.py [--frames 30]
        [--viewer] [--viewer_port 9876]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def generate_sequence(out_dir, frames=30, H=120, W=160, seed=0):
    """Write a sliding-crop textured sequence + calib file."""
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 255, (H * 2, W * 2, 3)).astype(np.float32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, 2, 0)) / 4  # smooth for stable gradients
    big = big.astype(np.uint8)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    try:
        import cv2

        write = lambda p, im: cv2.imwrite(p, im)  # noqa: E731
    except Exception:  # pragma: no cover
        from PIL import Image

        write = lambda p, im: Image.fromarray(im).save(p)  # noqa: E731
    for t in range(frames):
        ox, oy = 2 * t, t
        write(os.path.join(img_dir, f"{t:04d}.png"),
              big[oy:oy + H, ox:ox + W])
    calib = os.path.join(out_dir, "calib.txt")
    with open(calib, "w") as f:
        f.write(f"{W:.1f} {W:.1f} {W / 2:.1f} {H / 2:.1f}\n")
    return img_dir, calib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--viewer", action="store_true")
    p.add_argument("--viewer_port", type=int, default=9876)
    p.add_argument("--trajectory_path", default=None,
                   help="output trajectory file (default: inside the "
                        "demo's tempdir, discarded on exit)")
    args = p.parse_args()

    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()

    from lgu_slam_tpu.data.streams import image_stream
    from lgu_slam_tpu.eval.ate import save_tum_trajectory
    from lgu_slam_tpu.slam.system import LGUSlam, init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    with tempfile.TemporaryDirectory() as td:
        img_dir, calib = generate_sequence(td, frames=args.frames)
        if args.trajectory_path is None:
            args.trajectory_path = os.path.join(
                td, "synthetic_trajectory.txt")

        def make_stream():
            return image_stream(img_dir, calib, stride=1,
                                target_pixels=8000)

        first = next(iter(make_stream()))
        H, W = first[1].shape[:2]
        cfg = SLAMConfig(
            image_size=(H, W), buffer=max(32, args.frames + 18),
            warmup=4, filter_thresh=0.01, keyframe_thresh=0.01,
        )
        net, params = init_params(cfg)
        slam = LGUSlam(params, cfg, net_def=net)

        viewer = None
        if args.viewer:
            from lgu_slam_tpu.slam.live_viewer import LiveViewer
            from lgu_slam_tpu.slam.visualization import (
                IncrementalReconstruction,
            )

            inc = IncrementalReconstruction(slam.video)
            viewer = LiveViewer(inc, port=args.viewer_port, host="0.0.0.0")
            print(f"live viewer at {viewer.url}")

        tstamps = []
        for t, image, intr in make_stream():
            slam.track(t, image, intrinsics=intr)
            tstamps.append(t)
            if viewer is not None:
                viewer.refresh()

        kf = slam.video.counter
        traj = slam.terminate(make_stream())
        assert len(traj) == len(tstamps), (len(traj), len(tstamps))
        assert np.isfinite(traj).all(), "non-finite poses"
        save_tum_trajectory(args.trajectory_path, tstamps, traj)
        print(f"tracked {len(tstamps)} frames -> {kf} keyframes; "
              f"trajectory ({len(traj)} poses, finite) -> "
              f"{args.trajectory_path}")
        print("synthetic demo OK")


if __name__ == "__main__":
    main()
