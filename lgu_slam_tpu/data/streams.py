"""Streaming image readers for inference (reference: demo.py:25-54
``image_stream``, droid_slam/data_readers/stream.py, and the per-benchmark
loaders inside evaluation_scripts/*).

All streams yield numpy arrays shaped for :meth:`LGUSlam.track`:
``(t, image[H,W,3] BGR uint8, intrinsics[4])`` — with an extra ``depth``
element for RGB-D and a stacked ``[2,H,W,3]`` image for stereo.  Images are
resized so H, W are multiples of 64 (8x feature stride x 8 pyramid).
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def _target_size(h0, w0, target_pixels=384 * 512):
    """demo.py:44-48 sizing: scale to ~target pixel count."""
    s = np.sqrt(target_pixels / (h0 * w0))
    h1 = int(h0 * s)
    w1 = int(w0 * s)
    h1 -= h1 % 8
    w1 -= w1 % 8
    return h1, w1


def load_calib(calib_file):
    """``fx fy cx cy [k1 k2 p1 p2 k3]`` (README.md:88-92)."""
    calib = np.loadtxt(calib_file, delimiter=" ").reshape(-1)
    K = np.eye(3)
    K[0, 0], K[1, 1] = calib[0], calib[1]
    K[0, 2], K[1, 2] = calib[2], calib[3]
    return calib, K


def image_stream(imagedir, calib, stride=1, t0=0, target_pixels=384 * 512):
    """Monocular directory stream (demo.py:25-54)."""
    calib, K = load_calib(calib) if isinstance(calib, str) else (
        np.asarray(calib), None
    )
    if K is None:
        K = np.eye(3)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = calib[:4]
    fx, fy, cx, cy = calib[:4]

    files = sorted(os.listdir(imagedir))[::stride]
    for t, name in enumerate(files):
        if t < t0:
            continue
        image = cv2.imread(os.path.join(imagedir, name))
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        h0, w0 = image.shape[:2]
        h1, w1 = _target_size(h0, w0, target_pixels)
        image = cv2.resize(image, (w1, h1))
        intr = np.asarray(
            [fx * w1 / w0, fy * h1 / h0, cx * w1 / w0, cy * h1 / h0],
            np.float32,
        )
        yield t, image, intr


def rgbd_stream(imagedir, depthdir, calib, stride=1, depth_scale=1000.0,
                target_pixels=384 * 512):
    """Aligned RGB-D stream (demo_depth.py): depth in units of
    1/depth_scale meters."""
    calib, K = load_calib(calib)
    fx, fy, cx, cy = calib[:4]
    images = sorted(os.listdir(imagedir))[::stride]
    depths = sorted(os.listdir(depthdir))[::stride]
    for t, (iname, dname) in enumerate(zip(images, depths)):
        image = cv2.imread(os.path.join(imagedir, iname))
        depth = cv2.imread(
            os.path.join(depthdir, dname), cv2.IMREAD_ANYDEPTH
        ).astype(np.float32) / depth_scale
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])
        h0, w0 = image.shape[:2]
        h1, w1 = _target_size(h0, w0, target_pixels)
        image = cv2.resize(image, (w1, h1))
        depth = cv2.resize(depth, (w1, h1), interpolation=cv2.INTER_NEAREST)
        intr = np.asarray(
            [fx * w1 / w0, fy * h1 / h0, cx * w1 / w0, cy * h1 / h0],
            np.float32,
        )
        yield t, image, depth, intr


def euroc_stereo_stream(datapath, stride=1, image_size=(320, 512)):
    """EuRoC MAV stereo with the hardcoded factory rectification
    (evaluation_scripts/test_euroc.py:29-49)."""
    K_l = np.array([458.654, 0.0, 367.215, 0, 457.296, 248.375, 0, 0, 1]
                   ).reshape(3, 3)
    d_l = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
    R_l = np.array([
        0.999966347530033, -0.001422739138722922, 0.008079580483432283,
        0.001365741834644127, 0.9999741760894847, 0.007055629199258132,
        -0.008089410156878961, -0.007044357138835809, 0.9999424675829176,
    ]).reshape(3, 3)
    P_l = np.array([435.2046959714599, 0, 367.4517211914062, 0,
                    0, 435.2046959714599, 252.2008514404297, 0,
                    0, 0, 1, 0]).reshape(3, 4)
    map_l = cv2.initUndistortRectifyMap(
        K_l, d_l, R_l, P_l[:3, :3], (752, 480), cv2.CV_32F
    )
    K_r = np.array([457.587, 0.0, 379.999, 0, 456.134, 255.238, 0, 0, 1]
                   ).reshape(3, 3)
    d_r = np.array([-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05,
                    0.0])
    R_r = np.array([
        0.9999633526194376, -0.003625811871560086, 0.007755443660172947,
        0.003680398547259526, 0.9999684752771629, -0.007035845251224894,
        -0.007729688520722713, 0.007064130529506649, 0.999945173484644,
    ]).reshape(3, 3)
    P_r = np.array([435.2046959714599, 0, 367.4517211914062, -47.90639384423901,
                    0, 435.2046959714599, 252.2008514404297, 0,
                    0, 0, 1, 0]).reshape(3, 4)
    map_r = cv2.initUndistortRectifyMap(
        K_r, d_r, R_r, P_r[:3, :3], (752, 480), cv2.CV_32F
    )

    left_dir = os.path.join(datapath, "mav0", "cam0", "data")
    right_dir = os.path.join(datapath, "mav0", "cam1", "data")
    names = sorted(os.listdir(left_dir))[::stride]
    H1, W1 = image_size
    for t, name in enumerate(names):
        tstamp = float(name.split(".")[0]) / 1e9
        left = cv2.imread(os.path.join(left_dir, name))
        rpath = os.path.join(right_dir, name)
        if left is None or not os.path.exists(rpath):
            continue
        right = cv2.imread(rpath)
        left = cv2.remap(left, map_l[0], map_l[1], cv2.INTER_LINEAR)
        right = cv2.remap(right, map_r[0], map_r[1], cv2.INTER_LINEAR)
        left = cv2.resize(left, (W1, H1))
        right = cv2.resize(right, (W1, H1))
        intr = np.asarray(
            [435.2046959714599 * W1 / 752, 435.2046959714599 * H1 / 480,
             367.4517211914062 * W1 / 752, 252.2008514404297 * H1 / 480],
            np.float32,
        )
        yield tstamp, np.stack([left, right]), intr


def tum_rgbd_stream(datapath, stride=2, target_pixels=None):
    """TUM fr sequences with association + fr-intrinsics
    (evaluation_scripts/test_tum.py; rgbd_utils.py:16-88)."""
    from lgu_slam_tpu.eval.ate import associate

    def read_list(name):
        path = os.path.join(datapath, name)
        entries = []
        with open(path) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                parts = line.strip().split()
                if parts:
                    entries.append((float(parts[0]), parts[1]))
        return entries

    rgb = read_list("rgb.txt")
    depth = read_list("depth.txt")
    pairs = associate(
        np.asarray([r[0] for r in rgb]), np.asarray([d[0] for d in depth])
    )

    # fr3 intrinsics + distortion (test_tum.py hardcodes per-sequence)
    calib = np.asarray(
        [535.4, 539.2, 320.1, 247.6], np.float32
    )
    seq = os.path.basename(os.path.normpath(datapath))
    if "freiburg1" in seq:
        calib = np.asarray([517.3, 516.5, 318.6, 255.3], np.float32)
        dist = np.asarray([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])
    elif "freiburg2" in seq:
        calib = np.asarray([520.9, 521.0, 325.1, 249.7], np.float32)
        dist = np.asarray([0.2312, -0.7849, -0.0033, -0.0001, 0.9172])
    else:
        dist = None
    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = calib

    for t, (ia, ib) in enumerate(pairs[::stride]):
        image = cv2.imread(os.path.join(datapath, rgb[ia][1]))
        d = cv2.imread(
            os.path.join(datapath, depth[ib][1]), cv2.IMREAD_ANYDEPTH
        ).astype(np.float32) / 5000.0
        if dist is not None:
            image = cv2.undistort(image, K, dist)
        h0, w0 = image.shape[:2]
        # crop borders + halve (test_tum.py protocol): 240x320
        image = image[16:-16, 24:-24]
        d = d[16:-16, 24:-24]
        h1, w1 = image.shape[:2]
        image = cv2.resize(image, (320, 240))
        d = cv2.resize(d, (320, 240), interpolation=cv2.INTER_NEAREST)
        intr = np.asarray(
            [calib[0] * 320 / w1, calib[1] * 240 / h1,
             (calib[2] - 24) * 320 / w1, (calib[3] - 16) * 240 / h1],
            np.float32,
        )
        yield rgb[ia][0], image, d, intr
