"""RGB-D capture-loader tests: synthesize tiny on-disk fixtures in each
capture's folder convention (TUM association lists, ScanNet pose dirs,
ICL .gt.sim, Record3D npy poses, NeRFCapture transforms.json) and check
frames, poses, and intrinsics rescaling round-trip."""

import json
import os

import cv2
import numpy as np
import pytest

from lgu_slam_tpu.data.rgbd_datasets import (
    Azure,
    CameraParams,
    ICL,
    NeRFCapture,
    Record3D,
    ScanNet,
    TUMRGBD,
    load_rgbd_dataset,
    quat_pose_to_matrix,
)

H0, W0 = 48, 64
CAM = CameraParams(fx=60.0, fy=60.0, cx=32.0, cy=24.0, height=H0,
                   width=W0, png_depth_scale=1000.0)


def _write_frame(color_path, depth_path, i):
    os.makedirs(os.path.dirname(color_path), exist_ok=True)
    os.makedirs(os.path.dirname(depth_path), exist_ok=True)
    im = np.full((H0, W0, 3), (i * 20) % 255, np.uint8)
    cv2.imwrite(color_path, im)
    d = np.full((H0, W0), 1500 + 10 * i, np.uint16)  # 1.5m+
    cv2.imwrite(depth_path, d)


def _check(ds, n, expect_pose=True):
    assert len(ds) == n
    im, d, w2c, intr = ds[0]
    assert im.shape == (H0, W0, 3) and 0.0 <= im.min() <= im.max() <= 1.0
    assert d.shape == (H0, W0)
    assert abs(d[0, 0] - 1.5) < 1e-3
    assert w2c.shape == (4, 4)
    np.testing.assert_allclose(intr, [60.0, 60.0, 32.0, 24.0])
    # stream() view for the SLAM system
    t, bgr, ds_d, _ = next(iter(ds.stream()))
    assert t == 0 and bgr.dtype == np.uint8 and ds_d.shape == (H0, W0)
    return w2c


def test_tum_association(tmp_path):
    root = tmp_path / "rgbd_dataset_freiburg1_desk"
    n = 4
    rgb_lines, d_lines, gt_lines = [], ["# depth"], ["# gt"]
    for i in range(n):
        t = 100.0 + i * 0.25  # > 1/32 s apart so none are thinned
        _write_frame(str(root / f"rgb/{t:.4f}.png"),
                     str(root / f"depth/{t + 0.01:.4f}.png"), i)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        d_lines.append(f"{t + 0.01:.4f} depth/{t + 0.01:.4f}.png")
        gt_lines.append(f"{t + 0.02:.4f} {0.1 * i:.3f} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(d_lines))
    (root / "groundtruth.txt").write_text("\n".join(gt_lines))

    ds = TUMRGBD(str(tmp_path), "rgbd_dataset_freiburg1_desk", camera=CAM)
    w2c = _check(ds, n)
    # pose 0 is identity translation; frame 1 should carry t_x = -0.1 in w2c
    im1 = ds[1]
    assert abs(im1[2][0, 3] + 0.1) < 1e-6
    assert abs(w2c[0, 3]) < 1e-6


def test_tum_default_camera_from_sequence_name(tmp_path):
    root = tmp_path / "rgbd_dataset_freiburg2_xyz"
    _write_frame(str(root / "rgb/1.0.png"), str(root / "depth/1.0.png"), 0)
    (root / "rgb.txt").write_text("1.0 rgb/1.0.png")
    (root / "depth.txt").write_text("1.0 depth/1.0.png")
    (root / "groundtruth.txt").write_text("# gt\n1.0 0 0 0 0 0 0 1")
    ds = TUMRGBD(str(tmp_path), "rgbd_dataset_freiburg2_xyz")
    assert ds.camera.fx == 520.9 and ds.camera.png_depth_scale == 5000.0


def test_scannet_and_azure(tmp_path):
    for cls, color_ext in ((ScanNet, "jpg"), (Azure, "jpg")):
        root = tmp_path / cls.__name__
        n = 3
        for i in range(n):
            _write_frame(str(root / f"color/{i}.{color_ext}"),
                         str(root / f"depth/{i}.png"), i)
        if cls is ScanNet:
            os.makedirs(root / "pose", exist_ok=True)
            for i in range(n):
                T = np.eye(4)
                T[0, 3] = 0.05 * i
                np.savetxt(root / "pose" / f"{i}.txt", T)
        ds = cls(str(tmp_path), cls.__name__, camera=CAM)
        _check(ds, n)


def test_icl_gt_sim_poses(tmp_path):
    root = tmp_path / "icl_seq"
    n = 3
    for i in range(n):
        _write_frame(str(root / f"rgb/{i}.png"),
                     str(root / f"depth/{i}.png"), i)
    lines = []
    for i in range(n):
        T = np.eye(4)
        T[1, 3] = 0.2 * i
        for r in range(3):
            lines.append(" ".join(f"{v:.6f}" for v in T[r]))
        lines.append("")  # blank separator, as the capture format has
    (root / "livingRoom.gt.sim").write_text("\n".join(lines))
    ds = ICL(str(tmp_path), "icl_seq", camera=CAM)
    _check(ds, n)
    assert abs(ds[2][2][1, 3] + 0.4) < 1e-6  # w2c inverts the +0.4 c2w


def test_record3d_npy_poses_and_factory(tmp_path):
    root = tmp_path / "r3d"
    n = 3
    os.makedirs(root / "poses", exist_ok=True)
    for i in range(n):
        _write_frame(str(root / f"rgb/{i}.png"),
                     str(root / f"depth/{i}.png"), i)
        T = np.eye(4)
        T[2, 3] = 0.1 * i
        np.save(root / "poses" / f"{i}.npy", T)
    ds = load_rgbd_dataset("record3d", str(tmp_path), "r3d", camera=CAM)
    assert isinstance(ds, Record3D)
    _check(ds, n)


def test_nerfcapture_transforms_json(tmp_path):
    root = tmp_path / "capture"
    n = 2
    frames = []
    for i in range(n):
        _write_frame(str(root / f"rgb/{i}.png"),
                     str(root / f"depth/{i}.png"), i)
        T = np.eye(4)
        T[0, 3] = 0.3 * i
        frames.append({"file_path": f"rgb/{i}.png",
                       "transform_matrix": T.tolist()})
    meta = {"fl_x": 60.0, "fl_y": 60.0, "cx": 32.0, "cy": 24.0,
            "h": H0, "w": W0, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))
    ds = NeRFCapture(str(tmp_path), "capture")
    ds.camera.png_depth_scale = 1000.0  # fixture depth is mm
    _check(ds, n)


def test_stride_start_end(tmp_path):
    root = tmp_path / "s"
    for i in range(6):
        _write_frame(str(root / f"color/{i}.jpg"),
                     str(root / f"depth/{i}.png"), i)
    ds = ScanNet(str(tmp_path), "s", camera=CAM, stride=2, start=1, end=6)
    assert len(ds) == 3  # frames 1, 3, 5


def test_quat_pose_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    v = np.concatenate([rng.normal(size=3), q])
    T = quat_pose_to_matrix(v)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12


def test_unknown_dataset_raises(tmp_path):
    with pytest.raises(KeyError):
        load_rgbd_dataset("nope", str(tmp_path))
