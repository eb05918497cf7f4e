"""Live interactive viewer: HTTP surface + versioned binary snapshot
protocol (reference droid_slam/visualization.py:1-154 — the Open3D
window is replaced by a zero-dependency web viewer; the dirty-driven
refresh contract is the same)."""

import http.client
import struct

import numpy as np

from lgu_slam_tpu.slam.live_viewer import LiveViewer
from lgu_slam_tpu.slam.visualization import IncrementalReconstruction
from lgu_slam_tpu.utils.config import SLAMConfig

from tests.test_lowmem import stage_video


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, r.getheader("Content-Type"), body


def _parse(body):
    ver, n, nc = struct.unpack_from("<III", body, 0)
    off = 12
    xyz = np.frombuffer(body, "<f4", n * 3, off).reshape(n, 3)
    off += n * 12
    rgb = np.frombuffer(body, "u1", n * 3, off).reshape(n, 3)
    off += n * 3
    cams = np.frombuffer(body, "<f4", nc * 12, off).reshape(nc, 12)
    assert off + nc * 48 == len(body)
    return ver, xyz, rgb, cams


def test_live_viewer_serves_and_versions(rng):
    cfg = SLAMConfig(image_size=(64, 96), buffer=16)
    video = stage_video(cfg, T=6, seed=1)
    T = video.counter
    video.state = video.state._replace(
        disps=video.state.disps.at[:T].set(0.5))

    inc = IncrementalReconstruction(video, filter_thresh=10.0,
                                    filter_count=1)
    viewer = LiveViewer(inc, port=0)
    try:
        # page
        status, ctype, body = _get(viewer.port, "/")
        assert status == 200 and "text/html" in ctype
        assert b"webgl" in body

        # empty initial snapshot, version 0
        status, _, body = _get(viewer.port, "/cloud")
        assert status == 200
        ver, xyz, _, cams = _parse(body)
        assert ver == 0 and len(xyz) == 0 and len(cams) == 0

        # dirty frames -> refresh bumps version and publishes points
        video.dirty[:4] = True
        assert viewer.refresh() == 4
        status, _, body = _get(viewer.port, "/cloud")
        ver1, xyz, rgb, cams = _parse(body)
        assert ver1 == 1
        assert len(xyz) > 0 and len(rgb) == len(xyz)
        assert len(cams) == 4
        assert np.isfinite(xyz).all() and np.isfinite(cams).all()

        # conditional fetch: up-to-date client gets 304, stale gets 200
        status, _, _ = _get(viewer.port, f"/cloud?have={ver1}")
        assert status == 304
        status, _, _ = _get(viewer.port, "/cloud?have=0")
        assert status == 200

        # no dirty frames -> no version bump
        assert viewer.refresh() == 0
        status, _, body = _get(viewer.port, "/cloud")
        assert _parse(body)[0] == ver1

        # later frames arrive -> version advances, cloud grows
        video.dirty[4:6] = True
        assert viewer.refresh() == 2
        _, _, body = _get(viewer.port, "/cloud")
        ver2, xyz2, _, cams2 = _parse(body)
        assert ver2 == 2 and len(cams2) == 6 and len(xyz2) >= len(xyz)
    finally:
        viewer.close()
