"""Incremental reconstruction export: the dirty-flag protocol has a
consumer (reference droid_slam/visualization.py:81-154)."""

import os

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.visualization import IncrementalReconstruction
from lgu_slam_tpu.utils.config import SLAMConfig

from tests.test_lowmem import stage_video


def test_incremental_export_consumes_dirty(tmp_path, rng):
    cfg = SLAMConfig(image_size=(64, 96), buffer=16)
    video = stage_video(cfg, T=6, seed=1)
    T = video.counter
    # plausible scene depth so the filter keeps points
    video.state = video.state._replace(
        disps=video.state.disps.at[:T].set(0.5)
    )

    inc = IncrementalReconstruction(video, filter_thresh=10.0,
                                    filter_count=1)
    video.dirty[:4] = True
    n = inc.update()
    assert n == 4
    assert not video.dirty[:T].any()  # flags consumed
    assert set(inc.points) == {0, 1, 2, 3}

    # no dirty frames -> no work
    assert inc.update() == 0

    # frames 4,5 become dirty later; caches grow, 0-3 untouched
    before = {k: v[0].shape for k, v in inc.points.items()}
    video.dirty[4:6] = True
    assert inc.update() == 2
    assert set(inc.points) == set(range(6))
    for k, shp in before.items():
        assert inc.points[k][0].shape == shp

    ply = tmp_path / "pts.ply"
    fru = tmp_path / "cams.ply"
    npts = inc.export_ply(str(ply))
    ncams = inc.export_frusta(str(fru))
    assert ncams == 6
    assert os.path.getsize(str(fru)) > 100
    header = open(ply, "rb").read(200).decode(errors="ignore")
    assert f"element vertex {npts}" in header
