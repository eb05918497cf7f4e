"""Native planner (C++ extension) must match the pure-Python reference
implementation of the proximity NMS edge selection exactly."""

import numpy as np
import pytest

from lgu_slam_tpu.utils import native


def python_proximity_plan(d, ii, jj, existing, t0, t1, t, rad, nms, thresh,
                          max_factors, stereo):
    """Direct transcription of factor_graph.py:319-383."""
    d = d.copy()
    d[ii - rad < jj] = np.inf
    d[d > 100] = np.inf

    def suppress(i, j):
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                    i1, j1 = i + di, j + dj
                    if t0 <= i1 < t and t1 <= j1 < t:
                        d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

    for i, j in existing:
        suppress(i, j)

    es = []
    for i in range(t0, t):
        if stereo:
            es.append((i, i))
            if t1 <= i:
                d[(i - t0) * (t - t1) + (i - t1)] = np.inf
        for j in range(max(i - rad - 1, 0), i):
            es.append((i, j))
            es.append((j, i))
            if t1 <= j < t:
                d[(i - t0) * (t - t1) + (j - t1)] = np.inf

    for k in np.argsort(d, kind="stable"):
        if d[k] > thresh:
            continue
        if len(es) > max_factors:
            break
        i, j = int(ii[k]), int(jj[k])
        es.append((i, j))
        es.append((j, i))
        suppress(i, j)
    return es


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="extension not built")
@pytest.mark.parametrize("stereo", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(seed, stereo):
    rng = np.random.default_rng(seed)
    t, t0, t1 = 24, 3, 0
    ix = np.arange(t0, t)
    jx = np.arange(t1, t)
    ii, jj = np.meshgrid(ix, jx, indexing="ij")
    ii = ii.reshape(-1).astype(np.int32)
    jj = jj.reshape(-1).astype(np.int32)
    d = (rng.random(len(ii)) * 30).astype(np.float32)

    existing = [(5, 7), (7, 5), (10, 12)]
    eii = np.asarray([e[0] for e in existing], np.int32)
    ejj = np.asarray([e[1] for e in existing], np.int32)

    ref = python_proximity_plan(
        d, ii, jj, existing, t0, t1, t, rad=2, nms=2, thresh=16.0,
        max_factors=48, stereo=stereo,
    )
    out = native.proximity_plan(
        d, ii, jj, eii, ejj, t0, t1, t, 2, 2, 16.0, 48, stereo
    )
    assert [tuple(map(int, e)) for e in out] == [
        tuple(map(int, e)) for e in ref
    ]


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="extension not built")
def test_dba_group_rows():
    ii = np.asarray([0, 0, 1, 3, 3, 3], np.int32)
    rof = native.dba_group_rows(ii, 5, 8)
    assert rof.shape == (5, 8)
    assert rof[0, 0] == 0 and rof[0, 1] == 5 and rof[0, 2] == 6
    assert rof[1, 1] == 7
    assert rof[2, 0] == 2 and rof[2, 1] == -1
    assert set(rof[3, 1:4].tolist()) == {8, 9, 10}
