"""Loader for the native host-side planner with pure-Python fallback.

``import lgu_slam_tpu.utils.native as native`` then use
``native.proximity_plan(...)`` — dispatches to the C++ extension when
built (``python setup.py build_ext --inplace``), else to the reference
Python implementation in the factor graph.
"""

from __future__ import annotations

import numpy as np

try:
    import lgu_native as _ext

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - environment dependent
    _ext = None
    HAVE_NATIVE = False


def proximity_plan(d, ii, jj, existing_ii, existing_jj, t0, t1, t, rad, nms,
                   thresh, max_factors, stereo):
    """Returns the selected (i, j) edge list (see factor_graph.py:319-383)."""
    if not HAVE_NATIVE:
        return None  # caller falls back to the Python path
    return _ext.proximity_plan(
        np.ascontiguousarray(d, np.float32),
        np.ascontiguousarray(ii, np.int32),
        np.ascontiguousarray(jj, np.int32),
        np.ascontiguousarray(existing_ii, np.int32),
        np.ascontiguousarray(existing_jj, np.int32),
        int(t0), int(t1), int(t), int(rad), int(nms), float(thresh),
        int(max_factors), int(bool(stereo)),
    )


def dba_group_rows(ii, num_frames, dmax):
    if not HAVE_NATIVE:
        return None
    raw = _ext.dba_group_rows(
        np.ascontiguousarray(ii, np.int32), int(num_frames), int(dmax)
    )
    return np.frombuffer(raw, np.int32).reshape(num_frames, dmax).copy()
