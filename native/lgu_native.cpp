// Host-side graph planning for LGU-SLAM-TPU (C++ CPython extension).
//
// TPU-native counterpart of the reference's host/native runtime pieces:
// - proximity_plan: the distance-ranked edge selection with Manhattan NMS
//   from droid_slam/factor_graph.py:319-383 (O(t^2 log + k * nms^2) scalar
//   loops that dominate host time for backend graphs at t ~ 500);
// - dba_plan: per-topology row grouping for the DBA Schur product
//   (the planning role of accum_cuda's CPU CSR construction,
//   src/droid_kernels.cu:948-998).
//
// Pure CPython C API (no pybind11 in this image); operates on NumPy
// buffers via the buffer protocol.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <numeric>
#include <string>
#include <vector>

namespace {

struct BufferView {
  Py_buffer view{};
  bool ok = false;
  ~BufferView() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj, const char* fmt_expect, int flags = PyBUF_CONTIG_RO) {
    if (PyObject_GetBuffer(obj, &view, flags | PyBUF_FORMAT) != 0) return false;
    ok = true;
    if (fmt_expect && view.format && std::string(view.format) != fmt_expect) {
      PyErr_Format(PyExc_TypeError, "expected dtype '%s', got '%s'",
                   fmt_expect, view.format ? view.format : "?");
      return false;
    }
    return true;
  }
  template <typename T>
  const T* data() const {
    return static_cast<const T*>(view.buf);
  }
  Py_ssize_t size() const { return view.len / view.itemsize; }
};

// proximity_plan(d, ii, jj, existing_ii, existing_jj, t0, t1, t, rad, nms,
//                thresh, max_factors, stereo) -> list[(i, j)]
PyObject* proximity_plan(PyObject*, PyObject* args) {
  PyObject *d_obj, *ii_obj, *jj_obj, *eii_obj, *ejj_obj;
  long t0, t1, t, rad, nms, max_factors;
  double thresh;
  int stereo;
  if (!PyArg_ParseTuple(args, "OOOOOlllll" "dli", &d_obj, &ii_obj, &jj_obj,
                        &eii_obj, &ejj_obj, &t0, &t1, &t, &rad, &nms, &thresh,
                        &max_factors, &stereo))
    return nullptr;

  BufferView db, iib, jjb, eiib, ejjb;
  if (!db.acquire(d_obj, "f")) return nullptr;
  if (!iib.acquire(ii_obj, "i")) return nullptr;
  if (!jjb.acquire(jj_obj, "i")) return nullptr;
  if (!eiib.acquire(eii_obj, "i")) return nullptr;
  if (!ejjb.acquire(ejj_obj, "i")) return nullptr;

  const float* d_in = db.data<float>();
  const int32_t* ii = iib.data<int32_t>();
  const int32_t* jj = jjb.data<int32_t>();
  const Py_ssize_t n = db.size();

  std::vector<float> d(d_in, d_in + n);
  const float INF = std::numeric_limits<float>::infinity();

  // base suppression (factor_graph.py:331-332)
  for (Py_ssize_t k = 0; k < n; k++) {
    if (ii[k] - rad < jj[k]) d[k] = INF;
    if (d[k] > 100.0f) d[k] = INF;
  }

  auto suppress = [&](long i, long j) {
    long lim = std::max(std::min(std::labs(i - j) - 2, nms), 0L);
    for (long di = -nms; di <= nms; di++)
      for (long dj = -nms; dj <= nms; dj++) {
        if (std::labs(di) + std::labs(dj) > lim) continue;
        long i1 = i + di, j1 = j + dj;
        if (t0 <= i1 && i1 < t && t1 <= j1 && j1 < t)
          d[(i1 - t0) * (t - t1) + (j1 - t1)] = INF;
      }
  };

  // suppress around existing / bad / inactive edges (:334-344)
  const int32_t* eii = eiib.data<int32_t>();
  const int32_t* ejj = ejjb.data<int32_t>();
  for (Py_ssize_t k = 0; k < eiib.size(); k++) suppress(eii[k], ejj[k]);

  std::vector<std::pair<long, long>> es;
  for (long i = t0; i < t; i++) {
    if (stereo) {
      es.emplace_back(i, i);
      if (t1 <= i) d[(i - t0) * (t - t1) + (i - t1)] = INF;
    }
    for (long j = std::max(i - rad - 1, 0L); j < i; j++) {
      es.emplace_back(i, j);
      es.emplace_back(j, i);
      if (t1 <= j && j < t) d[(i - t0) * (t - t1) + (j - t1)] = INF;
    }
  }

  std::vector<Py_ssize_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](Py_ssize_t a, Py_ssize_t b) { return d_in[a] < d_in[b]; });

  for (Py_ssize_t k : order) {
    if (d[k] > thresh) continue;
    if ((long)es.size() > max_factors) break;
    long i = ii[k], j = jj[k];
    es.emplace_back(i, j);
    es.emplace_back(j, i);
    suppress(i, j);
  }

  PyObject* out = PyList_New((Py_ssize_t)es.size());
  if (!out) return nullptr;
  for (Py_ssize_t k = 0; k < (Py_ssize_t)es.size(); k++) {
    PyObject* pair = Py_BuildValue("(ll)", es[k].first, es[k].second);
    if (!pair) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, k, pair);
  }
  return out;
}

// dba_group_rows(ii, num_frames, dmax) -> bytes of int32 [num_frames, dmax]
// rows_of_frame: self row k first, then edge rows (num_frames + e), -1 pad.
PyObject* dba_group_rows(PyObject*, PyObject* args) {
  PyObject* ii_obj;
  long num_frames, dmax;
  if (!PyArg_ParseTuple(args, "Oll", &ii_obj, &num_frames, &dmax))
    return nullptr;
  BufferView iib;
  if (!iib.acquire(ii_obj, "i")) return nullptr;
  const int32_t* ii = iib.data<int32_t>();
  const Py_ssize_t E = iib.size();

  std::vector<int32_t> rof((size_t)num_frames * dmax, -1);
  std::vector<int32_t> fill(num_frames, 0);
  for (long k = 0; k < num_frames; k++) {
    rof[(size_t)k * dmax] = (int32_t)k;
    fill[k] = 1;
  }
  for (Py_ssize_t e = 0; e < E; e++) {
    int32_t k = ii[e];
    if (k < 0 || k >= num_frames) continue;
    if (fill[k] >= dmax) {
      PyErr_Format(PyExc_ValueError, "frame %d degree exceeds dmax %ld",
                   (int)k, dmax);
      return nullptr;
    }
    rof[(size_t)k * dmax + fill[k]++] = (int32_t)(num_frames + e);
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(rof.data()),
      (Py_ssize_t)(rof.size() * sizeof(int32_t)));
}

PyMethodDef methods[] = {
    {"proximity_plan", proximity_plan, METH_VARARGS,
     "Distance-ranked proximity edge selection with NMS."},
    {"dba_group_rows", dba_group_rows, METH_VARARGS,
     "Group DBA E-matrix rows by depth frame."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "lgu_native",
    "Native host-side graph planning for LGU-SLAM-TPU", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_lgu_native(void) { return PyModule_Create(&moduledef); }
