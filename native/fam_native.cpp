// Native host-side harness support for the TPU flash-attention framework.
//
// Role parity with the reference's Obj-C++ host program (main.mm): the
// compute kernels are device code (there: MSL, here: Pallas/Mosaic), and
// the host harness is native.  The reference's host loop owns timing
// (std::chrono around dispatch, main.mm:676-698) and CSV emission
// (main.mm:867-878); this module provides those host-side services to the
// Python harness as a CPython extension:
//
//   * monotonic_ns()      — CLOCK_MONOTONIC_RAW timestamps, immune to NTP
//                           slew (the reference's steady_clock analog).
//   * busy_wait_ns(n)     — spin-wait for calibration of timer overhead.
//   * write_csv(path, header, rows) — buffered CSV writer.
//   * percentile(sorted?, values, q) — exact percentile on a double list
//                           (median/p99 for the benchmark harness).
//
// Build: `make -C native` produces fam_native.*.so next to the package's
// utils/ so `from . import _native_timer` resolves; pure-Python fallbacks
// keep everything working when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <ctime>
#include <string>
#include <vector>

namespace {

static inline int64_t now_ns() {
  timespec ts;
#ifdef CLOCK_MONOTONIC_RAW
  clock_gettime(CLOCK_MONOTONIC_RAW, &ts);
#else
  clock_gettime(CLOCK_MONOTONIC, &ts);
#endif
  return static_cast<int64_t>(ts.tv_sec) * 1000000000LL + ts.tv_nsec;
}

PyObject* py_monotonic_ns(PyObject*, PyObject*) {
  return PyLong_FromLongLong(now_ns());
}

PyObject* py_busy_wait_ns(PyObject*, PyObject* arg) {
  const int64_t dur = PyLong_AsLongLong(arg);
  if (PyErr_Occurred()) return nullptr;
  const int64_t end = now_ns() + dur;
  while (now_ns() < end) {
  }
  Py_RETURN_NONE;
}

// write_csv(path: str, header: str, rows: list[list[float|str]]) -> int
PyObject* py_write_csv(PyObject*, PyObject* args) {
  const char* path;
  const char* header;
  PyObject* rows;
  if (!PyArg_ParseTuple(args, "ssO", &path, &header, &rows)) return nullptr;
  if (!PyList_Check(rows)) {
    PyErr_SetString(PyExc_TypeError, "rows must be a list of lists");
    return nullptr;
  }
  std::string out;
  out.reserve(4096);
  out += header;
  out += '\n';
  const Py_ssize_t n = PyList_Size(rows);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* row = PyList_GetItem(rows, i);
    if (!PyList_Check(row) && !PyTuple_Check(row)) {
      PyErr_SetString(PyExc_TypeError, "each row must be list/tuple");
      return nullptr;
    }
    PyObject* fast = PySequence_Fast(row, "row");
    if (!fast) return nullptr;
    const Py_ssize_t m = PySequence_Fast_GET_SIZE(fast);
    for (Py_ssize_t j = 0; j < m; ++j) {
      if (j) out += ',';
      PyObject* cell = PySequence_Fast_GET_ITEM(fast, j);
      if (PyFloat_Check(cell)) {
        char buf[64];
        snprintf(buf, sizeof buf, "%.6g", PyFloat_AS_DOUBLE(cell));
        out += buf;
      } else if (PyLong_Check(cell)) {
        PyObject* s = PyObject_Str(cell);
        out += PyUnicode_AsUTF8(s);
        Py_DECREF(s);
      } else if (PyUnicode_Check(cell)) {
        out += PyUnicode_AsUTF8(cell);
      } else if (cell == Py_None) {
        // empty cell
      } else {
        Py_DECREF(fast);
        PyErr_SetString(PyExc_TypeError, "cell must be float/int/str/None");
        return nullptr;
      }
    }
    Py_DECREF(fast);
    out += '\n';
  }
  FILE* f = fopen(path, "w");
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  fwrite(out.data(), 1, out.size(), f);
  fclose(f);
  return PyLong_FromSsize_t(n);
}

// percentile(values: list[float], q: float in [0,100]) -> float
PyObject* py_percentile(PyObject*, PyObject* args) {
  PyObject* values;
  double q;
  if (!PyArg_ParseTuple(args, "Od", &values, &q)) return nullptr;
  PyObject* fast = PySequence_Fast(values, "values");
  if (!fast) return nullptr;
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  if (n == 0) {
    Py_DECREF(fast);
    PyErr_SetString(PyExc_ValueError, "empty values");
    return nullptr;
  }
  std::vector<double> v(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    v[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
    if (PyErr_Occurred()) {
      Py_DECREF(fast);
      return nullptr;
    }
  }
  Py_DECREF(fast);
  std::sort(v.begin(), v.end());
  const double pos = (q / 100.0) * (n - 1);
  const size_t lo = static_cast<size_t>(pos);
  const size_t hi = std::min(lo + 1, static_cast<size_t>(n - 1));
  const double frac = pos - lo;
  return PyFloat_FromDouble(v[lo] * (1.0 - frac) + v[hi] * frac);
}

PyMethodDef kMethods[] = {
    {"monotonic_ns", py_monotonic_ns, METH_NOARGS,
     "CLOCK_MONOTONIC_RAW nanoseconds."},
    {"busy_wait_ns", py_busy_wait_ns, METH_O,
     "Spin-wait for n nanoseconds (timer calibration)."},
    {"write_csv", py_write_csv, METH_VARARGS,
     "write_csv(path, header, rows) -> row count."},
    {"percentile", py_percentile, METH_VARARGS,
     "percentile(values, q) -> interpolated percentile."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT,
    "_native_timer",
    "Native timing/CSV services for the benchmark harness.",
    -1,
    kMethods,
    nullptr,
    nullptr,
    nullptr,
    nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__native_timer(void) { return PyModule_Create(&kModule); }
