// Native RLE codec + box IoU for the mask pipeline.
//
// C++ replacement for the pycocotools `_mask` C extension the reference
// depends on (/root/reference/stuffs/mask_utils.py:3).  Exposed to Python
// via the CPython C API (no pybind11 in this image); ops/rle.py loads it
// when built and falls back to numpy otherwise.
//
// COCO conventions: column-major (Fortran) mask order; RLE counts alternate
// zero-runs / one-runs starting with zeros.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- decode: counts (int64 array) + (h, w) -> uint8 mask bytes ----------
PyObject* rle_decode(PyObject*, PyObject* args) {
  PyObject* counts_obj;
  long h, w;
  if (!PyArg_ParseTuple(args, "Oll", &counts_obj, &h, &w)) return nullptr;
  PyObject* seq = PySequence_Fast(counts_obj, "counts must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);

  std::vector<uint8_t> out(static_cast<size_t>(h) * w, 0);
  size_t pos = 0;
  uint8_t val = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    long c = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, i));
    if (c < 0 || pos + c > out.size()) {
      Py_DECREF(seq);
      PyErr_SetString(PyExc_ValueError, "invalid RLE counts");
      return nullptr;
    }
    if (val) memset(out.data() + pos, 1, c);
    pos += c;
    val ^= 1;
  }
  Py_DECREF(seq);
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(out.size()));
}

// ---- encode: uint8 Fortran-order mask bytes -> counts list ---------------
PyObject* rle_encode(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  const uint8_t* data = static_cast<const uint8_t*>(buf.buf);
  Py_ssize_t n = buf.len;

  PyObject* counts = PyList_New(0);
  uint8_t cur = 0;
  long run = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    uint8_t v = data[i] ? 1 : 0;
    if (v == cur) {
      run++;
    } else {
      PyObject* item = PyLong_FromLong(run);
      PyList_Append(counts, item);
      Py_DECREF(item);
      cur = v;
      run = 1;
    }
  }
  PyObject* item = PyLong_FromLong(run);
  PyList_Append(counts, item);
  Py_DECREF(item);
  PyBuffer_Release(&buf);
  return counts;
}

// ---- box iou: xywh float64 buffers -> float64 [n1*n2] bytes --------------
PyObject* box_iou_xywh(PyObject*, PyObject* args) {
  Py_buffer b1, b2;
  if (!PyArg_ParseTuple(args, "y*y*", &b1, &b2)) return nullptr;
  Py_ssize_t n1 = b1.len / (4 * sizeof(double));
  Py_ssize_t n2 = b2.len / (4 * sizeof(double));
  const double* p1 = static_cast<const double*>(b1.buf);
  const double* p2 = static_cast<const double*>(b2.buf);
  std::vector<double> out(static_cast<size_t>(n1) * n2);
  for (Py_ssize_t i = 0; i < n1; i++) {
    double x11 = p1[4 * i], y11 = p1[4 * i + 1];
    double w1 = p1[4 * i + 2], h1 = p1[4 * i + 3];
    double a1 = w1 * h1;
    for (Py_ssize_t j = 0; j < n2; j++) {
      double x21 = p2[4 * j], y21 = p2[4 * j + 1];
      double w2 = p2[4 * j + 2], h2 = p2[4 * j + 3];
      double iw = std::min(x11 + w1, x21 + w2) - std::max(x11, x21);
      double ih = std::min(y11 + h1, y21 + h2) - std::max(y11, y21);
      double inter = (iw > 0 && ih > 0) ? iw * ih : 0.0;
      double uni = a1 + w2 * h2 - inter;
      out[i * n2 + j] = uni > 0 ? inter / uni : 0.0;
    }
  }
  PyBuffer_Release(&b1);
  PyBuffer_Release(&b2);
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(out.size() * sizeof(double)));
}

PyMethodDef Methods[] = {
    {"rle_decode", rle_decode, METH_VARARGS, "decode(counts, h, w) -> F-order bytes"},
    {"rle_encode", rle_encode, METH_VARARGS, "encode(F-order mask bytes) -> counts"},
    {"box_iou_xywh", box_iou_xywh, METH_VARARGS, "iou(b1 f64 bytes, b2) -> f64 bytes"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_seamops", "native RLE/IoU ops", -1, Methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__seamops(void) { return PyModule_Create(&moduledef); }
