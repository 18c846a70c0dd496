// fastio — native IO hot paths for dynslam_tpu.
//
// The reference's instance-mask loader parses numpy-text masks at ~16 ms
// per mask on the CPU (PrecomputedSegmentationProvider.cpp:38, a known
// bottleneck it logs). This module provides C++ parsers for the three
// text/binary formats on the per-frame IO path:
//   - read_text_mask(path, height, width) -> uint8 (H, W)
//       numpy-text binary masks of the MNC dumps
//   - read_pfm(path) -> float32 (H, W) | (H, W, 3)
//       DispNet disparity maps (pfmLib's ReadFilePFM equivalent)
//   - read_velodyne(path) -> float32 (N, 4)
//       KITTI LIDAR dumps
//
// Built as a plain CPython extension (no pybind11 in this environment);
// see build.py. dynslam_tpu falls back to numpy implementations when the
// extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// read a whole file into a buffer; returns false on failure
bool ReadFile(const char *path, std::vector<char> &buf) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(buf.data(), 1, buf.size(), f) : 0;
  std::fclose(f);
  return got == buf.size();
}

PyObject *ReadTextMask(PyObject *, PyObject *args) {
  const char *path;
  int height, width;
  if (!PyArg_ParseTuple(args, "sii", &path, &height, &width)) return nullptr;

  std::vector<char> buf;
  if (!ReadFile(path, buf)) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot read mask file %s", path);
    return nullptr;
  }

  npy_intp dims[2] = {height, width};
  PyObject *arr = PyArray_ZEROS(2, dims, NPY_UINT8, 0);
  if (!arr) return nullptr;
  uint8_t *out = static_cast<uint8_t *>(
      PyArray_DATA(reinterpret_cast<PyArrayObject *>(arr)));

  // parse whitespace-separated numeric tokens; the files store floats like
  // "1.000000000000000000e+00" (or plain "1"), one row per line
  const char *p = buf.data();
  const char *end = p + buf.size();
  long count = 0;
  const long total = static_cast<long>(height) * width;
  while (p < end && count < total) {
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    if (p >= end) break;
    char *next = nullptr;
    double v = std::strtod(p, &next);
    if (next == p) {
      Py_DECREF(arr);
      PyErr_Format(PyExc_ValueError, "bad token in mask file %s at offset %ld",
                   path, static_cast<long>(p - buf.data()));
      return nullptr;
    }
    out[count++] = static_cast<uint8_t>(v);
    p = next;
  }
  // skip trailing whitespace; anything else means a shape mismatch
  while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p;
  if (count != total || p != end) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_ValueError,
                 "mask file %s has %ld values; expected %dx%d=%ld", path,
                 count, height, width, total);
    return nullptr;
  }
  return arr;
}

bool IsLittleEndianHost() {
  const uint16_t one = 1;
  return *reinterpret_cast<const uint8_t *>(&one) == 1;
}

PyObject *ReadPfm(PyObject *, PyObject *args) {
  const char *path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::vector<char> buf;
  if (!ReadFile(path, buf)) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot read PFM file %s", path);
    return nullptr;
  }
  const char *p = buf.data();
  const char *end = p + buf.size();

  auto next_token = [&](std::string &tok) -> bool {
    while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
    // skip comment lines
    while (p < end && *p == '#') {
      while (p < end && *p != '\n') ++p;
      while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
    }
    tok.clear();
    while (p < end && !std::isspace(static_cast<unsigned char>(*p)))
      tok.push_back(*p++);
    return !tok.empty();
  };

  std::string header, ws, hs, ss;
  if (!next_token(header) || (header != "PF" && header != "Pf")) {
    PyErr_Format(PyExc_ValueError, "not a PFM file: %s", path);
    return nullptr;
  }
  const int channels = (header == "PF") ? 3 : 1;
  if (!next_token(ws) || !next_token(hs) || !next_token(ss)) {
    PyErr_Format(PyExc_ValueError, "truncated PFM header: %s", path);
    return nullptr;
  }
  const long width = std::strtol(ws.c_str(), nullptr, 10);
  const long height = std::strtol(hs.c_str(), nullptr, 10);
  const double scale = std::strtod(ss.c_str(), nullptr);
  if (width <= 0 || height <= 0) {
    PyErr_Format(PyExc_ValueError, "bad PFM dims in %s", path);
    return nullptr;
  }
  ++p;  // single whitespace after the scale line

  const long count = width * height * channels;
  if (end - p < static_cast<long>(count * sizeof(float))) {
    PyErr_Format(PyExc_ValueError, "truncated PFM payload in %s", path);
    return nullptr;
  }

  npy_intp dims3[3] = {height, width, channels};
  PyObject *arr = PyArray_SimpleNew(channels == 3 ? 3 : 2, dims3, NPY_FLOAT32);
  if (!arr) return nullptr;
  float *out = static_cast<float *>(
      PyArray_DATA(reinterpret_cast<PyArrayObject *>(arr)));

  const bool file_le = scale < 0.0;
  const bool swap = file_le != IsLittleEndianHost();
  const float *src = reinterpret_cast<const float *>(p);
  const long row_elems = width * channels;
  for (long r = 0; r < height; ++r) {
    // PFM rows are stored bottom-up
    const float *src_row = src + (height - 1 - r) * row_elems;
    float *dst_row = out + r * row_elems;
    if (!swap) {
      std::memcpy(dst_row, src_row, row_elems * sizeof(float));
    } else {
      for (long c = 0; c < row_elems; ++c) {
        uint32_t v;
        std::memcpy(&v, &src_row[c], 4);
        v = __builtin_bswap32(v);
        std::memcpy(&dst_row[c], &v, 4);
      }
    }
  }
  return arr;
}

PyObject *ReadVelodyne(PyObject *, PyObject *args) {
  const char *path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::vector<char> buf;
  if (!ReadFile(path, buf)) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot read velodyne file %s",
                 path);
    return nullptr;
  }
  if (buf.size() % (4 * sizeof(float)) != 0) {
    PyErr_Format(PyExc_ValueError,
                 "corrupt velodyne frame %s: %zu bytes is not a multiple of "
                 "16", path, buf.size());
    return nullptr;
  }
  const npy_intp n = static_cast<npy_intp>(buf.size() / (4 * sizeof(float)));
  npy_intp dims[2] = {n, 4};
  PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject *>(arr)),
              buf.data(), buf.size());
  return arr;
}

PyMethodDef kMethods[] = {
    {"read_text_mask", ReadTextMask, METH_VARARGS,
     "read_text_mask(path, height, width) -> uint8 (H, W) mask"},
    {"read_pfm", ReadPfm, METH_VARARGS,
     "read_pfm(path) -> float32 (H, W) or (H, W, 3), top-down"},
    {"read_velodyne", ReadVelodyne, METH_VARARGS,
     "read_velodyne(path) -> float32 (N, 4)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "fastio",
    "native IO hot paths (text masks, PFM, velodyne)", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_fastio(void) {
  import_array();
  return PyModule_Create(&kModule);
}
