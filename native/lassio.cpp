// lassio — native host-side audio decode for the lass_tpu input pipeline.
//
// The reference's data layer leans on torchaudio's C++ decoders
// (audiotext_dataset.py:61); this extension is the TPU-framework
// equivalent for the host: a RIFF/WAVE parser + PCM->float32 conversion +
// mono mixdown implemented in C++ (the per-item byte-crunching that
// dominates Python-side loading), exposed via the raw CPython C API
// (no pybind11 in this image). lass_tpu.audio.io transparently uses it
// when built and falls back to the pure-python codec otherwise.
//
// Exports:
//   decode_wav(bytes, mono: bool) -> (float32 ndarray (C, N) or (1, N), sr)
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;
  size_t data_size = 0;
};

bool parse_wav(const uint8_t* buf, size_t n, WavInfo* out, const char** err) {
  if (n < 12 || std::memcmp(buf, "RIFF", 4) != 0 ||
      std::memcmp(buf + 8, "WAVE", 4) != 0) {
    *err = "not a RIFF/WAVE file";
    return false;
  }
  size_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= n) {
    const uint8_t* id = buf + pos;
    uint32_t size;
    std::memcpy(&size, buf + pos + 4, 4);
    pos += 8;
    if (pos + size > n) size = static_cast<uint32_t>(n - pos);
    if (std::memcmp(id, "fmt ", 4) == 0 && size >= 16) {
      std::memcpy(&out->format, buf + pos, 2);
      std::memcpy(&out->channels, buf + pos + 2, 2);
      std::memcpy(&out->sample_rate, buf + pos + 4, 4);
      std::memcpy(&out->bits, buf + pos + 14, 2);
      if (out->format == 0xFFFE && size >= 26) {
        std::memcpy(&out->format, buf + pos + 24, 2);
      }
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      out->data = buf + pos;
      out->data_size = size;
    }
    pos += size + (size & 1);
    if (have_fmt && out->data != nullptr) break;
  }
  if (!have_fmt || out->data == nullptr) {
    *err = "missing fmt/data chunk";
    return false;
  }
  if (out->channels == 0) {
    *err = "zero channels";
    return false;
  }
  return true;
}

// Convert one interleaved frame stream to float32 planar (C, N) or mono.
template <typename Fetch>
void convert(const WavInfo& w, size_t frames, bool mono, float* dst,
             Fetch fetch) {
  const size_t c = w.channels;
  if (mono && c > 1) {
    const float inv = 1.0f / static_cast<float>(c);
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.0f;
      for (size_t ch = 0; ch < c; ++ch) acc += fetch(i * c + ch);
      dst[i] = acc * inv;
    }
  } else {
    for (size_t ch = 0; ch < c; ++ch) {
      float* row = dst + ch * frames;
      for (size_t i = 0; i < frames; ++i) row[i] = fetch(i * c + ch);
    }
  }
}

PyObject* decode_wav(PyObject*, PyObject* args) {
  Py_buffer view;
  int mono = 0;
  if (!PyArg_ParseTuple(args, "y*p", &view, &mono)) return nullptr;
  const uint8_t* buf = static_cast<const uint8_t*>(view.buf);
  const size_t n = static_cast<size_t>(view.len);

  WavInfo w;
  const char* err = nullptr;
  if (!parse_wav(buf, n, &w, &err)) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, err);
    return nullptr;
  }

  const size_t bytes_per = w.bits / 8;
  const size_t frames =
      bytes_per && w.channels ? w.data_size / (bytes_per * w.channels) : 0;
  const size_t out_ch = (mono || w.channels == 1) ? 1 : w.channels;

  npy_intp dims[2] = {static_cast<npy_intp>(out_ch),
                      static_cast<npy_intp>(frames)};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (arr == nullptr) {
    PyBuffer_Release(&view);
    return nullptr;
  }
  float* dst =
      static_cast<float*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
  const uint8_t* d = w.data;
  bool ok = true;

  Py_BEGIN_ALLOW_THREADS;
  if (w.format == 1 && w.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(d);
    convert(w, frames, mono, dst,
            [s](size_t i) { return static_cast<float>(s[i]) / 32768.0f; });
  } else if (w.format == 1 && w.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(d);
    convert(w, frames, mono, dst, [s](size_t i) {
      return static_cast<float>(s[i]) / 2147483648.0f;
    });
  } else if (w.format == 1 && w.bits == 24) {
    convert(w, frames, mono, dst, [d](size_t i) {
      const uint8_t* p = d + 3 * i;
      int32_t v = (p[0] | (p[1] << 8) | (p[2] << 16)) << 8;
      return static_cast<float>(v >> 8) / 8388608.0f;
    });
  } else if (w.format == 1 && w.bits == 8) {
    convert(w, frames, mono, dst, [d](size_t i) {
      return (static_cast<float>(d[i]) - 128.0f) / 128.0f;
    });
  } else if (w.format == 3 && w.bits == 32) {
    const float* s = reinterpret_cast<const float*>(d);
    convert(w, frames, mono, dst, [s](size_t i) { return s[i]; });
  } else if (w.format == 3 && w.bits == 64) {
    const double* s = reinterpret_cast<const double*>(d);
    convert(w, frames, mono, dst,
            [s](size_t i) { return static_cast<float>(s[i]); });
  } else {
    ok = false;
  }
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&view);
  if (!ok) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "unsupported WAVE encoding");
    return nullptr;
  }
  return Py_BuildValue("(Ni)", arr, static_cast<int>(w.sample_rate));
}

PyMethodDef methods[] = {
    {"decode_wav", decode_wav, METH_VARARGS,
     "decode_wav(bytes, mono) -> (float32 (C, N), sample_rate)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "lassio",
    "native WAV decode for lass_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_lassio(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
