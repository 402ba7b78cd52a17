// C ABI bridge: embeds the Python/JAX runtime behind the reference-style
// encoder lifecycle (see video_codec_api.h). Works both standalone (owns the
// interpreter) and when loaded into an existing Python process (uses
// PyGILState). Build: media_tpu/native/__init__.py build_capi().

#include "video_codec_api.h"

#include <Python.h>

#include <cstring>
#include <string>

namespace {

struct PyRef {
  PyObject* p = nullptr;
  PyRef() = default;
  explicit PyRef(PyObject* o) : p(o) {}
  ~PyRef() { Py_XDECREF(p); }
  PyRef(const PyRef&) = delete;
  PyRef& operator=(const PyRef&) = delete;
  PyObject* release() { PyObject* o = p; p = nullptr; return o; }
};

bool g_we_initialized = false;

void ensure_python() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = true;
#if PY_VERSION_HEX < 0x03090000
    PyEval_InitThreads();
#endif
    // Release the GIL taken by Py_Initialize so PyGILState works uniformly.
    PyEval_SaveThread();
  }
}

class Gil {
 public:
  Gil() { state_ = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

}  // namespace

struct MtpuVideoEncoder {
  PyObject* store = nullptr;    // media_tpu.core.params.ParamStore
  PyObject* encoder = nullptr;  // media_tpu.api.VideoEncoder
  std::string last_output;      // owns the EncodeOneFrame result
};

extern "C" {

MtpuVideoEncoder* CreateVideoEncoder(void) {
  ensure_python();
  Gil gil;
  PyRef params_mod(PyImport_ImportModule("media_tpu.core.params"));
  PyRef api_mod(PyImport_ImportModule("media_tpu.api"));
  if (!params_mod.p || !api_mod.p) {
    PyErr_Print();
    return nullptr;
  }
  PyRef store(PyObject_CallMethod(params_mod.p, "ParamStore", nullptr));
  if (!store.p) {
    PyErr_Print();
    return nullptr;
  }
  PyRef enc(PyObject_CallMethod(api_mod.p, "create_video_encoder", "O", store.p));
  if (!enc.p || enc.p == Py_None) {
    PyErr_Print();
    return nullptr;
  }
  auto* h = new MtpuVideoEncoder();
  h->store = store.release();
  h->encoder = enc.release();
  return h;
}

MtpuEncoderRetCode DestroyVideoEncoder(MtpuVideoEncoder* enc) {
  if (!enc) return VIDEO_ENCODER_DESTROY_FAIL;
  Gil gil;
  PyRef r(PyObject_CallMethod(enc->encoder, "destroy_encoder", nullptr));
  Py_XDECREF(enc->encoder);
  Py_XDECREF(enc->store);
  delete enc;
  return VIDEO_ENCODER_SUCCESS;
}

MtpuEncoderRetCode MtpuEncoderSetParam(MtpuVideoEncoder* enc, const char* key,
                                       const char* value) {
  if (!enc || !key || !value) return VIDEO_ENCODER_INVALID_PARAM;
  Gil gil;
  PyRef r(PyObject_CallMethod(enc->store, "set", "ss", key, value));
  if (!r.p) {
    PyErr_Print();
    return VIDEO_ENCODER_INVALID_PARAM;
  }
  return VIDEO_ENCODER_SUCCESS;
}

static MtpuEncoderRetCode call_simple(MtpuVideoEncoder* enc, const char* name,
                                      MtpuEncoderRetCode fail_code) {
  if (!enc) return VIDEO_ENCODER_NOT_INITED;
  Gil gil;
  PyRef r(PyObject_CallMethod(enc->encoder, name, nullptr));
  if (!r.p) {
    PyErr_Print();
    return fail_code;
  }
  long code = PyLong_AsLong(r.p);
  return static_cast<MtpuEncoderRetCode>(code);
}

MtpuEncoderRetCode InitEncoder(MtpuVideoEncoder* enc) {
  return call_simple(enc, "init_encoder", VIDEO_ENCODER_INIT_FAIL);
}

MtpuEncoderRetCode StartEncoder(MtpuVideoEncoder* enc) {
  return call_simple(enc, "start_encoder", VIDEO_ENCODER_START_FAIL);
}

MtpuEncoderRetCode StopEncoder(MtpuVideoEncoder* enc) {
  return call_simple(enc, "stop_encoder", VIDEO_ENCODER_STOP_FAIL);
}

MtpuEncoderRetCode ResetEncoder(MtpuVideoEncoder* enc) {
  return call_simple(enc, "reset_encoder", VIDEO_ENCODER_RESET_FAIL);
}

MtpuEncoderRetCode EncodeOneFrame(MtpuVideoEncoder* enc, const uint8_t* in,
                                  uint32_t in_len, uint8_t** out,
                                  uint32_t* out_len) {
  if (!enc || !in || !out || !out_len) return VIDEO_ENCODER_INVALID_PARAM;
  Gil gil;
  PyRef buf(PyBytes_FromStringAndSize(reinterpret_cast<const char*>(in),
                                      static_cast<Py_ssize_t>(in_len)));
  if (!buf.p) return VIDEO_ENCODER_ENCODE_FAIL;
  PyRef r(PyObject_CallMethod(enc->encoder, "encode_one_frame", "O", buf.p));
  if (!r.p || !PyTuple_Check(r.p) || PyTuple_Size(r.p) != 2) {
    PyErr_Print();
    return VIDEO_ENCODER_ENCODE_FAIL;
  }
  long code = PyLong_AsLong(PyTuple_GetItem(r.p, 0));
  if (code != VIDEO_ENCODER_SUCCESS) {
    return static_cast<MtpuEncoderRetCode>(code);
  }
  PyObject* data = PyTuple_GetItem(r.p, 1);
  char* raw = nullptr;
  Py_ssize_t n = 0;
  if (PyBytes_AsStringAndSize(data, &raw, &n) != 0) {
    PyErr_Print();
    return VIDEO_ENCODER_ENCODE_FAIL;
  }
  enc->last_output.assign(raw, static_cast<size_t>(n));
  *out = reinterpret_cast<uint8_t*>(enc->last_output.data());
  *out_len = static_cast<uint32_t>(n);
  return VIDEO_ENCODER_SUCCESS;
}

}  // extern "C"
