"""C ABI bridge: drive the reference-style C lifecycle (CreateVideoEncoder /
InitEncoder / StartEncoder / EncodeOneFrame / DestroyVideoEncoder) through
the compiled libVideoCodec shared library via ctypes, and decode the result."""

import ctypes

import numpy as np
import pytest

from media_tpu import native
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv

_SO = native.build_capi()
pytestmark = pytest.mark.skipif(_SO is None, reason="C ABI build unavailable")


def _lib():
    lib = ctypes.CDLL(_SO)
    lib.CreateVideoEncoder.restype = ctypes.c_void_p
    lib.DestroyVideoEncoder.argtypes = [ctypes.c_void_p]
    lib.MtpuEncoderSetParam.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.InitEncoder.argtypes = [ctypes.c_void_p]
    lib.StartEncoder.argtypes = [ctypes.c_void_p]
    lib.StopEncoder.argtypes = [ctypes.c_void_p]
    lib.EncodeOneFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    return lib


def test_c_abi_lifecycle_roundtrip():
    lib = _lib()
    enc = lib.CreateVideoEncoder()
    assert enc

    w, h = 64, 48
    assert lib.MtpuEncoderSetParam(enc, b"ro.hardware.width", str(w).encode()) == 0
    assert lib.MtpuEncoderSetParam(enc, b"ro.hardware.height", str(h).encode()) == 0
    assert lib.InitEncoder(enc) == 0
    assert lib.StartEncoder(enc) == 0

    rng = np.random.default_rng(0)
    dec = ReferenceDecoder()
    for t in range(2):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        buf = yuv.pack_i420(y, u, v)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        out_len = ctypes.c_uint32()
        code = lib.EncodeOneFrame(enc, buf, len(buf),
                                  ctypes.byref(out_ptr), ctypes.byref(out_len))
        assert code == 0, code
        data = ctypes.string_at(out_ptr, out_len.value)
        assert data.startswith(b"\x00\x00\x00\x01")
        frames = dec.decode_annexb(data)
        assert len(frames) == 1

    # Guards: short input must return INVALID_PARAM (0x09).
    code = lib.EncodeOneFrame(enc, b"xx", 2, ctypes.byref(out_ptr), ctypes.byref(out_len))
    assert code == 0x09
    assert lib.StopEncoder(enc) == 0
    assert lib.DestroyVideoEncoder(enc) == 0
