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

    # Guards: short input must return ENCODE_FAIL (0x04), the reference's
    # contract (VideoEncoderOpenH264.cpp:307-310).
    code = lib.EncodeOneFrame(enc, b"xx", 2, ctypes.byref(out_ptr), ctypes.byref(out_len))
    assert code == 0x04
    assert lib.StopEncoder(enc) == 0
    assert lib.DestroyVideoEncoder(enc) == 0


def test_c_abi_decoder_loop():
    """Decoder C ABI: Create/Init/SetParams/Start -> Send/Retrieve loop with
    the reference's backpressure + EOS codes, driven end-to-end against AUs
    from the encoder half."""
    lib = _lib()
    lib.CreateVideoDecoder.restype = ctypes.c_void_p
    lib.DestroyVideoDecoder.argtypes = [ctypes.c_void_p]
    lib.MtpuCreateDecoder.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.InitDecoder.argtypes = [ctypes.c_void_p]
    lib.SetDecodeParams.argtypes = [ctypes.c_void_p] + [ctypes.c_uint32] * 3
    lib.StartDecoder.argtypes = [ctypes.c_void_p]
    lib.StopDecoder.argtypes = [ctypes.c_void_p]
    lib.SendStreamData.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32]
    lib.RetrieveFrameData.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]

    w, h = 64, 48
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession

    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30, gop_size=4))
    rng = np.random.default_rng(1)
    aus = []
    for t in range(3):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        aus.append(sess.encode_frame(yuv.pack_i420(y, u, v)))

    dec = lib.CreateVideoDecoder()
    assert dec
    assert lib.MtpuCreateDecoder(dec, 0) == 0
    assert lib.InitDecoder(dec) == 0
    assert lib.SetDecodeParams(dec, w, h, 0) == 0
    assert lib.StartDecoder(dec) == 0

    filled = ctypes.c_uint32()
    ow = ctypes.c_uint32()
    oh = ctypes.c_uint32()
    buf = ctypes.create_string_buffer(w * h * 3 // 2)
    # Underflow before any data (reference READ_UNDERFLOW == 12).
    assert lib.RetrieveFrameData(dec, buf, len(buf), ctypes.byref(filled),
                                 ctypes.byref(ow), ctypes.byref(oh)) == 12

    got = 0
    stream = b"".join(aus) + b"\x00\x00\x01\x0c"  # trailing end-of-stream NAL
    assert lib.SendStreamData(dec, stream, len(stream)) == 0
    assert lib.SendStreamData(dec, b"", 0) == 0  # len==0: EOS marker
    while True:
        code = lib.RetrieveFrameData(dec, buf, len(buf), ctypes.byref(filled),
                                     ctypes.byref(ow), ctypes.byref(oh))
        if code == 14:  # VIDEO_DECODER_EOS
            break
        assert code == 0, code
        assert (ow.value, oh.value) == (w, h)
        assert filled.value == w * h * 3 // 2
        got += 1
    assert got == 3
    assert lib.StopDecoder(dec) == 0
    assert lib.DestroyVideoDecoder(dec) == 0


def test_c_abi_decoder_event_and_params():
    """Round-4 C ABI completions (reference VideoDecoder.h:83-192 full
    surface): GetDecodeParams, SetCallbacks firing PIC_INFO_CHANGE through
    a C function pointer on a mid-stream resolution change, ResetDecoder,
    and the injected copy hook."""
    lib = _lib()
    lib.CreateVideoDecoder.restype = ctypes.c_void_p
    lib.DestroyVideoDecoder.argtypes = [ctypes.c_void_p]
    lib.MtpuCreateDecoder.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.InitDecoder.argtypes = [ctypes.c_void_p]
    lib.SetDecodeParams.argtypes = [ctypes.c_void_p] + [ctypes.c_uint32] * 3
    lib.StartDecoder.argtypes = [ctypes.c_void_p]
    lib.StopDecoder.argtypes = [ctypes.c_void_p]
    lib.ResetDecoder.argtypes = [ctypes.c_void_p]
    lib.SendStreamData.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32]
    lib.RetrieveFrameData.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.GetDecodeParams.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint32)] * 4

    class PicInfo(ctypes.Structure):
        _fields_ = [("width", ctypes.c_uint32), ("height", ctypes.c_uint32)]

    EVENT_CB = ctypes.CFUNCTYPE(None, ctypes.c_uint32,
                                ctypes.POINTER(PicInfo), ctypes.c_void_p)
    lib.SetDecoderCallbacks.argtypes = [ctypes.c_void_p, EVENT_CB,
                                        ctypes.c_void_p]

    events = []

    @EVENT_CB
    def on_event(ev, info, user):
        events.append((int(ev), info.contents.width, info.contents.height))

    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession

    rng = np.random.default_rng(2)

    def one_idr(w, h):
        sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30,
                                            gop_size=4))
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        return sess.encode_frame(yuv.pack_i420(y, u, v))

    dec = lib.CreateVideoDecoder()
    assert dec
    assert lib.MtpuCreateDecoder(dec, 0) == 0
    assert lib.InitDecoder(dec) == 0
    assert lib.SetDecodeParams(dec, 64, 48, 0) == 0
    assert lib.SetDecoderCallbacks(dec, on_event, None) == 0
    assert lib.StartDecoder(dec) == 0

    gw = ctypes.c_uint32(); gh = ctypes.c_uint32()
    gp = ctypes.c_uint32(); gc = ctypes.c_uint32()
    assert lib.GetDecodeParams(dec, ctypes.byref(gw), ctypes.byref(gh),
                               ctypes.byref(gp), ctypes.byref(gc)) == 0
    assert (gw.value, gh.value) == (64, 48)

    # Feed a 64x48 IDR, then a 96x64 IDR: the second retrieve must fire the
    # PIC_INFO_CHANGE event and return BAD_PIC_SIZE (reference semantics,
    # VideoDecoderNetint.cpp:673-684), then succeed at the new geometry.
    au1 = one_idr(64, 48)
    au2 = one_idr(96, 64)
    stream = au1 + au2 + b"\x00\x00\x01\x0c"
    assert lib.SendStreamData(dec, stream, len(stream)) == 0
    assert lib.SendStreamData(dec, b"", 0) == 0

    filled = ctypes.c_uint32(); ow = ctypes.c_uint32(); oh = ctypes.c_uint32()
    buf = ctypes.create_string_buffer(96 * 64 * 3 // 2)
    assert lib.RetrieveFrameData(dec, buf, len(buf), ctypes.byref(filled),
                                 ctypes.byref(ow), ctypes.byref(oh)) == 0
    assert (ow.value, oh.value) == (64, 48)
    code = lib.RetrieveFrameData(dec, buf, len(buf), ctypes.byref(filled),
                                 ctypes.byref(ow), ctypes.byref(oh))
    assert code == 13  # VIDEO_DECODER_BAD_PIC_SIZE
    assert events and events[-1] == (1, 96, 64)  # INDEX_PIC_INFO_CHANGE
    assert lib.RetrieveFrameData(dec, buf, len(buf), ctypes.byref(filled),
                                 ctypes.byref(ow), ctypes.byref(oh)) == 0
    assert (ow.value, oh.value) == (96, 64)
    # Geometry adoption is visible through GetDecodeParams.
    assert lib.GetDecodeParams(dec, ctypes.byref(gw), ctypes.byref(gh),
                               ctypes.byref(gp), ctypes.byref(gc)) == 0
    assert (gw.value, gh.value) == (96, 64)

    # ResetDecoder: stream state drops, the session stays usable.
    assert lib.ResetDecoder(dec) == 0
    au3 = one_idr(64, 48)
    stream = au3 + b"\x00\x00\x01\x0c"
    assert lib.SendStreamData(dec, stream, len(stream)) == 0
    assert lib.SendStreamData(dec, b"", 0) == 0
    code = lib.RetrieveFrameData(dec, buf, len(buf), ctypes.byref(filled),
                                 ctypes.byref(ow), ctypes.byref(oh))
    assert code in (0, 13)  # geometry change from 96x64 back to 64x48
    assert lib.StopDecoder(dec) == 0
    assert lib.DestroyVideoDecoder(dec) == 0
