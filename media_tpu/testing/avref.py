"""Independent conformance oracle backed by the system libavcodec.

decode_h264/decode_hevc run our Annex-B streams through ffmpeg's decoders —
a third-party, widely-deployed conformant implementation with no shared code
with this repo — and return the decoded planes. encode_h264 produces streams
from libx264 (an independent conformant *encoder*) to exercise our decoder
beyond its own encoder's output envelope.

This closes the "oracle independence" gap (a bug in our shared CAVLC tables
or MV prediction is invisible to our in-repo oracle, but not to ffmpeg), and
it is the acceptance test for CABAC interop: a CABAC stream counts as
conformant only if ffmpeg decodes it to our reconstruction bit-exactly.

Reference analog: the reference delegates to OpenH264/NETINT silicon and
inherits interop from them (video_codec/VideoEncoderOpenH264.cpp:344); we
assert it against libavcodec instead. Compiled on demand from csrc/avshim.c;
available() is False when libavcodec headers/libs are absent.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_CSRC = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "csrc"))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(_CSRC, "avshim.c")
    if not os.path.exists(src):
        return None
    build_dir = os.path.join(_CSRC, "build")
    os.makedirs(build_dir, exist_ok=True)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(build_dir, f"libavshim_{digest}.so")
    for name in os.listdir(build_dir):
        if name.startswith("libavshim_") and not so_path.endswith(name):
            try:
                os.unlink(os.path.join(build_dir, name))
            except OSError:
                pass
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + ".tmp"
    cmd = ["gcc", "-O2", "-shared", "-fPIC", src, "-lavcodec", "-lavutil",
           "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, cwd=_CSRC)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        err = getattr(e, "stderr", b"") or b""
        sys.stderr.write(
            f"media_tpu.testing.avref: build failed ({e}): {err[:300]}\n")
        return None
    os.replace(tmp, so_path)
    return so_path


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.avshim_decode.restype = ctypes.c_int64
        lib.avshim_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_char_p, u8p, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32,
        ]
        lib.avshim_encode.restype = ctypes.c_int64
        lib.avshim_encode.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p,
            u8p, ctypes.c_int64,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def decode(annexb: bytes, codec: str = "h264",
           max_frames: int = 512) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode an Annex-B stream with ffmpeg; returns [(y, u, v), ...].

    Raises RuntimeError if the stream is rejected — i.e. non-conformant as
    far as a third-party decoder is concerned.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libavcodec shim unavailable")
    src = np.frombuffer(annexb, np.uint8)
    # Generous output budget: 512 frames at up to 4K would be huge; size the
    # buffer from the stream with a floor, growing on the (rare) overflow.
    cap = 64 << 20
    while True:
        out = np.empty(cap, np.uint8)
        w = ctypes.c_int32(0)
        h = ctypes.c_int32(0)
        n = lib.avshim_decode(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(annexb),
            codec.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap, ctypes.byref(w), ctypes.byref(h), max_frames)
        if n == -7 and cap < (2 << 30):
            cap *= 4
            continue
        break
    if n < 0:
        raise RuntimeError(f"ffmpeg {codec} decode failed (err {n})")
    w, h = w.value, h.value
    frames = []
    sz = w * h * 3 // 2
    for i in range(min(int(n), max_frames)):
        base = i * sz
        y = out[base : base + w * h].reshape(h, w).copy()
        u = out[base + w * h : base + w * h + w * h // 4].reshape(
            h // 2, w // 2).copy()
        v = out[base + w * h + w * h // 4 : base + sz].reshape(
            h // 2, w // 2).copy()
        frames.append((y, u, v))
    return frames


def encode_h264(frames, qp: int = 28, gop: int = 30,
                x264_params: str = "") -> bytes:
    """Encode [(y, u, v), ...] with libx264 into an Annex-B stream.

    x264_params appends raw x264 key=val pairs (":"-separated), e.g.
    "cabac=0:ref=1:partitions=none" for a baseline-ish stream or
    "bframes=2" to exercise B slices in our decoder.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libavcodec shim unavailable")
    h, w = frames[0][0].shape
    packed = np.concatenate([
        np.concatenate([y.ravel(), u.ravel(), v.ravel()]).astype(np.uint8)
        for y, u, v in frames
    ])
    cap = max(len(packed) * 2, 4 << 20)
    out = np.empty(cap, np.uint8)
    n = lib.avshim_encode(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(frames), w, h, qp, gop, b"libx264", x264_params.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError(f"libx264 encode failed (err {n})")
    return out[:n].tobytes()
