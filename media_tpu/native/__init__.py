"""Native (C++) hot-path runtime: CAVLC slice packer, RBSP escaping.

Compiles csrc/cavlc_pack.cpp on first use with the system toolchain into a
cached shared library (csrc/build/). The Python implementations in
entropy/cavlc.py and pipeline/slice_coder.py remain the tested oracle; tests
assert byte-identical output. Set MEDIA_TPU_NATIVE=0 to force the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "csrc")
_CSRC = os.path.normpath(_CSRC)
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    """Compile (if needed) and return the .so path, or None on failure."""
    srcs = [os.path.join(_CSRC, "cavlc_pack.cpp"),
            os.path.join(_CSRC, "cabac_pack.cpp"),
            os.path.join(_CSRC, "cavlc_parse.cpp"),
            os.path.join(_CSRC, "cabac_parse.cpp")]
    gen = os.path.join(_CSRC, "gen_tables.py")
    inc = os.path.join(_CSRC, "cavlc_tables.inc")
    srcs = [s_ for s_ in srcs if os.path.exists(s_)]
    if not srcs:
        return None
    build_dir = os.path.join(_CSRC, "build")
    os.makedirs(build_dir, exist_ok=True)
    if not os.path.exists(inc) or os.path.getmtime(inc) < os.path.getmtime(gen):
        subprocess.run(
            [sys.executable, gen, inc],
            check=True,
            capture_output=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""},
        )
    digest = hashlib.sha256()
    for path in srcs + [inc]:
        with open(path, "rb") as f:
            digest.update(f.read())
    so_path = os.path.join(build_dir, f"libmediatpu_{digest.hexdigest()[:16]}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp"
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, cwd=_CSRC)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            sys.stderr.write(f"media_tpu.native: build failed ({e}); using Python path\n")
            return None
        os.replace(tmp, so_path)
    _prune_stale(build_dir, "libmediatpu_", so_path)
    return so_path


def _prune_stale(build_dir: str, prefix: str, keep: str) -> None:
    """Drop stale-hash build artifacts (processes that already dlopened one
    keep their inode; only the directory entry goes)."""
    try:
        for name in os.listdir(build_dir):
            p = os.path.join(build_dir, name)
            if name.startswith(prefix) and p != keep:
                os.unlink(p)
    except OSError:
        pass


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MEDIA_TPU_NATIVE", "1") == "0":
            return None
        path = _build_lib()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mtpu_write_slice_i.restype = ctypes.c_int64
        lib.mtpu_write_slice_i.argtypes = [
            ctypes.c_uint64, ctypes.c_int,
            i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_int,
            i32p, i32p, u8p, ctypes.c_int64,
        ]
        lib.mtpu_write_slice_p.restype = ctypes.c_int64
        lib.mtpu_write_slice_p.argtypes = [
            ctypes.c_uint64, ctypes.c_int,
            i32p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_int,
            i32p, i32p, i32p, u8p, ctypes.c_int64,
        ]
        lib.mtpu_escape_rbsp.restype = ctypes.c_int64
        lib.mtpu_escape_rbsp.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        if hasattr(lib, "mtpu_parse_slice_p"):
            lib.mtpu_parse_slice_p.restype = ctypes.c_int64
            lib.mtpu_parse_slice_p.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                i32p, i32p, i32p, i32p, i32p,
            ]
            lib.mtpu_transcode_pslice.restype = ctypes.c_int64
            lib.mtpu_transcode_pslice.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                i32p, u8p, ctypes.c_int64,
            ]
        if hasattr(lib, "mtpu_cabac_parse_slice_p"):
            lib.mtpu_cabac_parse_slice_p.restype = ctypes.c_int64
            lib.mtpu_cabac_parse_slice_p.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                i32p, i32p, i32p, i32p, i32p, i32p,
            ]
        if hasattr(lib, "mtpu_cabac_parse_slice_i"):
            lib.mtpu_cabac_parse_slice_i.restype = ctypes.c_int64
            lib.mtpu_cabac_parse_slice_i.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p,
            ]
        if hasattr(lib, "mtpu_cabac_write_slice_p"):
            lib.mtpu_cabac_write_slice_p.restype = ctypes.c_int64
            lib.mtpu_cabac_write_slice_p.argtypes = [
                i32p, i32p, i32p, i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p,
                u8p, ctypes.c_int64,
            ]
            lib.mtpu_cabac_write_slice_i.restype = ctypes.c_int64
            lib.mtpu_cabac_write_slice_i.argtypes = [
                i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p,
                u8p, ctypes.c_int64,
            ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _i32(a):
    arr = np.ascontiguousarray(a, dtype=np.int32)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def write_islice_native(bw, mode16, chroma_mode, dc, ac, cdc, cac) -> bool:
    """Append all I-slice MBs + rbsp trailing to BitWriter `bw`. Returns
    False if the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return False
    R, C = mode16.shape
    cap = R * C * 4096 + 65536
    out = np.empty(cap, np.uint8)
    l_nnz = np.empty(R * 4 * C * 4, np.int32)
    c_nnz = np.empty(2 * R * 2 * C * 2, np.int32)
    holders = []
    ptrs = []
    for a in (mode16, chroma_mode, dc, ac, cdc, cac):
        arr, p = _i32(a)
        holders.append(arr)
        ptrs.append(p)
    n = lib.mtpu_write_slice_i(
        ctypes.c_uint64(bw._acc), bw._nbits, *ptrs, R, C,
        l_nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c_nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n < 0:
        raise RuntimeError("native I-slice packer overflow")
    bw._buf.extend(out[:n].tobytes())
    bw._acc = 0
    bw._nbits = 0
    return True


def write_pslice_native(bw, mv, luma, cdc, cac) -> bool:
    lib = _load()
    if lib is None:
        return False
    R, C = mv.shape[:2]
    cap = R * C * 4096 + 65536
    out = np.empty(cap, np.uint8)
    l_nnz = np.empty(R * 4 * C * 4, np.int32)
    c_nnz = np.empty(2 * R * 2 * C * 2, np.int32)
    mv_scratch = np.empty(R * C * 2, np.int32)
    holders = []
    ptrs = []
    for a in (mv, luma, cdc, cac):
        arr, p = _i32(a)
        holders.append(arr)
        ptrs.append(p)
    n = lib.mtpu_write_slice_p(
        ctypes.c_uint64(bw._acc), bw._nbits, *ptrs, R, C,
        l_nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c_nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mv_scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n < 0:
        raise RuntimeError("native P-slice packer overflow")
    bw._buf.extend(out[:n].tobytes())
    bw._acc = 0
    bw._nbits = 0
    return True


def escape_rbsp_native(data: bytes) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    n = len(data)
    cap = n + n // 2 + 64
    out = np.empty(cap, np.uint8)
    src = np.frombuffer(data, np.uint8)
    m = lib.mtpu_escape_rbsp(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if m < 0:
        return None
    return out[:m].tobytes()


def build_capi() -> str | None:
    """Build the C ABI bridge (csrc/api) -> libVideoCodec .so; returns path."""
    src = os.path.join(_CSRC, "api", "video_codec_api.cpp")
    if not os.path.exists(src):
        return None
    build_dir = os.path.join(_CSRC, "build")
    os.makedirs(build_dir, exist_ok=True)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(build_dir, f"libVideoCodec_{digest}.so")
    if os.path.exists(so_path):
        _prune_stale(build_dir, "libVideoCodec_", so_path)
        return so_path
    import sysconfig

    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = f"{sys.version_info.major}.{sys.version_info.minor}"
    tmp = so_path + ".tmp"
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{inc}", src, "-o", tmp,
        f"-L{libdir}", f"-lpython{ver}",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, cwd=_CSRC)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        err = getattr(e, "stderr", b"")
        sys.stderr.write(f"media_tpu.native: C ABI build failed ({e}): "
                         f"{err[:500] if err else ''}\n")
        return None
    os.replace(tmp, so_path)
    return so_path


def cabac_write_pslice_native(mv, luma, cdc, cac, qp: int,
                              cabac_init_idc: int = 0,
                              qp_map=None) -> bytes | None:
    """CABAC P-slice payload via the C++ packer; None -> caller falls back
    to the Python coder. Byte-identical to
    entropy.cabac_slice.write_pslice_cabac (tests). qp_map: optional
    (R, C) per-MB QP (mb_qp_delta coding on cbp != 0 MBs)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mtpu_cabac_write_slice_p"):
        return None
    from ..entropy.cabac_init_tables import INIT_MN_P

    R, C = mv.shape[:2]
    cap = R * C * 4096 + 65536
    out = np.empty(cap, np.uint8)
    holders, ptrs = [], []
    for a in (mv, luma, cdc, cac):
        arr, p = _i32(a)
        holders.append(arr)
        ptrs.append(p)
    init, init_p = _i32(INIT_MN_P[int(np.clip(cabac_init_idc, 0, 2))])
    if qp_map is not None:
        qarr, q_p = _i32(qp_map)
    else:
        qarr, q_p = None, None
    n = lib.mtpu_cabac_write_slice_p(
        *ptrs, R, C, int(qp), init_p, q_p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def cabac_write_islice_native(mode16, chroma_mode, dc, ac, cdc, cac,
                              qp: int, is_i4=None, modes4=None,
                              luma4_levels=None) -> bytes | None:
    lib = _load()
    if lib is None or not hasattr(lib, "mtpu_cabac_write_slice_i"):
        return None
    from ..entropy.cabac_init_tables import INIT_MN_I

    R, C = mode16.shape
    if is_i4 is None:
        is_i4 = np.zeros((R, C), np.int32)
        modes4 = np.zeros((R, C, 16), np.int32)
        luma4_levels = np.zeros((R, C, 16, 16), np.int32)
    cap = R * C * 4096 + 65536
    out = np.empty(cap, np.uint8)
    holders, ptrs = [], []
    for a in (mode16, chroma_mode, dc, ac, cdc, cac,
              is_i4, modes4, luma4_levels):
        arr, p = _i32(a)
        holders.append(arr)
        ptrs.append(p)
    init, init_p = _i32(INIT_MN_I)
    n = lib.mtpu_cabac_write_slice_i(
        *ptrs, R, C, int(qp), init_p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def parse_pslice_native(data: bytes, nbits: int, bitpos: int,
                        R: int, C: int, slice_qp: int):
    """Parse a CAVLC P slice's slice_data via the C++ parser.

    Returns {"mv", "luma_levels", "cdc_levels", "cac_levels", "qp_map",
    "covered"} or None when the native library is unavailable or the slice
    uses tools beyond the P_L0_16x16 envelope (caller falls back to the
    Python parser)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mtpu_parse_slice_p"):
        return None
    mv = np.zeros((R, C, 2), np.int32)
    luma = np.zeros((R, C, 16, 16), np.int32)
    cdc = np.zeros((R, C, 2, 4), np.int32)
    cac = np.zeros((R, C, 2, 4, 15), np.int32)
    qp_map = np.zeros((R, C), np.int32)
    src = np.frombuffer(data, np.uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    n = lib.mtpu_parse_slice_p(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nbits, bitpos,
        R, C, int(slice_qp),
        mv.ctypes.data_as(i32), luma.ctypes.data_as(i32),
        cdc.ctypes.data_as(i32), cac.ctypes.data_as(i32),
        qp_map.ctypes.data_as(i32))
    if n < 0:
        return None
    return {"mv": mv, "luma_levels": luma, "cdc_levels": cdc,
            "cac_levels": cac, "qp_map": qp_map, "covered": int(n)}


def transcode_pslice_native(data: bytes, nbits: int, bitpos: int,
                            R: int, C: int, qp: int,
                            cabac_init_idc: int = 0) -> bytes | None:
    """CAVLC -> CABAC transcode of one P slice's slice_data (C++): parse
    the device CAVLC pack and re-emit the slice as a CABAC payload. None ->
    caller falls back (library unavailable / envelope exceeded)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mtpu_transcode_pslice"):
        return None
    from ..entropy.cabac_init_tables import INIT_MN_P

    init, init_p = _i32(INIT_MN_P[int(np.clip(cabac_init_idc, 0, 2))])
    src = np.frombuffer(data, np.uint8)
    cap = R * C * 4096 + 65536
    out = np.empty(cap, np.uint8)
    n = lib.mtpu_transcode_pslice(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nbits, bitpos,
        R, C, int(qp), init_p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def cabac_parse_islice_native(data: bytes, bitpos: int, R: int, C: int,
                              qp: int):
    """Parse a CABAC I slice's slice_data via the C++ decoder. Returns the
    symbol dict (parse_islice_cabac layout) or None (library unavailable /
    I_PCM / per-MB QP — caller falls back to the Python parser)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mtpu_cabac_parse_slice_i"):
        return None
    from ..entropy.cabac_init_tables import INIT_MN_I

    init, init_p = _i32(INIT_MN_I)
    mode16 = np.zeros((R, C), np.int32)
    chroma_mode = np.zeros((R, C), np.int32)
    dc = np.zeros((R, C, 16), np.int32)
    ac = np.zeros((R, C, 16, 15), np.int32)
    cdc = np.zeros((R, C, 2, 4), np.int32)
    cac = np.zeros((R, C, 2, 4, 15), np.int32)
    is_i4 = np.zeros((R, C), np.int32)
    modes4 = np.zeros((R, C, 16), np.int32)
    luma4 = np.zeros((R, C, 16, 16), np.int32)
    src = np.frombuffer(data, np.uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    n = lib.mtpu_cabac_parse_slice_i(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        bitpos, R, C, int(qp), init_p,
        mode16.ctypes.data_as(i32), chroma_mode.ctypes.data_as(i32),
        dc.ctypes.data_as(i32), ac.ctypes.data_as(i32),
        cdc.ctypes.data_as(i32), cac.ctypes.data_as(i32),
        is_i4.ctypes.data_as(i32), modes4.ctypes.data_as(i32),
        luma4.ctypes.data_as(i32))
    if n < 0:
        return None
    return {"mode16": mode16, "chroma_mode": chroma_mode, "dc_levels": dc,
            "ac_levels": ac, "cdc_levels": cdc, "cac_levels": cac,
            "is_i4": is_i4.astype(bool), "modes4": modes4,
            "luma4_levels": luma4, "covered": int(n)}


def cabac_parse_pslice_native(data: bytes, bitpos: int, R: int, C: int,
                              qp: int, cabac_init_idc: int = 0):
    """Parse a CABAC P slice's slice_data via the C++ decoder (decode twin
    of the native packer). Returns the symbol dict or None (library
    unavailable / tools beyond the P_L0_16x16 fixed-QP envelope)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mtpu_cabac_parse_slice_p"):
        return None
    from ..entropy.cabac_init_tables import INIT_MN_P

    init, init_p = _i32(INIT_MN_P[int(np.clip(cabac_init_idc, 0, 2))])
    mv = np.zeros((R, C, 2), np.int32)
    luma = np.zeros((R, C, 16, 16), np.int32)
    cdc = np.zeros((R, C, 2, 4), np.int32)
    cac = np.zeros((R, C, 2, 4, 15), np.int32)
    qp_map = np.full((R, C), int(qp), np.int32)
    src = np.frombuffer(data, np.uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    n = lib.mtpu_cabac_parse_slice_p(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        bitpos, R, C, int(qp), init_p,
        mv.ctypes.data_as(i32), luma.ctypes.data_as(i32),
        cdc.ctypes.data_as(i32), cac.ctypes.data_as(i32),
        qp_map.ctypes.data_as(i32))
    if n < 0:
        return None
    return {"mv": mv, "luma_levels": luma, "cdc_levels": cdc,
            "cac_levels": cac, "covered": int(n), "qp_map": qp_map}
