"""Frame encoder core: wavefront intra coding on TPU.

Architecture (TPU-first, not a port — SURVEY.md §7):
  * The frame is an MB grid. Intra prediction depends on reconstructed left/top
    neighbors, so MBs on the same anti-diagonal are independent: the encoder
    runs a `lax.scan` over wavefront diagonals, vectorizing every MB in a wave
    through batched prediction/transform/quant ops (ops/intra.py,
    ops/transform.py). All shapes are static; wave membership is a
    per-geometry constant gathered with dynamic_slice.
  * The scan produces per-MB symbol arrays (modes, quantized levels, CBPs) and
    the reconstructed planes. Entropy coding consumes the arrays on the host
    (Python oracle now, native C++ packer on the hot path).

The reference delegates all of this to OpenH264/NETINT hardware
(VideoEncoderOpenH264.cpp:344 EncodeFrame); here it is first-party compute.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra as intra_ops
from ..ops import me as me_ops
from ..ops import transform as T

# z-scan order of 4x4 luma blocks within an MB -> raster index (by*4+bx)
ZSCAN_TO_RASTER = np.array(
    [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15], dtype=np.int32
)


def _wave_indices(n_rows: int, n_cols: int, skew: int = 1):
    """Static wavefront membership: returns (n_waves, max_wave) row/col index
    arrays and a validity mask. Wave k holds all MBs with skew*r + c == k.

    skew=1 satisfies left/top dependencies (I_16x16 intra); skew=2 also puts
    the top-RIGHT MB in an earlier wave, which I_4x4 prediction requires
    (block (0,3)'s above-right samples live in MB (r-1, c+1))."""
    n_waves = skew * (n_rows - 1) + n_cols
    max_wave = min(n_rows, (n_cols + skew - 1) // skew)
    # Invalid (padding) lanes point out of bounds so scatters with mode="drop"
    # discard them instead of clobbering MB (0,0).
    rows = np.full((n_waves, max_wave), n_rows, dtype=np.int32)
    cols = np.full((n_waves, max_wave), n_cols, dtype=np.int32)
    mask = np.zeros((n_waves, max_wave), dtype=bool)
    for k in range(n_waves):
        i = 0
        for r in range(n_rows):
            c = k - skew * r
            if 0 <= c < n_cols:
                rows[k, i] = r
                cols[k, i] = c
                mask[k, i] = True
                i += 1
    return rows, cols, mask


def _mb_blocks(mb):
    """(N, 16, 16) -> (N, 16, 4, 4): raster-ordered 4x4 blocks."""
    n = mb.shape[0]
    return (
        mb.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 4, 4)
    )


def _blocks_mb(blocks):
    """(N, 16, 4, 4) -> (N, 16, 16)."""
    n = blocks.shape[0]
    return (
        blocks.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)
    )


def _mb_blocks8(mb):
    """(N, 8, 8) -> (N, 4, 4, 4): raster-ordered 4x4 blocks of an 8x8."""
    n = mb.shape[0]
    return mb.reshape(n, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(n, 4, 4, 4)


def _blocks8_mb(blocks):
    n = blocks.shape[0]
    return blocks.reshape(n, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)


def stream_prefix_words(max_bits: int, cap: int, bucket: int = 8192) -> int:
    """Words to download from a (K, cap) device stream buffer: the used
    prefix rounded up to a 32 KiB bucket, so on-device slice executables
    stay cacheable (<= cap/bucket distinct shapes). The buffer itself is
    worst-case sized; only ~the real bitrate crosses the link."""
    nw = (max_bits + 31) // 32
    return max(bucket, min(cap, -(-nw // bucket) * bucket))


@dataclass
class PFrameResult:
    """Per-MB symbol arrays for an inter frame (P_L0_16x16 everywhere).

    Symbol fields are host numpy; recon planes are device-resident uint8
    arrays (they are the next frame's reference — never downloaded on the
    encode hot path)."""

    mv: np.ndarray  # (R, C, 2) full-pel luma MVs (mvx, mvy)
    luma_levels: np.ndarray  # (R, C, 16, 16) quantized levels per 4x4, zig-zag
    cdc_levels: np.ndarray  # (R, C, 2, 4)
    cac_levels: np.ndarray  # (R, C, 2, 4, 15)
    recon_y: object  # jax.Array (H, W) uint8
    recon_u: object
    recon_v: object


@dataclass
class IFrameResult:
    """Per-MB symbol arrays (numpy, host) + reconstruction."""

    mode16: np.ndarray  # (R, C) intra16x16 pred mode
    chroma_mode: np.ndarray  # (R, C) chroma pred mode
    dc_levels: np.ndarray  # (R, C, 16) luma DC, zig-zag order
    ac_levels: np.ndarray  # (R, C, 16, 15) luma AC per raster 4x4 blk, zig-zag
    cdc_levels: np.ndarray  # (R, C, 2, 4) chroma DC (u,v), raster scan
    cac_levels: np.ndarray  # (R, C, 2, 4, 15) chroma AC per raster 4x4 blk
    recon_y: object  # jax.Array (R*16, C*16) uint8, device-resident
    recon_u: object  # jax.Array (R*8, C*8) uint8
    recon_v: object  # jax.Array (R*8, C*8) uint8
    # I_4x4 fields (i4x4 mode decision enabled; None otherwise)
    is_i4: np.ndarray | None = None  # (R, C) bool
    modes4: np.ndarray | None = None  # (R, C, 16) z-scan-ordered 4x4 modes
    luma4_levels: np.ndarray | None = None  # (R, C, 16, 16) zigzag, raster blk


class FrameEncoder:
    """Holds per-geometry constants and the jitted frame encode functions."""

    def __init__(self, width: int, height: int, slice_rows: tuple = ()):
        """slice_rows: MB rows starting a new slice (row 0 implicit). Intra
        prediction treats cross-slice top neighbors as unavailable."""
        if width % 16 or height % 16:
            raise ValueError("FrameEncoder operates on MB-padded planes")
        self.width = width
        self.height = height
        self.n_cols = width // 16
        self.n_rows = height // 16
        rows, cols, mask = _wave_indices(self.n_rows, self.n_cols)
        self._waves = (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(mask))
        # skew-2 waves (top-right MB in an earlier wave) for I_4x4 frames
        rows2, cols2, mask2 = _wave_indices(self.n_rows, self.n_cols, skew=2)
        self._waves2 = (jnp.asarray(rows2), jnp.asarray(cols2),
                        jnp.asarray(mask2))
        has_top = np.ones(self.n_rows + 2, dtype=bool)
        has_top[0] = False
        for r in slice_rows:
            has_top[r] = False
        self._row_has_top = jnp.asarray(has_top)
        # Interior slice-start rows; non-empty selects slice-local
        # deblocking (disable_deblocking_filter_idc == 2 semantics).
        self.deblock_slice_starts: tuple = ()
        self._encode_i = self._encode_iframe_device  # jitted via decorator

    # ------------------------------------------------------------------ intra

    def encode_iframe(self, y, u, v, qp: int, deblock: bool = False,
                      i4x4: bool = False) -> IFrameResult:
        """Encode one intra frame. y: (H, W), u/v: (H/2, W/2) uint8 arrays.

        i4x4: enable per-MB I_4x4/I_16x16 mode decision (9 directional 4x4
        modes with in-MB reconstruction dependencies; the wavefront switches
        to the skew-2 schedule so above-right MBs are decoded first)."""
        qp_c = int(T.chroma_qp(qp))
        out = self._encode_i(
            jnp.asarray(y, jnp.int32),
            jnp.asarray(u, jnp.int32),
            jnp.asarray(v, jnp.int32),
            jnp.int32(qp),
            jnp.int32(qp_c),
            deblock,
            i4x4,
        )
        return IFrameResult(
            mode16=np.asarray(out["mode16"]),
            chroma_mode=np.asarray(out["chroma_mode"]),
            dc_levels=np.asarray(out["dc_levels"]),
            ac_levels=np.asarray(out["ac_levels"]),
            cdc_levels=np.asarray(out["cdc_levels"]),
            cac_levels=np.asarray(out["cac_levels"]),
            recon_y=out["recon_y"],  # device-resident uint8
            recon_u=out["recon_u"],
            recon_v=out["recon_v"],
            is_i4=np.asarray(out["is_i4"]) if i4x4 else None,
            modes4=np.asarray(out["modes4"]) if i4x4 else None,
            luma4_levels=np.asarray(out["luma4_levels"]) if i4x4 else None,
        )

    # ------------------------------------------------------------------ inter

    def encode_pframe(self, y, u, v, ref_y, ref_u, ref_v, qp: int,
                      search_range: int = 8, deblock: bool = False) -> PFrameResult:
        """Encode one P frame against a reconstructed reference.

        Fully parallel across MBs (no wavefront): with in-loop deblocking off,
        inter reconstruction is MC(ref) + residual, which has no intra-frame
        dependencies — the TPU-native fast path. One packed int16 symbol
        tensor is downloaded; recon planes stay on device.
        """
        qp_c = int(T.chroma_qp(qp))
        out = self._encode_pframe_device(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(ref_y), jnp.asarray(ref_u), jnp.asarray(ref_v),
            jnp.int32(qp), jnp.int32(qp_c), search_range, deblock,
        )
        from .pframe_core import unpack_symbols

        fields = unpack_symbols(out["symbols"])
        return PFrameResult(
            recon_y=out["recon_y"],
            recon_u=out["recon_u"],
            recon_v=out["recon_v"],
            **fields,
        )

    def encode_pframes_batch(self, ys, us, vs, ref_y, ref_u, ref_v, qp: int,
                             search_range: int = 8, deblock: bool = False):
        """Encode K consecutive P frames in ONE device dispatch.

        The IPPP recon dependency is carried through a lax.scan on device, so
        the host pays a single upload and a single packed-symbol download for
        the whole batch — amortizing host<->device round-trip latency, which
        dominates per-frame dispatch through the TPU tunnel.

        ys/us/vs: (K, H, W) / (K, H/2, W/2) arrays. Returns (symbols numpy
        (K, R, C, S), (recon_y, recon_u, recon_v) device arrays after frame K).
        """
        qp_c = int(T.chroma_qp(qp))
        symbols, recon = self._encode_pbatch_device(
            jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs),
            jnp.asarray(ref_y), jnp.asarray(ref_u), jnp.asarray(ref_v),
            jnp.int32(qp), jnp.int32(qp_c), search_range, deblock,
        )
        return np.asarray(symbols), recon

    def encode_pframes_packed(self, ys, us, vs, ref_y, ref_u, ref_v, qp: int,
                              search_range: int = 8, deblock: bool = False,
                              cap: int | None = None):
        """Encode K consecutive P frames with ON-DEVICE entropy coding.

        Downloads only the packed slice_data bitstreams (~the real bitrate)
        instead of per-MB symbols. Returns (streams (K, cap) uint32,
        bits (K,) int32, recon device planes). bits[j] > cap*32 signals
        overflow: the caller must retry with a larger cap or fall back to
        the symbols path.
        """
        qp_c = int(T.chroma_qp(qp))
        streams, bits, recon = self._encode_pbatch_packed_device(
            jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs),
            jnp.asarray(ref_y), jnp.asarray(ref_u), jnp.asarray(ref_v),
            jnp.int32(qp), jnp.int32(qp_c), search_range, deblock,
            cap or self.cap_words,
        )
        return np.asarray(streams), np.asarray(bits), recon

    def encode_pframes_packed_dev(self, ys_d, us_d, vs_d, ref, qp: int,
                                  search_range: int = 8,
                                  deblock: bool = False,
                                  cap: int | None = None):
        """Like encode_pframes_packed, but takes device-resident planes and
        returns device arrays (no host download): the building block of the
        software-pipelined session path, where downloads are deferred so they
        overlap the next chunk's compute. `cap` (static, words) sizes the
        per-frame stream buffer — the session right-sizes it from recent
        frame bits so the per-frame download is ~the real bitrate, not the
        worst-case budget."""
        qp_c = int(T.chroma_qp(qp))
        return self._encode_pbatch_packed_device(
            ys_d, us_d, vs_d, *ref,
            jnp.int32(qp), jnp.int32(qp_c), search_range, deblock,
            cap or self.cap_words,
        )

    # ------------------------------------------------------------------- B

    def encode_bframe(self, y, u, v, ref0, ref1, qp: int,
                      search_range: int = 8) -> dict:
        """Encode one non-reference B frame against two references
        (B_Bi_16x16 everywhere; pipeline/pframe_core.local_bframe_core).

        ref0/ref1: (y, u, v) plane tuples (device or host). Returns the
        unpacked symbol dict {mv0, mv1, luma_levels, cdc_levels,
        cac_levels} for the host B-slice entropy coder."""
        from .pframe_core import unpack_b_symbols

        qp_c = int(T.chroma_qp(qp))
        sym = self._encode_bframe_device(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            *[jnp.asarray(p) for p in ref0],
            *[jnp.asarray(p) for p in ref1],
            jnp.int32(qp), jnp.int32(qp_c), search_range,
        )
        return unpack_b_symbols(sym)

    @functools.partial(jax.jit, static_argnums=(0, 12))
    def _encode_bframe_device(self, y, u, v, r0y, r0u, r0v, r1y, r1u, r1v,
                              qp, qp_c, search_range):
        from .pframe_core import INTERP_HALO, local_bframe_core

        rs = search_range
        halo_y = rs + INTERP_HALO
        halo_c = rs // 2 + 2

        def ext(ry, ru, rv):
            return (
                jnp.pad(ry.astype(jnp.int32), ((halo_y, halo_y), (0, 0)),
                        mode="edge"),
                jnp.pad(ru.astype(jnp.int32), ((halo_c, halo_c), (0, 0)),
                        mode="edge"),
                jnp.pad(rv.astype(jnp.int32), ((halo_c, halo_c), (0, 0)),
                        mode="edge"),
            )

        return local_bframe_core(
            y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
            ext(r0y, r0u, r0v), ext(r1y, r1u, r1v),
            qp, qp_c, rs, self.n_rows, self.n_cols,
        )

    @property
    def cap_words(self) -> int:
        # ~1.5 bits/pixel budget for packed slice_data (64 KiB minimum): the
        # worst-case stream buffer. Sessions normally dispatch with a much
        # smaller adaptive cap sized from recent frame bits (the buffer is
        # downloaded per frame) and retry at this budget on overflow; only
        # frames denser than even this fall back to host packing.
        return max(self.width * self.height // 21, 16384)

    @functools.partial(jax.jit, static_argnums=(0, 9, 10, 11))
    def _encode_pbatch_packed_device(self, ys, us, vs, ref_y, ref_u, ref_v,
                                     qp, qp_c, search_range, deblock=False,
                                     cap=None):
        from ..entropy.device_cavlc import pack_pslice_device
        from .pframe_core import local_pframe_core, unpack_symbols_device

        from .pframe_core import INTERP_HALO

        rs = search_range
        halo_y = rs + INTERP_HALO
        halo_c = rs // 2 + 2
        if cap is None:
            cap = self.cap_words

        def step(carry, frame):
            ry, ru, rv = carry
            ry_ext = jnp.pad(ry.astype(jnp.int32), ((halo_y, halo_y), (0, 0)), mode="edge")
            ru_ext = jnp.pad(ru.astype(jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
            rv_ext = jnp.pad(rv.astype(jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
            y, u, v = frame
            out = local_pframe_core(
                y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
                ry_ext, ru_ext, rv_ext, qp, qp_c, rs, self.n_rows, self.n_cols,
            )
            mv, luma, cdc, cac = unpack_symbols_device(out["symbols"])
            stream, bits = pack_pslice_device(mv, luma, cdc, cac, cap)
            ry2, ru2, rv2 = out["recon_y"], out["recon_u"], out["recon_v"]
            if deblock:
                from .deblock_apply import deblock_pframe_from_symbols

                ry2, ru2, rv2 = deblock_pframe_from_symbols(
                    ry2, ru2, rv2, out["symbols"], qp, qp_c,
                    self.n_rows, self.n_cols, self.deblock_slice_starts)
            return (ry2, ru2, rv2), (stream, bits)

        init = (
            jnp.asarray(ref_y, jnp.uint8),
            jnp.asarray(ref_u, jnp.uint8),
            jnp.asarray(ref_v, jnp.uint8),
        )
        recon, (streams, bits) = jax.lax.scan(step, init, (ys, us, vs))
        return streams, bits, recon

    @functools.partial(jax.jit, static_argnums=(0, 9, 10))
    def _encode_pbatch_device(self, ys, us, vs, ref_y, ref_u, ref_v, qp, qp_c,
                              search_range, deblock=False):
        from .pframe_core import local_pframe_core

        from .pframe_core import INTERP_HALO

        rs = search_range
        halo_y = rs + INTERP_HALO
        halo_c = rs // 2 + 2

        def step(carry, frame):
            ry, ru, rv = carry
            ry_ext = jnp.pad(ry.astype(jnp.int32), ((halo_y, halo_y), (0, 0)), mode="edge")
            ru_ext = jnp.pad(ru.astype(jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
            rv_ext = jnp.pad(rv.astype(jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
            y, u, v = frame
            out = local_pframe_core(
                y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
                ry_ext, ru_ext, rv_ext, qp, qp_c, rs, self.n_rows, self.n_cols,
            )
            ry2, ru2, rv2 = out["recon_y"], out["recon_u"], out["recon_v"]
            if deblock:
                from .deblock_apply import deblock_pframe_from_symbols

                ry2, ru2, rv2 = deblock_pframe_from_symbols(
                    ry2, ru2, rv2, out["symbols"], qp, qp_c,
                    self.n_rows, self.n_cols, self.deblock_slice_starts)
            return (ry2, ru2, rv2), out["symbols"]

        init = (
            jnp.asarray(ref_y, jnp.uint8),
            jnp.asarray(ref_u, jnp.uint8),
            jnp.asarray(ref_v, jnp.uint8),
        )
        recon, symbols = jax.lax.scan(step, init, (ys, us, vs))
        return symbols, recon

    @functools.partial(jax.jit, static_argnums=(0, 9, 10))
    def _encode_pframe_device(self, y, u, v, ref_y, ref_u, ref_v, qp, qp_c,
                              search_range, deblock=False):
        from .pframe_core import local_pframe_core

        from .pframe_core import INTERP_HALO

        rs = search_range
        halo_y = rs + INTERP_HALO
        halo_c = rs // 2 + 2
        ref_y_ext = jnp.pad(jnp.asarray(ref_y, jnp.int32), ((halo_y, halo_y), (0, 0)), mode="edge")
        ref_u_ext = jnp.pad(jnp.asarray(ref_u, jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
        ref_v_ext = jnp.pad(jnp.asarray(ref_v, jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
        out = local_pframe_core(
            jnp.asarray(y, jnp.int32), jnp.asarray(u, jnp.int32),
            jnp.asarray(v, jnp.int32),
            ref_y_ext, ref_u_ext, ref_v_ext,
            qp, qp_c, rs, self.n_rows, self.n_cols,
        )
        if deblock:
            from .deblock_apply import deblock_pframe_from_symbols

            out["recon_y"], out["recon_u"], out["recon_v"] = (
                deblock_pframe_from_symbols(
                    out["recon_y"], out["recon_u"], out["recon_v"],
                    out["symbols"], qp, qp_c, self.n_rows, self.n_cols,
                    self.deblock_slice_starts,
                )
            )
        return out

    @functools.partial(jax.jit, static_argnums=(0, 6, 7))
    def _encode_iframe_device(self, y, u, v, qp, qp_c, deblock=False,
                              i4x4=False):
        R, C = self.n_rows, self.n_cols
        rows, cols, mask = self._waves2 if i4x4 else self._waves
        n_waves, max_wave = rows.shape

        # MB-granular original planes.
        orig_y = y.reshape(R, 16, C, 16).transpose(0, 2, 1, 3)  # (R, C, 16, 16)
        orig_u = u.reshape(R, 8, C, 8).transpose(0, 2, 1, 3)
        orig_v = v.reshape(R, 8, C, 8).transpose(0, 2, 1, 3)

        # Derive the zero init from the input so the scan carry is
        # device-varying under shard_map (a constant carry fails to unify
        # with the varying scan body when this runs tile-sharded).
        z0 = y[0, 0] * 0
        state = {
            "recon_y": jnp.zeros((R, C, 16, 16), jnp.int32) + z0,
            "recon_u": jnp.zeros((R, C, 8, 8), jnp.int32) + z0,
            "recon_v": jnp.zeros((R, C, 8, 8), jnp.int32) + z0,
            "mode16": jnp.zeros((R, C), jnp.int32) + z0,
            "chroma_mode": jnp.zeros((R, C), jnp.int32) + z0,
            "dc_levels": jnp.zeros((R, C, 16), jnp.int32) + z0,
            "ac_levels": jnp.zeros((R, C, 16, 15), jnp.int32) + z0,
            "cdc_levels": jnp.zeros((R, C, 2, 4), jnp.int32) + z0,
            "cac_levels": jnp.zeros((R, C, 2, 4, 15), jnp.int32) + z0,
        }
        if i4x4:
            state["is_i4"] = jnp.zeros((R, C), bool) | (z0 == 1)
            state["modes4"] = jnp.zeros((R, C, 16), jnp.int32) + z0
            state["luma4_levels"] = jnp.zeros((R, C, 16, 16), jnp.int32) + z0

        def wave_step(state, wave_idx):
            r = jax.lax.dynamic_index_in_dim(rows, wave_idx, keepdims=False)
            c = jax.lax.dynamic_index_in_dim(cols, wave_idx, keepdims=False)
            valid = jax.lax.dynamic_index_in_dim(mask, wave_idx, keepdims=False)

            avail_top = self._row_has_top[jnp.clip(r, 0, self.n_rows + 1)] & valid
            avail_left = (c > 0) & valid
            rm1 = jnp.maximum(r - 1, 0)
            cm1 = jnp.maximum(c - 1, 0)

            # ---- luma ----
            ry = state["recon_y"]
            top = ry[rm1, c, 15, :]  # (N, 16)
            left = ry[r, cm1, :, 15]
            top_left = ry[rm1, cm1, 15, 15]
            o = orig_y[r, c]  # (N, 16, 16)

            preds = intra_ops.pred_16x16_all(top, left, top_left, avail_top, avail_left)
            cost = intra_ops.satd_cost(preds, o)
            mode_ok = intra_ops.mode_available_16x16(avail_top, avail_left)
            cost = jnp.where(mode_ok, cost, jnp.int32(1 << 30))
            mode = jnp.argmin(cost, axis=-1).astype(jnp.int32)
            pred = jnp.take_along_axis(preds, mode[:, None, None, None], axis=1)[:, 0]
            cost16 = jnp.min(cost, axis=-1)

            res = _mb_blocks(o - pred)  # (N, 16, 4, 4)
            w = T.forward_4x4(res)
            # DC path
            dc = w[:, :, 0, 0].reshape(-1, 4, 4)
            wd = T.hadamard_4x4(dc)
            z_dc = T.quant_dc_4x4(wd, qp)
            f_dc = T.hadamard_4x4(z_dc)  # decoder-side inverse hadamard
            d_dc = T.dequant_dc_4x4(f_dc, qp)
            # AC path
            z_ac = T.quant_4x4(w, qp, intra=True)
            z_ac = z_ac.at[:, :, 0, 0].set(0)
            d = T.dequant_4x4(z_ac, qp)
            d = d.at[:, :, 0, 0].set(d_dc.reshape(-1, 16))
            recon = jnp.clip(pred + _blocks_mb(T.inverse_4x4(d)), 0, 255)

            if i4x4:
                # ---- I_4x4 candidate: 16 z-scan blocks, each vectorized
                # across the wave; in-MB dependencies run as a static
                # 16-substep chain over the candidate canvas `cur`.
                N = o.shape[0]
                top_row = top  # (N, 16) from the top MB
                left_col = left  # (N, 16) from the left MB
                cp1 = jnp.minimum(c + 1, C - 1)
                tr_mb_ok = avail_top & (c < C - 1)
                tr_row4 = ry[rm1, cp1, 15, 0:4]  # top-right MB bottom pixels
                # In-MB top-right availability (z-scan decode order).
                TR_OK = {(1, 0): True, (1, 1): False, (1, 2): True,
                         (1, 3): False, (2, 0): True, (2, 1): True,
                         (2, 2): True, (2, 3): False, (3, 0): True,
                         (3, 1): False, (3, 2): True, (3, 3): False}
                cur = jnp.zeros((N, 16, 16), jnp.int32)
                cost4 = jnp.zeros((N,), jnp.int32)
                modes4 = []
                lev4 = [None] * 16  # raster block order
                ones_b = jnp.ones((N,), bool)
                for z in range(16):
                    b = int(ZSCAN_TO_RASTER[z])
                    by, bx = b // 4, b % 4
                    x0, y0 = bx * 4, by * 4
                    top4 = (top_row[:, x0 : x0 + 4] if by == 0
                            else cur[:, y0 - 1, x0 : x0 + 4])
                    left4 = (left_col[:, y0 : y0 + 4] if bx == 0
                             else cur[:, y0 : y0 + 4, x0 - 1])
                    if by == 0 and bx == 0:
                        corner = top_left
                    elif by == 0:
                        corner = top_row[:, x0 - 1]
                    elif bx == 0:
                        corner = left_col[:, y0 - 1]
                    else:
                        corner = cur[:, y0 - 1, x0 - 1]
                    if by == 0:
                        if bx < 3:
                            tr4 = top_row[:, x0 + 4 : x0 + 8]
                            tr_ok = avail_top
                        else:
                            tr4 = tr_row4
                            tr_ok = tr_mb_ok
                    elif TR_OK[(by, bx)]:
                        tr4 = cur[:, y0 - 1, x0 + 4 : x0 + 8]
                        tr_ok = ones_b
                    else:
                        tr4 = jnp.zeros((N, 4), jnp.int32)
                        tr_ok = jnp.zeros((N,), bool)
                    b_top = ones_b if by > 0 else avail_top
                    b_left = ones_b if bx > 0 else avail_left
                    t8 = jnp.concatenate(
                        [top4, jnp.where(tr_ok[:, None], tr4,
                                         top4[:, 3:4])], axis=1)
                    preds4, ok4 = intra_ops.pred_4x4_all(
                        t8, left4, corner, b_top, b_left, tr_ok)
                    ob = o[:, y0 : y0 + 4, x0 : x0 + 4]
                    c4 = intra_ops.satd_cost(preds4, ob)
                    c4 = jnp.where(ok4, c4, jnp.int32(1 << 30))
                    m4 = jnp.argmin(c4, axis=-1).astype(jnp.int32)
                    p4 = jnp.take_along_axis(
                        preds4, m4[:, None, None, None], axis=1)[:, 0]
                    cost4 = cost4 + jnp.min(c4, axis=-1)
                    zl = T.quant_4x4(T.forward_4x4(ob - p4), qp, intra=True)
                    rec4 = jnp.clip(
                        p4 + T.inverse_4x4(T.dequant_4x4(zl, qp)), 0, 255)
                    cur = cur.at[:, y0 : y0 + 4, x0 : x0 + 4].set(rec4)
                    modes4.append(m4)
                    lev4[b] = T.zigzag(zl)
                modes4 = jnp.stack(modes4, axis=1)  # (N, 16) z-scan order
                lev4 = jnp.stack(lev4, axis=1)  # (N, 16, 16) raster blocks
                # Mode-bit overhead bias: I_4x4 signals ~16 x ~2.5 extra
                # bits; scale by the quantizer step so the trade follows QP.
                bias = 40 * jnp.left_shift(jnp.int32(1), qp // 6)
                i4_sel = (cost4 + bias < cost16) & valid
                s3 = i4_sel[:, None, None]
                recon = jnp.where(s3, cur, recon)
                z_dc = jnp.where(s3, 0, z_dc)
                z_ac = jnp.where(i4_sel[:, None, None, None], 0, z_ac)
                lev4 = jnp.where(i4_sel[:, None, None], lev4, 0)
                modes4 = jnp.where(i4_sel[:, None], modes4, 0)

            # ---- chroma (joint mode decision over U+V) ----
            cu_top = state["recon_u"][rm1, c, 7, :]
            cu_left = state["recon_u"][r, cm1, :, 7]
            cu_tl = state["recon_u"][rm1, cm1, 7, 7]
            cv_top = state["recon_v"][rm1, c, 7, :]
            cv_left = state["recon_v"][r, cm1, :, 7]
            cv_tl = state["recon_v"][rm1, cm1, 7, 7]
            ou = orig_u[r, c]
            ov = orig_v[r, c]

            preds_u = intra_ops.pred_chroma_all(cu_top, cu_left, cu_tl, avail_top, avail_left)
            preds_v = intra_ops.pred_chroma_all(cv_top, cv_left, cv_tl, avail_top, avail_left)
            ccost = intra_ops.sad_cost(preds_u, ou) + intra_ops.sad_cost(preds_v, ov)
            cmode_ok = intra_ops.mode_available_chroma(avail_top, avail_left)
            ccost = jnp.where(cmode_ok, ccost, jnp.int32(1 << 30))
            cmode = jnp.argmin(ccost, axis=-1).astype(jnp.int32)
            pred_u = jnp.take_along_axis(preds_u, cmode[:, None, None, None], axis=1)[:, 0]
            pred_v = jnp.take_along_axis(preds_v, cmode[:, None, None, None], axis=1)[:, 0]

            def chroma_code(o_c, pred_c):
                res_c = _mb_blocks8(o_c - pred_c)  # (N, 4, 4, 4)
                w_c = T.forward_4x4(res_c)
                dc2 = w_c[:, :, 0, 0].reshape(-1, 2, 2)
                wd2 = T.hadamard_2x2(dc2)
                z2 = T.quant_dc_2x2(wd2, qp_c, intra=True)
                f2 = T.hadamard_2x2(z2)
                d2 = T.dequant_dc_2x2(f2, qp_c)
                z_cac = T.quant_4x4(w_c, qp_c, intra=True)
                z_cac = z_cac.at[:, :, 0, 0].set(0)
                d_c = T.dequant_4x4(z_cac, qp_c)
                d_c = d_c.at[:, :, 0, 0].set(d2.reshape(-1, 4))
                recon_c = jnp.clip(pred_c + _blocks8_mb(T.inverse_4x4(d_c)), 0, 255)
                return z2.reshape(-1, 4), z_cac, recon_c

            zdc_u, zac_u, recon_u = chroma_code(ou, pred_u)
            zdc_v, zac_v, recon_v = chroma_code(ov, pred_v)

            # ---- scatter (masked: invalid lanes write to (0,0) then revert) --
            def scatter(dst, val, old_at_rc):
                val = jnp.where(
                    valid.reshape(valid.shape + (1,) * (val.ndim - 1)), val, old_at_rc
                )
                return dst.at[r, c].set(val, mode="drop")

            new_state = dict(state)
            new_state["recon_y"] = scatter(state["recon_y"], recon, state["recon_y"][r, c])
            new_state["recon_u"] = scatter(state["recon_u"], recon_u, state["recon_u"][r, c])
            new_state["recon_v"] = scatter(state["recon_v"], recon_v, state["recon_v"][r, c])
            new_state["mode16"] = scatter(state["mode16"], mode, state["mode16"][r, c])
            new_state["chroma_mode"] = scatter(state["chroma_mode"], cmode, state["chroma_mode"][r, c])
            new_state["dc_levels"] = scatter(
                state["dc_levels"], T.zigzag(z_dc), state["dc_levels"][r, c]
            )
            new_state["ac_levels"] = scatter(
                state["ac_levels"], T.zigzag(z_ac)[..., 1:], state["ac_levels"][r, c]
            )
            new_state["cdc_levels"] = scatter(
                state["cdc_levels"],
                jnp.stack([zdc_u, zdc_v], axis=1),
                state["cdc_levels"][r, c],
            )
            new_state["cac_levels"] = scatter(
                state["cac_levels"],
                jnp.stack([T.zigzag(zac_u)[..., 1:], T.zigzag(zac_v)[..., 1:]], axis=1),
                state["cac_levels"][r, c],
            )
            if i4x4:
                new_state["is_i4"] = scatter(
                    state["is_i4"], i4_sel, state["is_i4"][r, c])
                new_state["modes4"] = scatter(
                    state["modes4"], modes4, state["modes4"][r, c])
                new_state["luma4_levels"] = scatter(
                    state["luma4_levels"], lev4, state["luma4_levels"][r, c])
            return new_state, None

        state, _ = jax.lax.scan(wave_step, state, jnp.arange(n_waves))

        out = {
            k: state[k]
            for k in (
                "mode16", "chroma_mode", "dc_levels", "ac_levels",
                "cdc_levels", "cac_levels",
            )
        }
        if i4x4:
            out["is_i4"] = state["is_i4"]
            out["modes4"] = state["modes4"]
            out["luma4_levels"] = state["luma4_levels"]
        ry = state["recon_y"].transpose(0, 2, 1, 3).reshape(self.height, self.width)
        ru = state["recon_u"].transpose(0, 2, 1, 3).reshape(self.height // 2, self.width // 2)
        rv = state["recon_v"].transpose(0, 2, 1, 3).reshape(self.height // 2, self.width // 2)
        if deblock:
            from .deblock_apply import deblock_iframe

            ry, ru, rv = deblock_iframe(ry, ru, rv, qp, qp_c,
                                        self.n_rows, self.n_cols,
                                        self.deblock_slice_starts)
        else:
            ry, ru, rv = (x.astype(jnp.uint8) for x in (ry, ru, rv))
        out["recon_y"], out["recon_u"], out["recon_v"] = ry, ru, rv
        return out

    # ---------------------------------------------------- inter + CBR control

    def encode_pframes_cbr(self, ys, us, vs, ref_y, ref_u, ref_v,
                           rc_state: dict, target_bits_per_frame: int,
                           qp_min: int = 12, qp_max: int = 44,
                           search_range: int = 8, deblock: bool = False,
                           adaptive_qp: bool = False,
                           cap: int | None = None):
        """Encode K P frames with on-device CBR rate control.

        The device packer reports each frame's EXACT bit count, so the
        virtual-buffer feedback loop (bits -> complexity model -> next QP)
        runs inside the device scan with no host round trips. rc_state carries
        {"qp": float, "buf": float, "cplx": float} across calls.

        adaptive_qp: per-MB QP modulation (mb_qp_delta) realizes the
        FRACTIONAL part of the rate controller's ideal QP — a deterministic
        dither assigns floor(qp)+1 to that fraction of macroblocks — which
        tightens the rate granularity from one full QP step (~12% bits) to
        ~1%. Composes with deblock: the filter applies spec 8.7.2 per-edge
        qPav thresholds from the decoder-visible QP map.

        Returns (streams, bits, qps, recon, new_rc_state).
        """
        streams, bits, qps, recon, new_state = self._encode_pbatch_cbr_device(
            jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs),
            jnp.asarray(ref_y), jnp.asarray(ref_u), jnp.asarray(ref_v),
            jnp.float32(rc_state["qp"]), jnp.float32(rc_state["buf"]),
            jnp.float32(rc_state["cplx"]),
            float(target_bits_per_frame), qp_min, qp_max, search_range,
            deblock, adaptive_qp, cap or self.cap_words,
        )
        out_state = {
            "qp": float(new_state[0]),
            "buf": float(new_state[1]),
            "cplx": float(new_state[2]),
        }
        bits_np = np.asarray(bits)
        cap_used = cap or self.cap_words
        nw = stream_prefix_words(int(bits_np.max()), cap_used)
        return (np.asarray(streams[:, :nw]), bits_np, np.asarray(qps),
                recon, out_state)

    def encode_pframes_cbr_dev(self, ys_d, us_d, vs_d, ref,
                               rc_state: dict,
                               target_bits_per_frame: int,
                               bits_scale: float = 1.0,
                               qp_min: int = 12, qp_max: int = 44,
                               search_range: int = 8,
                               deblock: bool = False,
                               adaptive_qp: bool = False,
                               cap: int | None = None):
        """Device-resident CBR batch with a bit-size scale on the rate
        feedback: the scan integrates device-CAVLC bits x `bits_scale` (the
        session's running CABAC/CAVLC ratio when the emitted entropy is
        CABAC via host transcode; 1.0 for plain CAVLC). Returns device
        arrays (streams, bits, qps, recon, rc) — downloads are the caller's,
        so they overlap the next chunk's compute. adaptive_qp composes with
        the transcode path: the device CAVLC pack carries the per-MB QP map
        as mb_qp_delta, and the C++ transcoder re-emits it in CABAC."""
        return self._encode_pbatch_cbr_device(
            ys_d, us_d, vs_d, *ref,
            jnp.float32(rc_state["qp"]), jnp.float32(rc_state["buf"]),
            jnp.float32(rc_state["cplx"]),
            float(target_bits_per_frame), qp_min, qp_max, search_range,
            deblock, adaptive_qp, cap or self.cap_words,
            bits_scale=jnp.float32(bits_scale))

    @functools.partial(jax.jit, static_argnums=(0, 10, 11, 12, 13, 14, 15, 16))
    def _encode_pbatch_cbr_device(self, ys, us, vs, ref_y, ref_u, ref_v,
                                  qp0, buf0, cplx0,
                                  target: float, qp_min: int, qp_max: int,
                                  search_range: int, deblock: bool = False,
                                  adaptive_qp: bool = False, cap=None,
                                  bits_scale=None):
        from ..entropy.device_cavlc import pack_pslice_device
        from .pframe_core import (
            INTERP_HALO, chroma_qp_device, local_pframe_core,
            unpack_symbols_device,
        )

        rs = search_range
        halo_y = rs + INTERP_HALO
        halo_c = rs // 2 + 2
        if cap is None:
            cap = self.cap_words

        def qstep(qp):
            return 0.625 * jnp.exp2(qp / 6.0)

        n_mb = self.n_rows * self.n_cols

        def step(carry, frame):
            ry, ru, rv, qp_f, buf, cplx = carry
            # Virtual-buffer drain: aim below target when the buffer is full.
            adj_target = jnp.maximum(target - 0.35 * buf, 0.25 * target)
            want_qstep = jnp.clip(cplx / adj_target, 0.625, 1024.0)
            qp_f = jnp.clip(6.0 * jnp.log2(want_qstep / 0.625),
                            float(qp_min), float(qp_max))
            if adaptive_qp:
                # Fractional QP via per-MB dither: floor(qp)+1 on a `frac`
                # share of MBs (deterministic stride-97 spread), tightening
                # the rate granularity from one QP step (~12% bits) to ~1%.
                qp = jnp.floor(qp_f).astype(jnp.int32)
                frac = qp_f - qp.astype(jnp.float32)
                thresh = ((jnp.arange(n_mb, dtype=jnp.int32) * 97) % 128
                          ).astype(jnp.float32) / 128.0
                qp_map = jnp.clip(qp + (thresh < frac).astype(jnp.int32),
                                  qp_min, qp_max)
                qp_enc = qp_map
                qp_c_enc = chroma_qp_device(qp_map)
                qp_c = chroma_qp_device(qp)
            else:
                qp = jnp.clip(jnp.round(qp_f), qp_min, qp_max).astype(jnp.int32)
                qp_c = chroma_qp_device(qp)
                qp_enc, qp_c_enc = qp, qp_c
                qp_map = None

            ry_ext = jnp.pad(ry.astype(jnp.int32), ((halo_y, halo_y), (0, 0)), mode="edge")
            ru_ext = jnp.pad(ru.astype(jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
            rv_ext = jnp.pad(rv.astype(jnp.int32), ((halo_c, halo_c), (0, 0)), mode="edge")
            y, u, v = frame
            out = local_pframe_core(
                y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
                ry_ext, ru_ext, rv_ext, qp_enc, qp_c_enc, rs,
                self.n_rows, self.n_cols,
            )
            mv, luma, cdc, cac = unpack_symbols_device(out["symbols"])
            stream, bits = pack_pslice_device(
                mv, luma, cdc, cac, cap,
                qp_map=(None if qp_map is None
                        else qp_map.reshape(self.n_rows, self.n_cols)),
                slice_qp=qp)
            rdy, rdu, rdv = out["recon_y"], out["recon_u"], out["recon_v"]
            if deblock:
                from .deblock_apply import deblock_pframe_from_symbols

                eff_map = None
                if adaptive_qp:
                    # The filter must see the DECODER's per-MB QP: mb_qp_delta
                    # is only coded on cbp != 0 MBs, so uncoded/skip MBs keep
                    # the running QP (spec 7.4.4) — an associative last-coded
                    # scan over the dithered map, seeded with the slice QP.
                    coded = (jnp.any(luma != 0, axis=(2, 3))
                             | jnp.any(cdc != 0, axis=(2, 3))
                             | jnp.any(cac != 0, axis=(2, 3, 4)))
                    vals = jnp.where(coded.reshape(-1), qp_map, -1)
                    incl = jax.lax.associative_scan(
                        lambda a, b: jnp.where(b >= 0, b, a), vals)
                    eff_map = jnp.where(incl >= 0, incl, qp).reshape(
                        self.n_rows, self.n_cols)
                rdy, rdu, rdv = deblock_pframe_from_symbols(
                    rdy, rdu, rdv, out["symbols"], qp, qp_c,
                    self.n_rows, self.n_cols, self.deblock_slice_starts,
                    qp_map=eff_map)
            bits_f = bits.astype(jnp.float32)
            if bits_scale is not None:
                # Estimated emitted size when the entropy stage differs from
                # the device CAVLC pack (host CABAC transcode).
                bits_f = bits_f * bits_scale
            # Complexity model: bits ~ cplx / qstep  =>  cplx ~ bits * qstep.
            cplx = 0.75 * cplx + 0.25 * bits_f * qstep(qp_f)
            buf = buf + bits_f - target
            new_carry = (rdy, rdu, rdv, qp_f, buf, cplx)
            return new_carry, (stream, bits, qp)

        init = (
            jnp.asarray(ref_y, jnp.uint8), jnp.asarray(ref_u, jnp.uint8),
            jnp.asarray(ref_v, jnp.uint8), qp0, buf0, cplx0,
        )
        carry, (streams, bits, qps) = jax.lax.scan(step, init, (ys, us, vs))
        recon = carry[:3]
        return streams, bits, qps, recon, (carry[3], carry[4], carry[5])
