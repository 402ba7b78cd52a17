"""TPU-backed H.264 decoder: host entropy parse, device reconstruction.

The serial stages stay on the host (NAL scan, slice headers, CAVLC/CABAC
symbol parse — inherently bit-serial), and everything with pixel-level
parallelism runs batched under jit on the device: inverse quant + IDCT,
quarter-pel motion compensation (half-pel planes + one window extraction +
a 16-way sub-pel select), wavefront intra reconstruction, and the in-loop
deblocking filter. Reference frames stay device-resident between AUs.

This is the product decode path the reference delegates to the Logan ASIC
(video_decoder/VideoDecoderNetint.cpp:550-700); the scalar numpy
ReferenceDecoder (ref/decoder.py) remains the bit-exactness oracle —
tests pin this decoder's output equal to it frame by frame.

Scope: the streams this framework's encoder emits — single- or multi-slice
pictures (row-aligned slices, assembled per picture), P_Skip/P_L0_16x16,
I_16x16 and I_4x4, CAVLC or CABAC, per-MB QP, |MV| within the supported
window. Anything else raises UnsupportedStream and the API layer falls back
to the reference decoder.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitstream import BitReader
from ..core import nal as nal_mod
from ..core.syntax import PPS, SPS, SliceHeader
from ..entropy import cavlc
from ..entropy.cavlc_tables import CBP_TABLE
from ..ops import intra as intra_ops
from ..ops import transform as T
from ..ref.decoder import DecodedFrame
from . import mv_pred
from .encoder import ZSCAN_TO_RASTER, _blocks8_mb, _blocks_mb
from .pframe_core import INTERP_HALO, _extract_win, _mb_context, mc_chroma_ext
from ..ops import interp as interp_ops

# Supported integer MV reach (full-pel) for the device MC window machinery;
# the encoder's search range (8) + sub-pel refinement stays well inside.
MV_RANGE = 10


class UnsupportedStream(Exception):
    """Feature outside the TPU decode path's envelope (caller falls back)."""


# ------------------------------------------------------------- host parsing


def parse_pslice_symbols(br: BitReader, R: int, C: int, slice_qp: int = 26,
                         partial: bool = False):
    """CAVLC P-slice symbol parse (no reconstruction): the inverse of
    pipeline/slice_coder.write_pslice_mbs. Tracks mb_qp_delta into a per-MB
    QP map (adaptive-quantization streams).

    partial: stop at the RBSP end instead of requiring R*C macroblocks
    (multi-slice pictures: the caller parses each slice into a local array
    with slice-local neighbor rules, then assembles). The returned dict's
    "covered" is the number of MBs parsed."""
    mv = np.zeros((R, C, 2), np.int32)
    luma = np.zeros((R, C, 16, 16), np.int32)
    cdc = np.zeros((R, C, 2, 4), np.int32)
    cac = np.zeros((R, C, 2, 4, 15), np.int32)
    qp_map = np.full((R, C), slice_qp, np.int32)
    cur_qp = int(slice_qp)
    luma_nnz = np.zeros((R * 4, C * 4), np.int32)
    chroma_nnz = np.zeros((2, R * 2, C * 2), np.int32)
    mv_map: dict = {}

    def nc_of(nnz, by, bx):
        a_av = bx > 0
        b_av = by > 0
        na = int(nnz[by, bx - 1]) if a_av else 0
        nb = int(nnz[by - 1, bx]) if b_av else 0
        if a_av and b_av:
            return (na + nb + 1) >> 1
        return na if a_av else (nb if b_av else 0)

    idx = 0
    n = R * C
    while idx < n and (not partial or idx == 0 or br.more_rbsp_data()):
        run = br.ue()
        for _ in range(run):
            if idx >= n:
                raise UnsupportedStream("skip run past slice end")
            r, c = divmod(idx, C)
            smv = mv_pred.skip_mv(mv_map, r, c, C)
            mv[r, c] = smv
            mv_map[(r, c)] = smv
            idx += 1
        if idx >= n:
            break
        r, c = divmod(idx, C)
        mb_type = br.ue()
        if mb_type != 0:
            raise UnsupportedStream(f"P mb_type {mb_type}")
        mvdx = br.se()
        mvdy = br.se()
        px, py = mv_pred.predict_mv(mv_map, r, c, C)
        this = (px + mvdx, py + mvdy)
        mv[r, c] = this
        mv_map[(r, c)] = this
        cbp = int(CBP_TABLE[br.ue()][1])
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            cur_qp = (cur_qp + br.se() + 52) % 52
        qp_map[r, c] = cur_qp
        for g8 in range(4):
            blks = [int(ZSCAN_TO_RASTER[g8 * 4 + k]) for k in range(4)]
            if not (cbp_luma >> g8) & 1:
                for b in blks:
                    luma_nnz[r * 4 + b // 4, c * 4 + b % 4] = 0
                continue
            for b in blks:
                by, bx = r * 4 + b // 4, c * 4 + b % 4
                coeffs, tc = cavlc.decode_block(br, nc_of(luma_nnz, by, bx), 16)
                luma[r, c, b] = coeffs
                luma_nnz[by, bx] = tc
        if cbp_chroma:
            for comp in range(2):
                coeffs, _ = cavlc.decode_block(br, -1, 4)
                cdc[r, c, comp] = coeffs
        if cbp_chroma == 2:
            for comp in range(2):
                for b in range(4):
                    by, bx = r * 2 + b // 2, c * 2 + b % 2
                    coeffs, tc = cavlc.decode_block(
                        br, nc_of(chroma_nnz[comp], by, bx), 15)
                    cac[r, c, comp, b] = coeffs
                    chroma_nnz[comp, by, bx] = tc
        else:
            chroma_nnz[:, r * 2 : r * 2 + 2, c * 2 : c * 2 + 2] = 0
        idx += 1
    return {"mv": mv, "luma_levels": luma, "cdc_levels": cdc,
            "cac_levels": cac, "qp_map": qp_map, "covered": idx}


# -------------------------------------------------------- device P recon


def _luma_mc_device(ref_y, mv, R: int, C: int):
    """Quarter-pel luma MC for arbitrary per-MB MVs within MV_RANGE.

    ref_y: (H, W) int32; mv: (N, 2) quarter-pel. Builds the three half-pel
    planes once, extracts one 18x18 window per plane per MB at the integer
    base, then selects among the 16 sub-pel positions (spec Table 8-12) —
    the decode-side twin of the encoder's refine_subpel."""
    rs = MV_RANGE
    pad_off = rs + INTERP_HALO
    plane = jnp.pad(ref_y, pad_off, mode="edge")
    hp_b, hp_h, hp_j = interp_ops.half_pel_planes(plane)

    ix = mv[:, 0] >> 2
    iy = mv[:, 1] >> 2
    fx = mv[:, 0] & 3
    fy = mv[:, 1] & 3
    dy0 = iy + rs + 1
    dx0 = ix + rs + 1

    n = R * C

    def win(p):
        # uint8 context + pinned extraction outputs: without the barrier
        # XLA rematerializes the one-hot window extraction into every
        # sub-pel candidate's fusion (the encode-side refine_subpel lesson).
        ctx = _mb_context(p.astype(jnp.uint8), R, C, pad_off, 16,
                          rs + 2, 2 * rs + 20)
        return _extract_win(ctx, dy0, dx0, 18)

    wins = jax.lax.optimization_barrier(
        (win(plane), win(hp_b), win(hp_h), win(hp_j)))

    # Lane-aligned candidate evaluation (see refine_subpel): the needed
    # integer shifts of each plane window ride as flattened (N, 256) int16
    # tensors; each of the 16 sub-pel positions is a rounded average of
    # two of them (Table 8-12), selected per-MB by (fx, fy).
    def plane_shifts(w):
        w16 = w.astype(jnp.int16)
        return {(oy, ox): w16[:, oy : oy + 16, ox : ox + 16].reshape(n, 256)
                for oy in (1, 2) for ox in (1, 2)}

    shifts = dict(zip("gbhj", (plane_shifts(w) for w in wins)))
    TAPS = {
        (0, 0): (("g", 0, 0),),
        (1, 0): (("g", 0, 0), ("b", 0, 0)),
        (2, 0): (("b", 0, 0),),
        (3, 0): (("b", 0, 0), ("g", 1, 0)),
        (0, 1): (("g", 0, 0), ("h", 0, 0)),
        (1, 1): (("b", 0, 0), ("h", 0, 0)),
        (2, 1): (("b", 0, 0), ("j", 0, 0)),
        (3, 1): (("b", 0, 0), ("h", 1, 0)),
        (0, 2): (("h", 0, 0),),
        (1, 2): (("h", 0, 0), ("j", 0, 0)),
        (2, 2): (("j", 0, 0),),
        (3, 2): (("j", 0, 0), ("h", 1, 0)),
        (0, 3): (("h", 0, 0), ("g", 0, 1)),
        (1, 3): (("h", 0, 0), ("b", 0, 1)),
        (2, 3): (("j", 0, 0), ("b", 0, 1)),
        (3, 3): (("h", 1, 0), ("b", 0, 1)),
    }

    def pred_flat(xf_, yf_):
        taps = TAPS[(xf_, yf_)]
        vals = [shifts[p][(1 + py, 1 + px)] for p, px, py in taps]
        if len(vals) == 1:
            return vals[0]
        return (vals[0] + vals[1] + 1) >> 1

    pred = jnp.zeros((n, 256), jnp.int16)
    for yf_ in range(4):
        for xf_ in range(4):
            sel = ((fx == xf_) & (fy == yf_))[:, None]
            pred = pred + jnp.where(sel, pred_flat(xf_, yf_), 0)
    return pred.reshape(n, 16, 16).astype(jnp.int32)


def _chroma_recon(pred_c, cdc_c, cac_c, qp_c):
    """Decode-side chroma residual chain (mirrors pframe_core.chroma_code's
    reconstruction half)."""
    n = pred_c.shape[0]
    z2 = T.inverse_zigzag(jnp.pad(cdc_c, ((0, 0), (0, 12))))[:, :2, :2]
    z2 = cdc_c.reshape(n, 2, 2)
    d2 = T.dequant_dc_2x2(T.hadamard_2x2(z2), qp_c)
    z_ac = T.inverse_zigzag(
        jnp.concatenate([jnp.zeros((n, 4, 1), jnp.int32), cac_c], axis=2)
    )
    d_c = T.dequant_4x4(z_ac, qp_c).at[:, :, 0, 0].set(d2.reshape(n, 4))
    return jnp.clip(pred_c + _blocks8_mb(T.inverse_4x4(d_c)), 0, 255)


@functools.partial(jax.jit, static_argnums=(0, 1, 7, 10))
def _recon_pframe_device_sparse(R: int, C: int, ref_y, ref_u, ref_v,
                                mv, nz_idx_vals, deblock: bool, qp,
                                qp_map=None, slice_starts: tuple = ()):
    """P recon from a SPARSE level representation: (idx, vals) scatter into
    the flat per-MB level space (256 luma + 8 cdc + 120 cac = 384 per MB).

    Residual levels are typically a few percent nonzero; shipping dense
    int32 symbol tensors costs ~13 MB/frame at 1080p — the decode wall on
    a bandwidth-limited host link — while (idx int32, val int16) at an
    eighth-density cap is <1 MB, and the device-side scatter is <1 ms."""
    n = R * C
    idx, vals = nz_idx_vals
    dense = jnp.zeros((n * 384,), jnp.int32).at[idx].set(
        vals.astype(jnp.int32), mode="drop")
    per_mb = dense.reshape(n, 384)
    luma = per_mb[:, :256].reshape(R, C, 16, 16)
    cdc = per_mb[:, 256:264].reshape(R, C, 2, 4)
    cac = per_mb[:, 264:].reshape(R, C, 2, 4, 15)
    return _recon_pframe_body(R, C, ref_y, ref_u, ref_v, mv, luma,
                              (cdc, cac), deblock, qp, qp_map, slice_starts)


@functools.partial(jax.jit, static_argnums=(0, 1, 8, 11))
def _recon_pframe_device(R: int, C: int, ref_y, ref_u, ref_v,
                         mv, luma, symbols_cdc_cac, deblock: bool, qp,
                         qp_map=None, slice_starts: tuple = ()):
    return _recon_pframe_body(R, C, ref_y, ref_u, ref_v, mv, luma,
                              symbols_cdc_cac, deblock, qp, qp_map,
                              slice_starts)


def _recon_pframe_body(R: int, C: int, ref_y, ref_u, ref_v,
                       mv, luma, symbols_cdc_cac, deblock: bool, qp,
                       qp_map=None, slice_starts: tuple = ()):
    """qp: slice QP; qp_map: optional (R, C) per-MB QP (mb_qp_delta
    streams) for the residual dequant and the per-edge qPav deblocking
    thresholds (spec 8.7.2)."""
    cdc, cac = symbols_cdc_cac
    n = R * C
    qp_c = jnp.asarray(T.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 51)]
    qp_res = qp if qp_map is None else qp_map.reshape(n)
    qp_c_res = (qp_c if qp_map is None
                else jnp.asarray(T.CHROMA_QP_TABLE)[
                    jnp.clip(qp_map.reshape(n), 0, 51)])
    mvf = mv.reshape(n, 2)
    pred_y = _luma_mc_device(jnp.asarray(ref_y, jnp.int32), mvf, R, C)
    halo_c = MV_RANGE // 2 + 2
    ru_ext = jnp.pad(jnp.asarray(ref_u, jnp.int32),
                     ((halo_c, halo_c), (0, 0)), mode="edge")
    rv_ext = jnp.pad(jnp.asarray(ref_v, jnp.int32),
                     ((halo_c, halo_c), (0, 0)), mode="edge")
    pred_u = mc_chroma_ext(ru_ext, mvf, R, C, halo_c)
    pred_v = mc_chroma_ext(rv_ext, mvf, R, C, halo_c)

    z = T.inverse_zigzag(luma.reshape(n, 16, 16))
    res = _blocks_mb(T.inverse_4x4(T.dequant_4x4(z, qp_res)))
    recon = jnp.clip(pred_y + res, 0, 255)
    rec_u = _chroma_recon(pred_u, cdc.reshape(n, 2, 4)[:, 0],
                          cac.reshape(n, 2, 4, 15)[:, 0], qp_c_res)
    rec_v = _chroma_recon(pred_v, cdc.reshape(n, 2, 4)[:, 1],
                          cac.reshape(n, 2, 4, 15)[:, 1], qp_c_res)

    def plane(x, size):
        return (x.reshape(R, C, size, size).transpose(0, 2, 1, 3)
                .reshape(R * size, C * size).astype(jnp.uint8))

    ry, ru, rv = plane(recon, 16), plane(rec_u, 8), plane(rec_v, 8)
    if deblock:
        from .deblock_apply import deblock_pframe_from_symbols
        from .pframe_core import SYMBOLS_PER_MB

        symbols = jnp.concatenate([
            mv.reshape(n, 2).astype(jnp.int16),
            luma.reshape(n, 256).astype(jnp.int16),
            cdc.reshape(n, 8).astype(jnp.int16),
            cac.reshape(n, 120).astype(jnp.int16),
        ], axis=-1).reshape(R, C, SYMBOLS_PER_MB)
        ry, ru, rv = deblock_pframe_from_symbols(ry, ru, rv, symbols, qp,
                                                 qp_c, R, C,
                                                 slice_starts=slice_starts,
                                                 qp_map=qp_map)
    return ry, ru, rv


@functools.partial(jax.jit, static_argnums=(0, 1, 7, 8, 9))
def _recon_iframe_device(R: int, C: int, mode16, chroma_mode, luma_sym,
                         chroma_sym, qp, deblock: bool,
                         slice_starts: tuple = (),
                         deblock_starts: tuple = ()):
    """slice_starts: rows starting a new slice (intra prediction never
    crosses them). deblock_starts: rows where the filter must not cross
    (disable_deblocking_filter_idc == 2; empty when idc == 0)."""
    """Wavefront I_16x16 reconstruction with given modes/levels (the decode
    twin of FrameEncoder._encode_iframe_device's scan)."""
    dc_levels, ac_levels = luma_sym
    cdc_levels, cac_levels = chroma_sym
    qp_c = jnp.asarray(T.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 51)]

    from .encoder import _wave_indices

    rows_np, cols_np, mask_np = _wave_indices(R, C)
    rows, cols, mask = map(jnp.asarray, (rows_np, cols_np, mask_np))
    n_waves = rows.shape[0]
    has_top_np = np.ones(R + 2, bool)
    has_top_np[0] = False
    for sr in slice_starts:
        has_top_np[sr] = False  # intra never crosses a slice boundary
    has_top = jnp.asarray(has_top_np)

    state = {
        "recon_y": jnp.zeros((R, C, 16, 16), jnp.int32),
        "recon_u": jnp.zeros((R, C, 8, 8), jnp.int32),
        "recon_v": jnp.zeros((R, C, 8, 8), jnp.int32),
    }

    def wave_step(state, wave_idx):
        r = jax.lax.dynamic_index_in_dim(rows, wave_idx, keepdims=False)
        c = jax.lax.dynamic_index_in_dim(cols, wave_idx, keepdims=False)
        valid = jax.lax.dynamic_index_in_dim(mask, wave_idx, keepdims=False)
        avail_top = has_top[jnp.clip(r, 0, R + 1)] & valid
        avail_left = (c > 0) & valid
        rm1 = jnp.maximum(r - 1, 0)
        cm1 = jnp.maximum(c - 1, 0)
        rc = jnp.minimum(r, R - 1)
        cc = jnp.minimum(c, C - 1)

        ry = state["recon_y"]
        top = ry[rm1, cc, 15, :]
        left = ry[rc, cm1, :, 15]
        top_left = ry[rm1, cm1, 15, 15]
        preds = intra_ops.pred_16x16_all(top, left, top_left, avail_top,
                                         avail_left)
        mode = mode16[rc, cc]
        pred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                   axis=1)[:, 0]
        # Luma residual: DC Hadamard chain + AC blocks.
        dcz = dc_levels[rc, cc]  # (N, 16) zig-zag
        z_dc = T.inverse_zigzag(dcz)
        f_dc = T.hadamard_4x4(z_dc.reshape(-1, 4, 4))
        d_dc = T.dequant_dc_4x4(f_dc, qp)
        acz = ac_levels[rc, cc]  # (N, 16, 15)
        z_ac = T.inverse_zigzag(jnp.concatenate(
            [jnp.zeros(acz.shape[:-1] + (1,), jnp.int32), acz], axis=-1))
        d = T.dequant_4x4(z_ac, qp).at[:, :, 0, 0].set(d_dc.reshape(-1, 16))
        recon = jnp.clip(pred + _blocks_mb(T.inverse_4x4(d)), 0, 255)

        cu_top = state["recon_u"][rm1, cc, 7, :]
        cu_left = state["recon_u"][rc, cm1, :, 7]
        cu_tl = state["recon_u"][rm1, cm1, 7, 7]
        cv_top = state["recon_v"][rm1, cc, 7, :]
        cv_left = state["recon_v"][rc, cm1, :, 7]
        cv_tl = state["recon_v"][rm1, cm1, 7, 7]
        cmode = chroma_mode[rc, cc]
        preds_u = intra_ops.pred_chroma_all(cu_top, cu_left, cu_tl,
                                            avail_top, avail_left)
        preds_v = intra_ops.pred_chroma_all(cv_top, cv_left, cv_tl,
                                            avail_top, avail_left)
        pred_u = jnp.take_along_axis(preds_u, cmode[:, None, None, None],
                                     axis=1)[:, 0]
        pred_v = jnp.take_along_axis(preds_v, cmode[:, None, None, None],
                                     axis=1)[:, 0]
        rec_u = _chroma_recon(pred_u, cdc_levels[rc, cc, 0],
                              cac_levels[rc, cc, 0], qp_c)
        rec_v = _chroma_recon(pred_v, cdc_levels[rc, cc, 1],
                              cac_levels[rc, cc, 1], qp_c)

        def scatter(dst, val):
            old = dst[rc, cc]
            val = jnp.where(
                valid.reshape(valid.shape + (1,) * (val.ndim - 1)), val, old)
            return dst.at[r, c].set(val, mode="drop")

        state = {
            "recon_y": scatter(state["recon_y"], recon),
            "recon_u": scatter(state["recon_u"], rec_u),
            "recon_v": scatter(state["recon_v"], rec_v),
        }
        return state, None

    state, _ = jax.lax.scan(wave_step, state, jnp.arange(n_waves))
    ry = state["recon_y"].transpose(0, 2, 1, 3).reshape(R * 16, C * 16)
    ru = state["recon_u"].transpose(0, 2, 1, 3).reshape(R * 8, C * 8)
    rv = state["recon_v"].transpose(0, 2, 1, 3).reshape(R * 8, C * 8)
    if deblock:
        from .deblock_apply import deblock_iframe

        return deblock_iframe(ry, ru, rv, qp, qp_c, R, C, deblock_starts)
    return (ry.astype(jnp.uint8), ru.astype(jnp.uint8),
            rv.astype(jnp.uint8))


@functools.partial(jax.jit, static_argnums=(0, 1, 8, 9, 10))
def _recon_iframe_mixed_device(R: int, C: int, mode16, chroma_mode, luma_sym,
                               chroma_sym, i4_sym, qp, deblock: bool,
                               slice_starts: tuple = (),
                               deblock_starts: tuple = ()):
    """Wavefront reconstruction of a mixed I_16x16 / I_4x4 intra frame.

    The decode twin of the encoder's i4x4 wave (encoder.py
    _encode_iframe_device with i4x4=True): skew-2 schedule (above-right MBs
    decoded first), per-MB select between the I_16x16 recon and the 16-step
    z-scan I_4x4 chain — but with the coded modes instead of SATD decisions.
    i4_sym = (is_i4 (R, C), modes4 (R, C, 16) z-scan, luma4 (R, C, 16, 16)
    zig-zag per raster block)."""
    from .encoder import ZSCAN_TO_RASTER, _wave_indices

    dc_levels, ac_levels = luma_sym
    cdc_levels, cac_levels = chroma_sym
    is_i4, modes4, luma4 = i4_sym
    qp_c = jnp.asarray(T.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 51)]

    rows_np, cols_np, mask_np = _wave_indices(R, C, skew=2)
    rows, cols, mask = map(jnp.asarray, (rows_np, cols_np, mask_np))
    n_waves = rows.shape[0]
    has_top_np = np.ones(R + 2, bool)
    has_top_np[0] = False
    for sr in slice_starts:
        has_top_np[sr] = False
    has_top = jnp.asarray(has_top_np)

    state = {
        "recon_y": jnp.zeros((R, C, 16, 16), jnp.int32),
        "recon_u": jnp.zeros((R, C, 8, 8), jnp.int32),
        "recon_v": jnp.zeros((R, C, 8, 8), jnp.int32),
    }

    def wave_step(state, wave_idx):
        r = jax.lax.dynamic_index_in_dim(rows, wave_idx, keepdims=False)
        c = jax.lax.dynamic_index_in_dim(cols, wave_idx, keepdims=False)
        valid = jax.lax.dynamic_index_in_dim(mask, wave_idx, keepdims=False)
        avail_top = has_top[jnp.clip(r, 0, R + 1)] & valid
        avail_left = (c > 0) & valid
        rm1 = jnp.maximum(r - 1, 0)
        cm1 = jnp.maximum(c - 1, 0)
        rc = jnp.minimum(r, R - 1)
        cc = jnp.minimum(c, C - 1)
        N = rc.shape[0]

        ry = state["recon_y"]
        top = ry[rm1, cc, 15, :]
        left = ry[rc, cm1, :, 15]
        top_left = ry[rm1, cm1, 15, 15]

        # ---- I_16x16 candidate ----
        preds = intra_ops.pred_16x16_all(top, left, top_left, avail_top,
                                         avail_left)
        mode = mode16[rc, cc]
        pred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                   axis=1)[:, 0]
        dcz = dc_levels[rc, cc]
        z_dc = T.inverse_zigzag(dcz)
        f_dc = T.hadamard_4x4(z_dc.reshape(-1, 4, 4))
        d_dc = T.dequant_dc_4x4(f_dc, qp)
        acz = ac_levels[rc, cc]
        z_ac = T.inverse_zigzag(jnp.concatenate(
            [jnp.zeros(acz.shape[:-1] + (1,), jnp.int32), acz], axis=-1))
        d = T.dequant_4x4(z_ac, qp).at[:, :, 0, 0].set(d_dc.reshape(-1, 16))
        recon16 = jnp.clip(pred + _blocks_mb(T.inverse_4x4(d)), 0, 255)

        # ---- I_4x4 candidate: 16-step z-scan chain with coded modes ----
        m4 = modes4[rc, cc]  # (N, 16) z-scan
        lv4 = luma4[rc, cc]  # (N, 16, 16) zig-zag, raster blocks
        cp1 = jnp.minimum(cc + 1, C - 1)
        tr_mb_ok = avail_top & (cc < C - 1)
        tr_row4 = ry[rm1, cp1, 15, 0:4]
        TR_OK = {(1, 0): True, (1, 1): False, (1, 2): True,
                 (1, 3): False, (2, 0): True, (2, 1): True,
                 (2, 2): True, (2, 3): False, (3, 0): True,
                 (3, 1): False, (3, 2): True, (3, 3): False}
        cur = jnp.zeros((N, 16, 16), jnp.int32)
        ones_b = jnp.ones((N,), bool)
        for z in range(16):
            b = int(ZSCAN_TO_RASTER[z])
            by, bx = b // 4, b % 4
            x0, y0 = bx * 4, by * 4
            top4 = (top[:, x0 : x0 + 4] if by == 0
                    else cur[:, y0 - 1, x0 : x0 + 4])
            left4 = (left[:, y0 : y0 + 4] if bx == 0
                     else cur[:, y0 : y0 + 4, x0 - 1])
            if by == 0 and bx == 0:
                corner = top_left
            elif by == 0:
                corner = top[:, x0 - 1]
            elif bx == 0:
                corner = left[:, y0 - 1]
            else:
                corner = cur[:, y0 - 1, x0 - 1]
            if by == 0:
                if bx < 3:
                    tr4 = top[:, x0 + 4 : x0 + 8]
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
                [top4, jnp.where(tr_ok[:, None], tr4, top4[:, 3:4])], axis=1)
            preds4, _ok4 = intra_ops.pred_4x4_all(
                t8, left4, corner, b_top, b_left, tr_ok)
            p4 = jnp.take_along_axis(
                preds4, m4[:, z][:, None, None, None], axis=1)[:, 0]
            zl = T.inverse_zigzag(lv4[:, b])  # (N, 4, 4)
            rec4 = jnp.clip(
                p4 + T.inverse_4x4(T.dequant_4x4(zl, qp)), 0, 255)
            cur = cur.at[:, y0 : y0 + 4, x0 : x0 + 4].set(rec4)

        i4 = is_i4[rc, cc].astype(bool)
        recon = jnp.where(i4[:, None, None], cur, recon16)

        # ---- chroma (shared) ----
        cu_top = state["recon_u"][rm1, cc, 7, :]
        cu_left = state["recon_u"][rc, cm1, :, 7]
        cu_tl = state["recon_u"][rm1, cm1, 7, 7]
        cv_top = state["recon_v"][rm1, cc, 7, :]
        cv_left = state["recon_v"][rc, cm1, :, 7]
        cv_tl = state["recon_v"][rm1, cm1, 7, 7]
        cmode = chroma_mode[rc, cc]
        preds_u = intra_ops.pred_chroma_all(cu_top, cu_left, cu_tl,
                                            avail_top, avail_left)
        preds_v = intra_ops.pred_chroma_all(cv_top, cv_left, cv_tl,
                                            avail_top, avail_left)
        pred_u = jnp.take_along_axis(preds_u, cmode[:, None, None, None],
                                     axis=1)[:, 0]
        pred_v = jnp.take_along_axis(preds_v, cmode[:, None, None, None],
                                     axis=1)[:, 0]
        rec_u = _chroma_recon(pred_u, cdc_levels[rc, cc, 0],
                              cac_levels[rc, cc, 0], qp_c)
        rec_v = _chroma_recon(pred_v, cdc_levels[rc, cc, 1],
                              cac_levels[rc, cc, 1], qp_c)

        def scatter(dst, val):
            old = dst[rc, cc]
            val = jnp.where(
                valid.reshape(valid.shape + (1,) * (val.ndim - 1)), val, old)
            return dst.at[r, c].set(val, mode="drop")

        state = {
            "recon_y": scatter(state["recon_y"], recon),
            "recon_u": scatter(state["recon_u"], rec_u),
            "recon_v": scatter(state["recon_v"], rec_v),
        }
        return state, None

    state, _ = jax.lax.scan(wave_step, state, jnp.arange(n_waves))
    ry = state["recon_y"].transpose(0, 2, 1, 3).reshape(R * 16, C * 16)
    ru = state["recon_u"].transpose(0, 2, 1, 3).reshape(R * 8, C * 8)
    rv = state["recon_v"].transpose(0, 2, 1, 3).reshape(R * 8, C * 8)
    if deblock:
        from .deblock_apply import deblock_iframe

        return deblock_iframe(ry, ru, rv, qp, qp_c, R, C, deblock_starts)
    return (ry.astype(jnp.uint8), ru.astype(jnp.uint8),
            rv.astype(jnp.uint8))


# ------------------------------------------------------------------ session


class LazyDecodedFrame:
    """DecodedFrame twin whose planes stay DEVICE-resident until accessed.

    The TPU decode pipeline is host-entropy-parse -> device recon ->
    plane download; materializing planes eagerly serializes the (slow)
    host<->device transfer of frame i against the host parse of frame
    i+1. Returning lazy frames lets decode_annexb dispatch every AU's
    recon before any download happens — device compute and transfers then
    overlap the next AU's entropy parse. Duck-types ref.decoder.
    DecodedFrame (.y/.u/.v/.frame_num/.idr)."""

    __slots__ = ("_dev", "_np", "frame_num", "idr")

    def __init__(self, dev_planes, frame_num: int, idr: bool):
        self._dev = dev_planes
        self._np = None
        self.frame_num = frame_num
        self.idr = idr

    def start_transfer(self) -> None:
        """Kick off the device->host copies without blocking (the decode
        loop calls this right after dispatching the NEXT AU's recon, so
        the transfer rides under the following host entropy parse)."""
        for p in self._dev:
            try:
                p.copy_to_host_async()
            except AttributeError:
                break

    def _materialize(self):
        if self._np is None:
            self._np = tuple(np.asarray(p) for p in self._dev)
        return self._np

    @property
    def y(self):
        return self._materialize()[0]

    @property
    def u(self):
        return self._materialize()[1]

    @property
    def v(self):
        return self._materialize()[2]


@dataclass
class TpuDecoder:
    """Stateful Annex-B decoder (same interface as ReferenceDecoder)."""

    sps: SPS | None = None
    pps: PPS | None = None
    ref_planes: tuple | None = None  # device-resident (y, u, v) uint8
    frames: list = field(default_factory=list)

    def decode_annexb(self, data: bytes) -> list[DecodedFrame]:
        out = []
        for nu in nal_mod.iter_nal_units(data):
            if nu.nal_type == 7:
                self.sps = SPS.parse(BitReader(nu.rbsp))
            elif nu.nal_type == 8:
                self.pps = PPS.parse(BitReader(nu.rbsp))
            elif nu.nal_type in (1, 5):
                frame = self._decode_slice(nu.rbsp, nu.nal_type,
                                           nu.nal_ref_idc)
                if frame is not None:
                    frame.start_transfer()
                    out.append(frame)
                    self.frames.append(frame)
        return out

    def _decode_slice(self, rbsp: bytes, nal_type: int, nal_ref_idc: int):
        if self.sps is None or self.pps is None:
            raise ValueError("slice before SPS/PPS")
        sps, pps = self.sps, self.pps
        br = BitReader(rbsp)
        hdr = SliceHeader.parse(br, sps, pps, nal_type=nal_type,
                                nal_ref_idc=nal_ref_idc)
        C = sps.pic_width_in_mbs
        if hdr.is_b or sps.pic_order_cnt_type == 0:
            # B pictures / reordered streams: outside the device path's
            # envelope — raise on the FIRST slice so the API fallback hands
            # the whole stream to the scalar decoder with a clean DPB.
            raise UnsupportedStream("B/reordered stream (POC type 0)")
        if hdr.first_mb_in_slice % C:
            raise UnsupportedStream("non-row-aligned slice")
        if hdr.first_mb_in_slice == 0:
            self._asm = None  # new picture
        try:
            return self._decode_slice_body(rbsp, br, hdr, nal_ref_idc)
        except UnsupportedStream:
            self._asm = None
            raise
        except (ValueError, NotImplementedError, IndexError, KeyError,
                EOFError) as e:
            # Syntax outside this path's envelope (or a stream the scalar
            # reference decoder may still handle): route to the fallback.
            self._asm = None
            raise UnsupportedStream(str(e)) from e

    def _decode_slice_body(self, rbsp, br, hdr, nal_ref_idc: int):
        """Parse one slice into slice-local symbol arrays (neighbor rules
        reset at slice boundaries come for free), accumulate into the
        picture assembly, and reconstruct on device once the picture is
        complete (multi-slice pictures arrive as several NALs)."""
        sps, pps = self.sps, self.pps
        qp = pps.pic_init_qp + hdr.slice_qp_delta
        R, C = sps.pic_height_in_mbs, sps.pic_width_in_mbs
        r0 = hdr.first_mb_in_slice // C
        n_avail = R - r0

        asm = getattr(self, "_asm", None)
        if asm is None:
            asm = self._asm = {
                "is_p": hdr.is_p, "covered": 0, "slice_starts": [],
                "qp0": qp, "idc": hdr.disable_deblocking_filter_idc,
                "qp_map": np.full((R, C), qp, np.int32),
            }
        if asm["is_p"] != hdr.is_p or asm["covered"] != r0 * C:
            raise UnsupportedStream("mixed/out-of-order slices in a picture")
        asm["slice_starts"].append(r0)

        if hdr.is_p:
            if self.ref_planes is None:
                raise ValueError("P slice without reference frame")
            if pps.entropy_coding_mode:
                from .. import native

                pos = br.bit_position
                pos += (8 - pos % 8) % 8
                sym = native.cabac_parse_pslice_native(
                    rbsp, pos, n_avail, C, qp, hdr.cabac_init_idc)
                if sym is None or sym["covered"] != n_avail * C:
                    from ..entropy.cabac_slice import parse_pslice_cabac

                    sym = parse_pslice_cabac(rbsp, pos, n_avail, C, qp,
                                             hdr.cabac_init_idc)
                if sym.get("qp_map") is None:
                    sym["qp_map"] = np.full((n_avail, C), qp, np.int32)
            else:
                sym = None
                from .. import native

                nat = native.parse_pslice_native(
                    rbsp, len(rbsp) * 8, br.bit_position, n_avail, C, qp)
                if nat is not None and nat["covered"] == n_avail * C:
                    # C++ fast path: the slice covered the full remaining
                    # band (single-slice pictures and last slices).
                    sym = nat
                if sym is None:
                    sym = parse_pslice_symbols(br, n_avail, C, slice_qp=qp,
                                               partial=True)
            covered = int(sym["covered"])
            if covered % C:
                raise UnsupportedStream("slice ends mid-row")
            rows = covered // C
            if asm.setdefault("fields", None) is None:
                asm["fields"] = {
                    "mv": np.zeros((R, C, 2), np.int32),
                    "luma_levels": np.zeros((R, C, 16, 16), np.int32),
                    "cdc_levels": np.zeros((R, C, 2, 4), np.int32),
                    "cac_levels": np.zeros((R, C, 2, 4, 15), np.int32),
                }
            for k in ("mv", "luma_levels", "cdc_levels", "cac_levels"):
                asm["fields"][k][r0 : r0 + rows] = sym[k][:rows]
            asm["qp_map"][r0 : r0 + rows] = sym["qp_map"][:rows]
        else:
            if r0 > 0 and qp != asm["qp0"]:
                # The I reconstruction dequantizes the whole picture at
                # qp0; a later slice carrying a different slice_qp_delta
                # would be silently mis-dequantized (the P path threads a
                # qp_map instead) — route to the scalar fallback.
                raise UnsupportedStream(
                    "per-slice QP change in an I picture")
            if pps.entropy_coding_mode:
                from .. import native

                pos = br.bit_position
                pos += (8 - pos % 8) % 8
                sy = native.cabac_parse_islice_native(rbsp, pos, n_avail, C,
                                                      qp)
                if sy is None:
                    from ..entropy.cabac_slice import parse_islice_cabac

                    sy = parse_islice_cabac(rbsp, pos, n_avail, C, qp)
            else:
                from .slice_coder import parse_islice_mbs

                pr = parse_islice_mbs(br, n_avail, C, qp, partial=True)
                sy = {"mode16": pr.mode16, "chroma_mode": pr.chroma_mode,
                      "dc_levels": pr.dc_levels, "ac_levels": pr.ac_levels,
                      "cdc_levels": pr.cdc_levels,
                      "cac_levels": pr.cac_levels, "is_i4": pr.is_i4,
                      "modes4": pr.modes4, "luma4_levels": pr.luma4_levels,
                      "covered": pr.covered}
            covered = int(sy["covered"])
            if covered % C:
                raise UnsupportedStream("slice ends mid-row")
            rows = covered // C
            if asm.setdefault("fields", None) is None:
                asm["fields"] = {
                    "mode16": np.zeros((R, C), np.int32),
                    "chroma_mode": np.zeros((R, C), np.int32),
                    "dc_levels": np.zeros((R, C, 16), np.int32),
                    "ac_levels": np.zeros((R, C, 16, 15), np.int32),
                    "cdc_levels": np.zeros((R, C, 2, 4), np.int32),
                    "cac_levels": np.zeros((R, C, 2, 4, 15), np.int32),
                    "is_i4": np.zeros((R, C), bool),
                    "modes4": np.zeros((R, C, 16), np.int32),
                    "luma4_levels": np.zeros((R, C, 16, 16), np.int32),
                }
            for k in ("mode16", "chroma_mode", "dc_levels", "ac_levels",
                      "cdc_levels", "cac_levels", "is_i4", "modes4",
                      "luma4_levels"):
                asm["fields"][k][r0 : r0 + rows] = sy[k][:rows]

        asm["covered"] += covered
        if asm["covered"] < R * C:
            return None  # picture incomplete; wait for the next slice
        self._asm = None
        return self._finish_picture(asm, hdr, nal_ref_idc, R, C)

    def _finish_picture(self, asm, hdr, nal_ref_idc: int, R: int, C: int):
        qp = asm["qp0"]
        deblock = asm["idc"] != 1
        slice_starts = tuple(sr for sr in asm["slice_starts"] if sr > 0)
        deblock_starts = slice_starts if asm["idc"] == 2 else ()
        f = asm["fields"]
        if asm["is_p"]:
            # The MC window covers integer offsets in [-(MV_RANGE+1),
            # MV_RANGE+1] (the dy0/dx0 bound in _luma_mc_device); note
            # mv >> 2 floors, so a -35 qpel MV needs integer -9 — inside
            # the window for the encoder's own rs=8 envelope (±35 qpel).
            ix = f["mv"] >> 2
            if ix.min() < -(MV_RANGE + 1) or ix.max() > MV_RANGE + 1:
                raise UnsupportedStream("MV beyond the device MC window")
            qp_varies = bool((asm["qp_map"] != qp).any())
            n = R * C
            flat = np.concatenate([
                f["luma_levels"].reshape(n, 256),
                f["cdc_levels"].reshape(n, 8),
                f["cac_levels"].reshape(n, 120),
            ], axis=1).reshape(-1)
            nz = np.flatnonzero(flat)
            # ONE cap per geometry (not nnz-bucketed: a per-frame bucket
            # flip would recompile the recon executable mid-stream), sized
            # at 12.5% density — comfortably above product bitrates (a
            # 1080p frame at 8 Mbps/30 fps carries well under 300k coded
            # coefficients). Denser frames take the dense path.
            cap = max(65536, (n * 384) // 8)
            i16_ok = (len(nz) == 0
                      or (abs(int(flat[nz].max(initial=0))) < 32768
                          and abs(int(flat[nz].min(initial=0))) < 32768))
            if len(nz) <= cap and cap < n * 384 and i16_ok:
                idx = np.full(cap, n * 384, np.int32)
                idx[: len(nz)] = nz
                vals = np.zeros(cap, np.int16)
                vals[: len(nz)] = flat[nz]
                ry, ru, rv = _recon_pframe_device_sparse(
                    R, C, *self.ref_planes,
                    jnp.asarray(f["mv"]),
                    (jnp.asarray(idx), jnp.asarray(vals)),
                    deblock, jnp.int32(qp),
                    jnp.asarray(asm["qp_map"]) if qp_varies else None,
                    deblock_starts)
            else:
                ry, ru, rv = _recon_pframe_device(
                    R, C, *self.ref_planes,
                    jnp.asarray(f["mv"]), jnp.asarray(f["luma_levels"]),
                    (jnp.asarray(f["cdc_levels"]),
                     jnp.asarray(f["cac_levels"])),
                    deblock, jnp.int32(qp),
                    jnp.asarray(asm["qp_map"]) if qp_varies else None,
                    deblock_starts)
        else:
            has_i4 = f["is_i4"] is not None and np.asarray(f["is_i4"]).any()
            if has_i4:
                ry, ru, rv = _recon_iframe_mixed_device(
                    R, C, jnp.asarray(f["mode16"]),
                    jnp.asarray(f["chroma_mode"]),
                    (jnp.asarray(f["dc_levels"]), jnp.asarray(f["ac_levels"])),
                    (jnp.asarray(f["cdc_levels"]),
                     jnp.asarray(f["cac_levels"])),
                    (jnp.asarray(f["is_i4"]).astype(np.int32),
                     jnp.asarray(f["modes4"]),
                     jnp.asarray(f["luma4_levels"])),
                    jnp.int32(qp), deblock, slice_starts, deblock_starts)
            else:
                ry, ru, rv = _recon_iframe_device(
                    R, C, jnp.asarray(f["mode16"]),
                    jnp.asarray(f["chroma_mode"]),
                    (jnp.asarray(f["dc_levels"]), jnp.asarray(f["ac_levels"])),
                    (jnp.asarray(f["cdc_levels"]),
                     jnp.asarray(f["cac_levels"])),
                    jnp.int32(qp), deblock, slice_starts, deblock_starts)

        if nal_ref_idc != 0:
            self.ref_planes = (ry, ru, rv)
        return LazyDecodedFrame((ry, ru, rv), hdr.frame_num, hdr.idr)
