"""Shared P-frame compute core: ME + MC + transform/quant + reconstruction.

Used by both the single-chip path (pipeline/encoder.py) and the multi-chip
MB-row-tile path (parallel/sharding.py); the tile path passes halo-extended
reference planes, the single-chip path passes edge-padded ones — the math is
identical, which is what makes the sharded output bit-exact vs single chip.

Outputs are packed for the host: one int16 symbol tensor per frame
(minimizing device->host transfers, which dominate per-array latency through
the TPU tunnel) and uint8 recon planes that normally stay device-resident as
the next frame's reference.

Symbol layout per MB (int16, SYMBOLS_PER_MB total):
  [ mvx, mvy,
    luma levels  16 blocks x 16 coeffs (zig-zag, raster block order),
    chroma DC    2 comps x 4,
    chroma AC    2 comps x 4 blocks x 15 ]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import interp as interp_ops
from ..ops import me as me_ops
from ..ops import transform as T


def chroma_qp_device(qp):
    """Traced chroma-QP derivation (spec Table 8-12) for on-device RC."""
    return jnp.asarray(T.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 51)]

# Extra halo beyond the full-pel search range: quarter-pel refinement moves
# the integer base by up to 1 pixel and the 6-tap interpolation reaches 3
# more samples.
INTERP_HALO = 4

SYMBOLS_PER_MB = 2 + 256 + 8 + 120  # = 386
_OFF_MV = 0
_OFF_LUMA = 2
_OFF_CDC = 2 + 256
_OFF_CAC = 2 + 256 + 8


def _mb_blocks(mb):
    n = mb.shape[0]
    return mb.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 4, 4)


def _blocks_mb(blocks):
    n = blocks.shape[0]
    return blocks.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)


def _mb_blocks8(mb):
    n = mb.shape[0]
    return mb.reshape(n, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(n, 4, 4, 4)


def _blocks8_mb(blocks):
    n = blocks.shape[0]
    return blocks.reshape(n, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)


def unpack_symbols(symbols):
    """(R, C, SYMBOLS_PER_MB) int16 -> dict of int32 numpy views."""
    import numpy as np

    s = np.asarray(symbols)
    R, C = s.shape[:2]
    return {
        "mv": s[..., _OFF_MV:_OFF_LUMA].astype(np.int32),
        "luma_levels": s[..., _OFF_LUMA:_OFF_CDC].reshape(R, C, 16, 16).astype(np.int32),
        "cdc_levels": s[..., _OFF_CDC:_OFF_CAC].reshape(R, C, 2, 4).astype(np.int32),
        "cac_levels": s[..., _OFF_CAC:].reshape(R, C, 2, 4, 15).astype(np.int32),
    }


def mc_chroma_ext(ref_c_ext, mv, R, C, halo: int):
    """Chroma MC against a plane extended with `halo` rows above and below.

    mv is in quarter-pel luma units == 1/8-pel chroma units (spec 8.4.2.2.2).
    Windows come from a structural context build + one-hot MXU extraction
    (no element gathers). halo = search_range//2 + 2 bounds the integer
    chroma displacement, so the context always covers the 9x9 bilinear patch.
    """
    rs = 2 * (halo - 2)  # caller passes halo = search_range // 2 + 2
    ix = mv[:, 0] >> 3
    iy = mv[:, 1] >> 3
    fx = (mv[:, 0] & 7)[:, None, None]
    fy = (mv[:, 1] & 7)[:, None, None]
    # integer displacement bounds: |qmv| <= 4*rs + 3  =>  ix in [lo_neg, hi]
    lo = (4 * rs + 10) // 8  # = -min(ix)
    hi = (4 * rs + 3) // 8
    S = hi + 9 + lo
    plane = jnp.pad(ref_c_ext, ((0, 0), (halo, halo)), mode="edge")
    ctx = _mb_context(plane.astype(jnp.uint8), R, C, halo, 8, lo, S)
    patch = _extract_win(ctx, iy + lo, ix + lo, 9)
    a = patch[:, :8, :8]
    b = patch[:, :8, 1:9]
    cc = patch[:, 1:9, :8]
    d = patch[:, 1:9, 1:9]
    return ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
            + (8 - fx) * fy * cc + fx * fy * d + 32) >> 6


def search_refine_luma(cur, ref_y_ext, search_range: int, R: int, C: int):
    """Full-pel search + quarter-pel refinement against one reference.

    cur: (N, 16, 16) int32 MBs; ref_y_ext: reference luma extended by
    search_range + INTERP_HALO rows above/below. Returns (qmv (N, 2)
    quarter-pel, pred (N, 16, 16), cost (N,))."""
    n = R * C
    rs = search_range
    ref_for_fullpel = ref_y_ext[INTERP_HALO:-INTERP_HALO]
    pad = jnp.pad(ref_for_fullpel, ((0, 0), (rs, rs)), mode="edge")
    if 2 * rs == 16:
        # Gather-free window build (see local_pframe_core).
        blk = pad.reshape(R + 1, 16, (C + 1) * 16)
        rows2 = jnp.concatenate([blk[:-1], blk[1:]], axis=1)
        t = rows2.reshape(R, 32, C + 1, 16)
        wins = jnp.concatenate([t[:, :, :-1], t[:, :, 1:]], axis=3)
        windows = wins.transpose(0, 2, 1, 3).reshape(n, 32, 32)
    else:
        r = jnp.arange(n, dtype=jnp.int32) // C
        c = jnp.arange(n, dtype=jnp.int32) % C
        span = jnp.arange(16 + 2 * rs, dtype=jnp.int32)
        rows = r[:, None] * 16 + span[None, :]
        cols = c[:, None] * 16 + span[None, :]
        windows = pad[rows[:, :, None], cols[:, None, :]]
    mv_full, _cost = me_ops.full_search(cur, windows, rs)
    pad_i = jnp.pad(ref_y_ext, ((0, 0), (rs + INTERP_HALO, rs + INTERP_HALO)),
                    mode="edge")
    hp_b, hp_h, hp_j = interp_ops.half_pel_planes(pad_i)
    return refine_subpel(cur, pad_i, hp_b, hp_h, hp_j, mv_full, R, C, rs)


B_SYMBOLS_PER_MB = 4 + 256 + 8 + 120  # = 388: mv0, mv1, luma, cdc, cac


def local_bframe_core(cur_y, cur_u, cur_v, ref0_ext, ref1_ext,
                      qp, qp_c, search_range: int, n_rows: int, n_cols: int):
    """B-frame encode core (B_Bi_16x16 everywhere): independent ME against
    both references, default bi-prediction (spec 8.4.2.3.2: rounded average
    of the two prediction signals), transform/quant of the bi residual.

    ref0_ext/ref1_ext: (y_ext, u_ext, v_ext) tuples padded like the P core's
    references. No reconstruction is produced — B frames are non-reference
    in this GOP structure, so their recon never feeds prediction."""
    R, C = n_rows, n_cols
    n = R * C
    rs = search_range
    halo_c = rs // 2 + 2
    cur = cur_y.reshape(R, 16, C, 16).transpose(0, 2, 1, 3).reshape(n, 16, 16)
    cu = cur_u.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(n, 8, 8)
    cv = cur_v.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(n, 8, 8)

    qmv0, pred0, _ = search_refine_luma(cur, ref0_ext[0], rs, R, C)
    qmv1, pred1, _ = search_refine_luma(cur, ref1_ext[0], rs, R, C)
    pred = (pred0 + pred1 + 1) >> 1

    pu = (mc_chroma_ext(ref0_ext[1], qmv0, R, C, halo_c)
          + mc_chroma_ext(ref1_ext[1], qmv1, R, C, halo_c) + 1) >> 1
    pv = (mc_chroma_ext(ref0_ext[2], qmv0, R, C, halo_c)
          + mc_chroma_ext(ref1_ext[2], qmv1, R, C, halo_c) + 1) >> 1

    res = _mb_blocks(cur - pred)
    z = T.quant_4x4(T.forward_4x4(res), qp, intra=False)

    def chroma_code(o_c, pred_c):
        w_c = T.forward_4x4(_mb_blocks8(o_c - pred_c))
        dc2 = w_c[:, :, 0, 0].reshape(-1, 2, 2)
        z2 = T.quant_dc_2x2(T.hadamard_2x2(dc2), qp_c, intra=False)
        z_cac = T.quant_4x4(w_c, qp_c, intra=False).at[:, :, 0, 0].set(0)
        return z2.reshape(-1, 4), z_cac

    zdc_u, zac_u = chroma_code(cu, pu)
    zdc_v, zac_v = chroma_code(cv, pv)

    symbols = jnp.concatenate(
        [
            qmv0.astype(jnp.int16),
            qmv1.astype(jnp.int16),
            T.zigzag(z).reshape(n, 256).astype(jnp.int16),
            jnp.stack([zdc_u, zdc_v], axis=1).reshape(n, 8).astype(jnp.int16),
            jnp.stack(
                [T.zigzag(zac_u)[..., 1:], T.zigzag(zac_v)[..., 1:]], axis=1
            ).reshape(n, 120).astype(jnp.int16),
        ],
        axis=-1,
    ).reshape(R, C, B_SYMBOLS_PER_MB)
    return symbols


def unpack_b_symbols(symbols):
    """(R, C, B_SYMBOLS_PER_MB) int16 -> dict of int32 numpy arrays."""
    import numpy as np

    s = np.asarray(symbols)
    R, C = s.shape[:2]
    return {
        "mv0": s[..., 0:2].astype(np.int32),
        "mv1": s[..., 2:4].astype(np.int32),
        "luma_levels": s[..., 4:260].reshape(R, C, 16, 16).astype(np.int32),
        "cdc_levels": s[..., 260:268].reshape(R, C, 2, 4).astype(np.int32),
        "cac_levels": s[..., 268:].reshape(R, C, 2, 4, 15).astype(np.int32),
    }


def local_pframe_core(cur_y, cur_u, cur_v, ref_y_ext, ref_u_ext, ref_v_ext,
                      qp, qp_c, search_range: int, n_rows: int, n_cols: int):
    """P-frame encode for a tile of `n_rows` MB rows.

    ref_y_ext has `search_range + INTERP_HALO` extra rows above/below;
    ref_[uv]_ext have `search_range // 2 + 2` extra rows. MVs are refined to
    quarter-pel precision (49-candidate window around the full-pel best).
    Returns packed symbols (mv in QUARTER-PEL units), recon planes (uint8)
    and the tile's SAD total.
    """
    R, C = n_rows, n_cols
    n = R * C
    rs = search_range
    halo_c = rs // 2 + 2
    cur = cur_y.reshape(R, 16, C, 16).transpose(0, 2, 1, 3).reshape(n, 16, 16)
    cu = cur_u.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(n, 8, 8)
    cv = cur_v.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(n, 8, 8)

    # Full-pel search uses exactly `rs` halo; the extra INTERP_HALO rows are
    # for sub-pel interpolation reach.
    ref_for_fullpel = ref_y_ext[INTERP_HALO:-INTERP_HALO]
    pad = jnp.pad(ref_for_fullpel, ((0, 0), (rs, rs)), mode="edge")
    if 2 * rs == 16:
        # Gather-free window build: pad is exactly (R+1)x(C+1) 16-blocks, and
        # each 32x32 window is a 2x2 group of adjacent blocks — pure
        # reshape/concat, which XLA maps far better than a general gather.
        blk = pad.reshape(R + 1, 16, (C + 1) * 16)
        rows2 = jnp.concatenate([blk[:-1], blk[1:]], axis=1)  # (R, 32, (C+1)*16)
        t = rows2.reshape(R, 32, C + 1, 16)
        wins = jnp.concatenate([t[:, :, :-1], t[:, :, 1:]], axis=3)  # (R,32,C,32)
        windows = wins.transpose(0, 2, 1, 3).reshape(n, 32, 32)
    else:
        r = jnp.arange(n, dtype=jnp.int32) // C
        c = jnp.arange(n, dtype=jnp.int32) % C
        span = jnp.arange(16 + 2 * rs, dtype=jnp.int32)
        rows = r[:, None] * 16 + span[None, :]
        cols = c[:, None] * 16 + span[None, :]
        windows = pad[rows[:, :, None], cols[:, None, :]]

    mv_full, cost = me_ops.full_search(cur, windows, rs)

    # ---- quarter-pel refinement ----
    pad_i = jnp.pad(ref_y_ext, ((0, 0), (rs + INTERP_HALO, rs + INTERP_HALO)),
                    mode="edge")
    hp_b, hp_h, hp_j = interp_ops.half_pel_planes(pad_i)
    qmv, pred, qcost = refine_subpel(
        cur, pad_i, hp_b, hp_h, hp_j, mv_full, R, C, rs)
    cost = qcost

    pred_u = mc_chroma_ext(ref_u_ext, qmv, R, C, halo_c)
    pred_v = mc_chroma_ext(ref_v_ext, qmv, R, C, halo_c)

    res = _mb_blocks(cur - pred)
    z = T.quant_4x4(T.forward_4x4(res), qp, intra=False)
    recon = jnp.clip(pred + _blocks_mb(T.inverse_4x4(T.dequant_4x4(z, qp))), 0, 255)

    def chroma_code(o_c, pred_c):
        w_c = T.forward_4x4(_mb_blocks8(o_c - pred_c))
        dc2 = w_c[:, :, 0, 0].reshape(-1, 2, 2)
        z2 = T.quant_dc_2x2(T.hadamard_2x2(dc2), qp_c, intra=False)
        d2 = T.dequant_dc_2x2(T.hadamard_2x2(z2), qp_c)
        z_cac = T.quant_4x4(w_c, qp_c, intra=False).at[:, :, 0, 0].set(0)
        d_c = T.dequant_4x4(z_cac, qp_c).at[:, :, 0, 0].set(d2.reshape(-1, 4))
        recon_c = jnp.clip(pred_c + _blocks8_mb(T.inverse_4x4(d_c)), 0, 255)
        return z2.reshape(-1, 4), z_cac, recon_c

    zdc_u, zac_u, rec_u = chroma_code(cu, pred_u)
    zdc_v, zac_v, rec_v = chroma_code(cv, pred_v)

    symbols = jnp.concatenate(
        [
            qmv.astype(jnp.int16),
            T.zigzag(z).reshape(n, 256).astype(jnp.int16),
            jnp.stack([zdc_u, zdc_v], axis=1).reshape(n, 8).astype(jnp.int16),
            jnp.stack(
                [T.zigzag(zac_u)[..., 1:], T.zigzag(zac_v)[..., 1:]], axis=1
            ).reshape(n, 120).astype(jnp.int16),
        ],
        axis=-1,
    ).reshape(R, C, SYMBOLS_PER_MB)

    def plane(x, size):
        return (
            x.reshape(R, C, size, size).transpose(0, 2, 1, 3)
            .reshape(R * size, C * size).astype(jnp.uint8)
        )

    return {
        "symbols": symbols,
        "recon_y": plane(recon, 16),
        "recon_u": plane(rec_u, 8),
        "recon_v": plane(rec_v, 8),
        "sad_total": jnp.sum(cost),
    }


def unpack_symbols_device(symbols):
    """Device-side view of the packed symbol tensor (for the on-device
    entropy packer): returns int32 (mv, luma, cdc, cac) without host I/O."""
    R, C = symbols.shape[:2]
    s = symbols.astype(jnp.int32)
    return (
        s[..., _OFF_MV:_OFF_LUMA],
        s[..., _OFF_LUMA:_OFF_CDC].reshape(R, C, 16, 16),
        s[..., _OFF_CDC:_OFF_CAC].reshape(R, C, 2, 4),
        s[..., _OFF_CAC:].reshape(R, C, 2, 4, 15),
    )


def _mb_context(plane, R, C, pad: int, mb: int, lo: int, S: int):
    """(N, S, S) context windows spanning [-lo, S-lo) around each mb-grid
    origin, built with static slicing only (no gathers). `plane` must be
    padded by `pad` >= lo on every side; bands may read a few px past the
    bottom/right padding, so it is extended (values never selected)."""
    nb = -(-S // mb)  # bands of mb rows; nb*mb >= S
    o = pad - lo  # first context row of block (0, 0)
    extra = max(0, o + mb * nb - 2 * pad)
    p = jnp.pad(plane, ((0, extra), (0, extra)))
    b = [p[o + mb * k : o + mb * k + mb * R] for k in range(nb)]
    rows_nb = jnp.concatenate(
        [x.reshape(R, mb, -1) for x in b], axis=1)  # (R, mb*nb, W')
    rows_s = rows_nb[:, :S]
    t = [rows_s[:, :, o + mb * k : o + mb * k + mb * C].reshape(R, S, C, mb)
         for k in range(nb)]
    cols_nb = jnp.concatenate(t, axis=3)  # (R, S, C, mb*nb)
    return cols_nb[..., :S].transpose(0, 2, 1, 3).reshape(R * C, S, S)


def _extract_win(ctx, dy0, dx0, W: int):
    """Extract per-block (W, W) windows at dynamic offsets (dy0, dx0) in
    [0, S-W] from (N, S, S) contexts via one-hot bf16 matmuls (MXU; exact
    for 8-bit samples) — element gathers serialize on TPU."""
    S = ctx.shape[1]
    i18 = jnp.arange(W, dtype=jnp.int32)
    j36 = jnp.arange(S, dtype=jnp.int32)
    sel_r = (
        (dy0[:, None, None] + i18[None, :, None]) == j36[None, None, :]
    ).astype(jnp.bfloat16)  # (N, W, S)
    sel_c = (
        (dx0[:, None, None] + i18[None, None, :]) == j36[None, :, None]
    ).astype(jnp.bfloat16)  # (N, S, W)
    rowsel = jax.lax.dot_general(
        sel_r, ctx.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N, W, S)
    win = jax.lax.dot_general(
        rowsel.astype(jnp.bfloat16), sel_c,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N, W, W)
    return win.astype(jnp.int32)


def refine_subpel(cur, plane_g, plane_b, plane_h, plane_j, mv_full, R, C,
                  rs: int, lambda_q: int = 1):
    """Quarter-pel refinement: evaluate all 49 (dx, dy) in [-3,3]^2 around the
    full-pel best. Windows are extracted once per plane (structural context
    build + one-hot MXU matmuls); every candidate is then pure static slicing
    (ops/interp.subpel_value).

    Planes are padded by rs + INTERP_HALO on all sides (luma). Returns
    (qmv (N,2) quarter-pel, pred (N,16,16), cost (N,)).
    """
    n = R * C
    pad_off = rs + INTERP_HALO
    # Window row 0 is (mv - 1) relative to the MB origin; the context starts
    # at -(rs + 2), so the in-context offset is mv + rs + 1.
    dy0 = mv_full[:, 1] + rs + 1
    dx0 = mv_full[:, 0] + rs + 1

    def win(plane):
        # uint8 context: samples are 8-bit, so the concat/transpose context
        # build moves 4x less data than int32 (the one-hot extraction casts
        # to bf16 — exact for 8-bit values — either way).
        ctx = _mb_context(plane.astype(jnp.uint8), R, C, pad_off, 16,
                          rs + 2, 2 * rs + 20)
        return _extract_win(ctx, dy0, dx0, 18)

    wg, wb, wh, wj = win(plane_g), win(plane_b), win(plane_h), win(plane_j)

    base_q = 4 * mv_full  # (N, 2)

    # LANE-ALIGNED candidate evaluation: an (N, 18, 18) window pads its
    # 18-wide minor axis to the 128-lane tile (7x wasted bandwidth), so the
    # nine (oy, ox) integer shifts each plane can contribute are materialized
    # ONCE as flattened (N, 256) int16 tensors — 256 = 2x128 lanes, fully
    # dense. Every quarter-pel candidate is then a rounded average of two of
    # these aligned tensors (Table 8-12 via the same (plane, shift) map as
    # interp.subpel_value), and SAD/select run at full VPU width.
    def plane_shifts(w):
        w16 = w.astype(jnp.int16)
        return {(oy, ox): w16[:, oy : oy + 16, ox : ox + 16].reshape(n, 256)
                for oy in range(3) for ox in range(3)}

    shifts = {
        "g": plane_shifts(wg), "b": plane_shifts(wb),
        "h": plane_shifts(wh), "j": plane_shifts(wj),
    }
    # Pin the 36 shift tensors as materialized values: without the barrier
    # XLA rematerializes the (expensive) one-hot window extraction into
    # every candidate's fusion, tripling the refine cost.
    shifts = jax.lax.optimization_barrier(shifts)
    cur_f = cur.astype(jnp.int16).reshape(n, 256)

    # (xf, yf) -> up to two taps of (plane, px, py); mirrors subpel_value.
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

    def pred_flat(dx, dy):
        ox = 1 + (dx >> 2)
        oy = 1 + (dy >> 2)
        taps = TAPS[(dx & 3, dy & 3)]
        vals = [shifts[p][(oy + py, ox + px)] for p, px, py in taps]
        if len(vals) == 1:
            return vals[0]
        return (vals[0] + vals[1] + 1) >> 1  # int16-safe: a+b+1 <= 511

    deltas = [(dx, dy) for dy in range(-3, 4) for dx in range(-3, 4)]
    # Pass 1 — cost of every candidate as one wide data-parallel graph (no
    # best-so-far chain serializing 49 steps).
    costs = []
    for dx, dy in deltas:
        sad = jnp.sum(jnp.abs(pred_flat(dx, dy) - cur_f).astype(jnp.int32),
                      axis=1)
        mv_rate = lambda_q * (
            jnp.abs(base_q[:, 0] + dx) + jnp.abs(base_q[:, 1] + dy)
        )
        costs.append(sad + mv_rate)
    costs = jnp.stack(costs, axis=1)  # (N, 49)
    # argmin's first-minimum rule == the old loop's strict-< update in the
    # same (dy, dx) order, so MV choices (and bitstreams) are unchanged.
    best = jnp.argmin(costs, axis=1).astype(jnp.int32)
    best_cost = jnp.take_along_axis(costs, best[:, None], axis=1)[:, 0]
    d_tab = jnp.asarray(deltas, jnp.int32)  # (49, 2)
    best_d = d_tab[best]
    # Pass 2 — rebuild only the winning prediction: sum_k onehot_k * pred_k
    # (exactly one term is nonzero per MB; XLA fuses the recomputed taps).
    best_pred = jnp.zeros((n, 256), jnp.int16)
    for k, (dx, dy) in enumerate(deltas):
        best_pred = best_pred + jnp.where((best == k)[:, None],
                                          pred_flat(dx, dy), 0)
    best_pred = best_pred.reshape(n, 16, 16).astype(jnp.int32)
    return base_q + best_d, best_pred, best_cost
