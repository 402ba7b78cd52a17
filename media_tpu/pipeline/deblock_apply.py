"""Frame-level deblocking driver: skewed wavefront over MBs (JAX).

MB (r, c) reads and writes into its left/top neighbors, and raster order makes
(r, c) precede (r+1, c-1); the skewed wave index w = 2r + c makes all of
(r, c-1), (r-1, c), (r-1, c+1) earlier waves, so a wave's MBs are independent
(their 20x20 working patches are provably disjoint — peers differ by
(+1, -2) MBs = 32 columns). Each wave gathers patches (MB + 4-sample left/top
strips), runs the four vertical then four horizontal luma edge filters (two
each for chroma) and scatters the patches back.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import deblock as db


def _skew_waves(R: int, C: int):
    n_waves = 2 * (R - 1) + C + 1 if R > 0 else 0
    waves = [[] for _ in range(n_waves)]
    for r in range(R):
        for c in range(C):
            waves[2 * r + c].append((r, c))
    max_w = max(len(w) for w in waves)
    rows = np.full((n_waves, max_w), R, np.int32)
    cols = np.full((n_waves, max_w), C, np.int32)
    mask = np.zeros((n_waves, max_w), bool)
    for k, mbs in enumerate(waves):
        for i, (r, c) in enumerate(mbs):
            rows[k, i] = r
            cols[k, i] = c
            mask[k, i] = True
    return rows, cols, mask


def _edge_param(p, e):
    """Per-edge threshold: scalar passes through; a (lanes, E) array yields
    the (lanes, 1, 1) broadcast slice for edge e (per-MB QP deblocking)."""
    return p if jnp.ndim(p) == 0 else p[:, e, None, None]


def _wave_filters_xla(patch, cu, cv, bsv, tcv, bsh, tch, bscv, tccv, bsch,
                      tcch, alpha, beta, alpha_c, beta_c):
    """XLA twin of ops/deblock_pallas._wave_kernel (same tap-wise math).

    alpha/beta (and chroma twins) are scalars for uniform-QP frames, or
    (lanes, n_edges) arrays carrying the spec 8.7.2 per-edge thresholds
    (qPav-averaged on MB-boundary edges) for per-MB-QP frames."""
    from ..ops.deblock import filter_chroma_taps, filter_luma_taps

    def set_col(a, x, val):
        return a.at[:, 4:20, x : x + 1].set(val)

    def set_row(a, y_, val):
        return a.at[:, y_ : y_ + 1, 4:20].set(val)

    for e in range(4):
        x = 4 + 4 * e
        taps = [patch[:, 4:20, x - 4 + k : x - 3 + k] for k in range(8)]
        out = filter_luma_taps(*taps, bsv[e], _edge_param(alpha, e),
                               _edge_param(beta, e), tcv[e])
        for k, val in enumerate(out):
            patch = set_col(patch, x - 3 + k, val)
    for e in range(4):
        y_ = 4 + 4 * e
        taps = [patch[:, y_ - 4 + k : y_ - 3 + k, 4:20] for k in range(8)]
        out = filter_luma_taps(*taps, bsh[e], _edge_param(alpha, 4 + e),
                               _edge_param(beta, 4 + e), tch[e])
        for k, val in enumerate(out):
            patch = set_row(patch, y_ - 3 + k, val)

    def chroma(cp):
        for e in range(2):
            x = 4 + 4 * e
            p1 = cp[:, 4:12, x - 2 : x - 1]
            p0 = cp[:, 4:12, x - 1 : x]
            q0 = cp[:, 4:12, x : x + 1]
            q1 = cp[:, 4:12, x + 1 : x + 2]
            p0n, q0n = filter_chroma_taps(p1, p0, q0, q1, bscv[e],
                                          _edge_param(alpha_c, e),
                                          _edge_param(beta_c, e), tccv[e])
            cp = cp.at[:, 4:12, x - 1 : x].set(p0n)
            cp = cp.at[:, 4:12, x : x + 1].set(q0n)
        for e in range(2):
            y_ = 4 + 4 * e
            p1 = cp[:, y_ - 2 : y_ - 1, 4:12]
            p0 = cp[:, y_ - 1 : y_, 4:12]
            q0 = cp[:, y_ : y_ + 1, 4:12]
            q1 = cp[:, y_ + 1 : y_ + 2, 4:12]
            p0n, q0n = filter_chroma_taps(p1, p0, q0, q1, bsch[e],
                                          _edge_param(alpha_c, 2 + e),
                                          _edge_param(beta_c, 2 + e), tcch[e])
            cp = cp.at[:, y_ - 1 : y_, 4:12].set(p0n)
            cp = cp.at[:, y_ : y_ + 1, 4:12].set(q0n)
        return cp

    return patch, chroma(cu), chroma(cv)


import functools


@functools.lru_cache(maxsize=16)
def _wave_layout(R: int, C: int, unroll: int = 1):
    """Static wave-major layout for the skew schedule w = 2r + c.

    Lanes within wave k are indexed by r ascending from r0(k). Neighbor MBs
    (left (r,c-1) -> wave k-1, top (r-1,c) -> wave k-2) sit at a lane offset
    that is CONSTANT within each wave (shift in {-1,0,1}), so the whole scan
    runs on contiguous dynamic slices — no per-wave gathers or scatters.
    Two dummy wave slots are prepended so k-1/k-2 never need clamping.

    unroll: pad the wave count to a multiple of this so the scan can process
    `unroll` consecutive waves per step (the padding waves have no valid
    lanes; their writes are masked to identity).
    """
    n_real = 2 * (R - 1) + C if R > 0 else 0
    n_waves = -(-n_real // unroll) * unroll if n_real else 0
    r0 = np.zeros(n_waves, np.int32)
    ln = np.zeros(n_waves, np.int32)
    for k in range(n_real):
        lo = max(0, -(-(k - C + 1) // 2))  # ceil((k-C+1)/2)
        hi = min(R - 1, k // 2)
        r0[k] = lo
        ln[k] = max(0, hi - lo + 1)
    maxw = int(ln.max()) if n_waves else 1
    LW = maxw + 2  # 1 margin lane each side for the +-1 neighbor shifts

    valid = np.zeros((n_waves + 2, LW), bool)
    # raster (r,c) -> flat wave-major index ((k+2) * LW + 1 + lane)
    perm_from = np.zeros(R * C, np.int64)
    # wave-major lane -> flat raster index (sentinel R*C for padding)
    perm_to = np.full((n_waves + 2) * LW, R * C, np.int64)
    for k in range(n_real):
        for i in range(ln[k]):
            r = r0[k] + i
            c = k - 2 * r
            valid[k + 2, 1 + i] = True
            perm_from[r * C + c] = (k + 2) * LW + 1 + i
            perm_to[(k + 2) * LW + 1 + i] = r * C + c
    # neighbor lane shifts per wave (left: same r in wave k-1; top: r-1 in k-2)
    s_left = np.zeros(n_waves, np.int32)
    s_top = np.zeros(n_waves, np.int32)
    for k in range(n_real):
        s_left[k] = r0[k] - (r0[k - 1] if k >= 1 else 0)
        s_top[k] = r0[k] - 1 - (r0[k - 2] if k >= 2 else 0)
    s_left = np.clip(s_left, -1, 1)
    s_top = np.clip(s_top, -1, 1)
    return {
        "n_waves": n_waves, "LW": LW, "maxw": maxw, "valid": valid,
        "perm_from": perm_from, "perm_to": perm_to,
        "s_left": s_left, "s_top": s_top,
    }


def _to_wave(flat, perm_to, n_slots):
    """(R*C, D) -> (n_slots, D) row-take with zero fill for padding lanes."""
    src = jnp.concatenate([flat, jnp.zeros((1,) + flat.shape[1:], flat.dtype)])
    return jnp.take(src, jnp.asarray(perm_to), axis=0)


def _qp_lut(qp_idx, cols):
    """Vectorized threshold-table lookup via one-hot bf16 MXU matmul
    (element gathers serialize on TPU). qp_idx: int array; cols: (52, K)
    int table, values < 256 (exact in bf16). Returns (..., K) int32."""
    flat = jnp.clip(qp_idx, 0, 51).reshape(-1)
    onehot = (flat[:, None] == jnp.arange(52, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
    vals = jnp.dot(onehot, jnp.asarray(cols).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return vals.astype(jnp.int32).reshape(qp_idx.shape + (cols.shape[1],))


def _deblock_frame_wavemajor(y, u, v, qp, qp_c, bs_v, bs_h, R: int, C: int,
                             qp_map=None):
    """Wave-major deblocking: one shear in, contiguous-slice scan, one shear
    out. Bit-identical to the gather/scatter formulation (tests).

    qp_map: optional (R, C) per-MB luma QP. When given, thresholds follow
    spec 8.7.2: each MB-boundary edge uses qPav = (QPp + QPq + 1) >> 1 of
    the two adjoining MBs (chroma averages the per-MB QPc values), internal
    edges use the MB's own QP; qp/qp_c are ignored."""
    # Scan-step unroll: process UNROLL consecutive waves per lax.scan step.
    # The wave math is unchanged (sub-waves stay sequential inside the body);
    # this trades 2R+C tiny scan steps — whose per-step dispatch dominates —
    # for (2R+C)/UNROLL fatter ones XLA can fuse across.
    import os as _os

    UNROLL = int(_os.environ.get("MEDIA_TPU_DEBLOCK_UNROLL", "8"))
    lay = _wave_layout(R, C, UNROLL)
    n_waves, LW, maxw = lay["n_waves"], lay["LW"], lay["maxw"]
    n_slots = (n_waves + 2) * LW
    per_mb = qp_map is not None

    def tc0_sel(bs, row):
        return jnp.where(bs == 1, row[0],
                         jnp.where(bs == 2, row[1],
                                   jnp.where(bs == 3, row[2], 0)))

    def tc0_sel_rows(bs, rows):
        # bs: (n, E, B); rows: (n, E, 3) per-edge tc0 triplets.
        return jnp.where(bs == 1, rows[..., 0:1],
                         jnp.where(bs == 2, rows[..., 1:2],
                                   jnp.where(bs == 3, rows[..., 2:3], 0)))

    # ---- frame-level bS / tc0 per MB (pure reshapes of the edge grids) ----
    bs_v = jnp.asarray(bs_v, jnp.int32)
    bs_h = jnp.asarray(bs_h, jnp.int32)
    # [r, c, e, b] = bs at vertical edge e, block-row b of MB (r, c)
    bsv_mb = bs_v.reshape(R, 4, C, 4).transpose(0, 2, 3, 1).reshape(R * C, 4, 4)
    bsh_mb = bs_h.reshape(R, 4, C, 4).transpose(0, 2, 1, 3).reshape(R * C, 4, 4)
    if per_mb:
        tbl = np.stack([np.asarray(db.ALPHA_TABLE), np.asarray(db.BETA_TABLE),
                        np.asarray(db.TC0_TABLE)[:, 0],
                        np.asarray(db.TC0_TABLE)[:, 1],
                        np.asarray(db.TC0_TABLE)[:, 2]], axis=1)  # (52, 5)
        from ..ops.transform import CHROMA_QP_TABLE

        qpm = jnp.asarray(qp_map, jnp.int32).reshape(R, C)
        qpc_m = _qp_lut(qpm, np.asarray(CHROMA_QP_TABLE)[:, None])[..., 0]

        def edge_qps(m):
            left = jnp.concatenate([m[:, :1], m[:, :-1]], axis=1)
            top = jnp.concatenate([m[:1, :], m[:-1, :]], axis=0)
            return (left + m + 1) >> 1, (top + m + 1) >> 1

        avl, avt = edge_qps(qpm)
        avl_c, avt_c = edge_qps(qpc_m)
        # luma per-edge QP, layout (R, C, 8): v edges 0-3 then h edges 0-3
        qp_e = jnp.stack([avl, qpm, qpm, qpm, avt, qpm, qpm, qpm], axis=-1)
        # chroma per-edge QPc, layout (R, C, 4): cv0, cv1, ch0, ch1
        qp_ce = jnp.stack([avl_c, qpc_m, avt_c, qpc_m], axis=-1)
        lut = _qp_lut(qp_e, tbl).reshape(R * C, 8, 5)
        lut_c = _qp_lut(qp_ce, tbl).reshape(R * C, 4, 5)
        ab_l = lut[:, :, 0:2]    # (n, 8, [alpha, beta])
        ab_c = lut_c[:, :, 0:2]  # (n, 4, [alpha, beta])
        tcv_mb = tc0_sel_rows(bsv_mb, lut[:, 0:4, 2:5])
        tch_mb = tc0_sel_rows(bsh_mb, lut[:, 4:8, 2:5])
        tccv_mb = tc0_sel_rows(bsv_mb[:, (0, 2), :], lut_c[:, 0:2, 2:5])
        tcch_mb = tc0_sel_rows(bsh_mb[:, (0, 2), :], lut_c[:, 2:4, 2:5])
        alpha = beta = alpha_c = beta_c = None  # carried per-MB in meta
    else:
        alpha = jnp.asarray(db.ALPHA_TABLE)[jnp.clip(qp, 0, 51)]
        beta = jnp.asarray(db.BETA_TABLE)[jnp.clip(qp, 0, 51)]
        tc0_row = jnp.asarray(db.TC0_TABLE)[jnp.clip(qp, 0, 51)]
        alpha_c = jnp.asarray(db.ALPHA_TABLE)[jnp.clip(qp_c, 0, 51)]
        beta_c = jnp.asarray(db.BETA_TABLE)[jnp.clip(qp_c, 0, 51)]
        tc0_row_c = jnp.asarray(db.TC0_TABLE)[jnp.clip(qp_c, 0, 51)]
        tcv_mb = tc0_sel(bsv_mb, tc0_row)
        tch_mb = tc0_sel(bsh_mb, tc0_row)
        tccv_mb = tc0_sel(bsv_mb[:, (0, 2), :], tc0_row_c)  # chroma: edges 0,2
        tcch_mb = tc0_sel(bsh_mb[:, (0, 2), :], tc0_row_c)

    # ---- shear everything to wave-major (row-takes, no element gathers) ----
    yb = jnp.asarray(y, jnp.int32).reshape(R, 16, C, 16).transpose(0, 2, 1, 3)
    ub = jnp.asarray(u, jnp.int32).reshape(R, 8, C, 8).transpose(0, 2, 1, 3)
    vb = jnp.asarray(v, jnp.int32).reshape(R, 8, C, 8).transpose(0, 2, 1, 3)
    Yw = _to_wave(yb.reshape(R * C, 256), lay["perm_to"], n_slots)
    Uw = _to_wave(ub.reshape(R * C, 64), lay["perm_to"], n_slots)
    Vw = _to_wave(vb.reshape(R * C, 64), lay["perm_to"], n_slots)
    Yw = Yw.reshape(n_waves + 2, LW, 16, 16)
    Uw = Uw.reshape(n_waves + 2, LW, 8, 8)
    Vw = Vw.reshape(n_waves + 2, LW, 8, 8)
    meta_parts = [
        bsv_mb.reshape(R * C, 16), bsh_mb.reshape(R * C, 16),
        tcv_mb.reshape(R * C, 16), tch_mb.reshape(R * C, 16),
        bsv_mb[:, (0, 2), :].reshape(R * C, 8),
        bsh_mb[:, (0, 2), :].reshape(R * C, 8),
        tccv_mb.reshape(R * C, 8), tcch_mb.reshape(R * C, 8),
    ]

    import os as _os

    if _os.environ.get("MEDIA_TPU_DEBLOCK_KERNEL") == "wavepallas":
        # Single-launch Pallas wavefront: per-edge alpha/beta always ride
        # in meta (uniform-QP frames broadcast the scalars) plus a validity
        # column; padding slots shear in as all-zero -> invalid.
        from ..ops.deblock_wave_pallas import (
            MW_PALLAS, deblock_wavemajor_pallas)

        if per_mb:
            ab16 = ab_l.reshape(R * C, 16)
            abc8 = ab_c.reshape(R * C, 8)
        else:
            ab2 = jnp.stack([alpha, beta]).astype(jnp.int32)
            ab16 = jnp.broadcast_to(ab2[None, None, :],
                                    (R * C, 8, 2)).reshape(R * C, 16)
            abc2 = jnp.stack([alpha_c, beta_c]).astype(jnp.int32)
            abc8 = jnp.broadcast_to(abc2[None, None, :],
                                    (R * C, 4, 2)).reshape(R * C, 8)
        ones = jnp.ones((R * C, 1), jnp.int32)
        meta_pal = jnp.concatenate(meta_parts + [ab16, abc8, ones], axis=1)
        Mw_p = _to_wave(meta_pal, lay["perm_to"], n_slots).reshape(
            n_waves + 2, LW, MW_PALLAS)
        Yw, Uw, Vw = deblock_wavemajor_pallas(
            Yw, Uw, Vw, Mw_p,
            jnp.asarray(lay["s_left"]), jnp.asarray(lay["s_top"]),
            jax.default_backend() == "cpu")
        pf = jnp.asarray(lay["perm_from"])
        yo = jnp.take(Yw.reshape(n_slots, 256), pf, axis=0).reshape(
            R, C, 16, 16)
        uo = jnp.take(Uw.reshape(n_slots, 64), pf, axis=0).reshape(
            R, C, 8, 8)
        vo = jnp.take(Vw.reshape(n_slots, 64), pf, axis=0).reshape(
            R, C, 8, 8)
        return (
            yo.transpose(0, 2, 1, 3).reshape(R * 16, C * 16),
            uo.transpose(0, 2, 1, 3).reshape(R * 8, C * 8),
            vo.transpose(0, 2, 1, 3).reshape(R * 8, C * 8),
        )

    if per_mb:
        # Per-edge alpha/beta thresholds ride in the meta tensor too:
        # luma (8 edges x 2), chroma (4 edges x 2) -> 24 extra columns.
        meta_parts += [ab_l.reshape(R * C, 16), ab_c.reshape(R * C, 8)]
    MW = 120 if per_mb else 96
    meta = jnp.concatenate(meta_parts, axis=1)
    Mw = _to_wave(meta, lay["perm_to"], n_slots).reshape(n_waves + 2, LW, MW)

    valid_w = jnp.asarray(lay["valid"])
    s_left_a = jnp.asarray(lay["s_left"])
    s_top_a = jnp.asarray(lay["s_top"])

    def step(carry, k):
        Yw, Uw, Vw = carry
        K = k + 2
        s_l = jax.lax.dynamic_index_in_dim(s_left_a, k, keepdims=False)
        s_t = jax.lax.dynamic_index_in_dim(s_top_a, k, keepdims=False)
        zero = jnp.int32(0)

        own = jax.lax.dynamic_slice(Yw, (K, 1, zero, zero), (1, maxw, 16, 16))[0]
        left = jax.lax.dynamic_slice(
            Yw, (K - 1, 1 + s_l, zero, zero), (1, maxw, 16, 16))[0]
        top = jax.lax.dynamic_slice(
            Yw, (K - 2, 1 + s_t, zero, zero), (1, maxw, 16, 16))[0]
        own_u = jax.lax.dynamic_slice(Uw, (K, 1, zero, zero), (1, maxw, 8, 8))[0]
        left_u = jax.lax.dynamic_slice(
            Uw, (K - 1, 1 + s_l, zero, zero), (1, maxw, 8, 8))[0]
        top_u = jax.lax.dynamic_slice(
            Uw, (K - 2, 1 + s_t, zero, zero), (1, maxw, 8, 8))[0]
        own_v = jax.lax.dynamic_slice(Vw, (K, 1, zero, zero), (1, maxw, 8, 8))[0]
        left_v = jax.lax.dynamic_slice(
            Vw, (K - 1, 1 + s_l, zero, zero), (1, maxw, 8, 8))[0]
        top_v = jax.lax.dynamic_slice(
            Vw, (K - 2, 1 + s_t, zero, zero), (1, maxw, 8, 8))[0]
        m = jax.lax.dynamic_slice(Mw, (K, 1, zero), (1, maxw, MW))[0]
        vmask = jax.lax.dynamic_slice(valid_w, (K, 1), (1, maxw))[0]

        bsv_mb_w = m[:, 0:16].reshape(maxw, 4, 4)
        bsh_mb_w = m[:, 16:32].reshape(maxw, 4, 4)
        tcv_mb_w = m[:, 32:48].reshape(maxw, 4, 4)
        tch_mb_w = m[:, 48:64].reshape(maxw, 4, 4)
        bscv_mb = m[:, 64:72].reshape(maxw, 2, 4)
        bsch_mb = m[:, 72:80].reshape(maxw, 2, 4)
        tccv_mb = m[:, 80:88].reshape(maxw, 2, 4)
        tcch_mb = m[:, 88:96].reshape(maxw, 2, 4)
        if per_mb:
            ab = m[:, 96:112].reshape(maxw, 8, 2)
            abc = m[:, 112:120].reshape(maxw, 4, 2)
            alpha_w, beta_w = ab[:, :, 0], ab[:, :, 1]       # (lanes, 8)
            alpha_cw, beta_cw = abc[:, :, 0], abc[:, :, 1]   # (lanes, 4)
        else:
            alpha_w, beta_w = alpha, beta
            alpha_cw, beta_cw = alpha_c, beta_c

        # Expand to the per-edge lane shapes the filters expect.
        bsv16 = jnp.repeat(bsv_mb_w, 4, axis=2).transpose(1, 0, 2)[..., None]
        bsh16 = jnp.repeat(bsh_mb_w, 4, axis=2).transpose(1, 0, 2)[:, :, None, :]
        tcv16 = jnp.repeat(tcv_mb_w, 4, axis=2).transpose(1, 0, 2)[..., None]
        tch16 = jnp.repeat(tch_mb_w, 4, axis=2).transpose(1, 0, 2)[:, :, None, :]
        bscv = jnp.repeat(bscv_mb, 2, axis=2).transpose(1, 0, 2)[..., None]
        bsch = jnp.repeat(bsch_mb, 2, axis=2).transpose(1, 0, 2)[:, :, None, :]
        tccv = jnp.repeat(tccv_mb, 2, axis=2).transpose(1, 0, 2)[..., None]
        tcch = jnp.repeat(tcch_mb, 2, axis=2).transpose(1, 0, 2)[:, :, None, :]

        # 20x20 patch: [zeros, top-4-rows; left-4-cols, own] (corner unused).
        patch = jnp.concatenate([
            jnp.concatenate(
                [jnp.zeros((maxw, 4, 4), jnp.int32), top[:, 12:16, :]], axis=2),
            jnp.concatenate([left[:, :, 12:16], own], axis=2),
        ], axis=1)
        upatch = jnp.concatenate([
            jnp.concatenate(
                [jnp.zeros((maxw, 4, 4), jnp.int32), top_u[:, 4:8, :]], axis=2),
            jnp.concatenate([left_u[:, :, 4:8], own_u], axis=2),
        ], axis=1)
        vpatch = jnp.concatenate([
            jnp.concatenate(
                [jnp.zeros((maxw, 4, 4), jnp.int32), top_v[:, 4:8, :]], axis=2),
            jnp.concatenate([left_v[:, :, 4:8], own_v], axis=2),
        ], axis=1)

        patch_f, up_f, vp_f = _wave_filters_xla(
            patch, upatch, vpatch, bsv16, tcv16, bsh16, tch16,
            bscv, tccv, bsch, tcch, alpha_w, beta_w, alpha_cw, beta_cw)

        m3 = vmask[:, None, None]

        def put(arr, val, pos):
            return jax.lax.dynamic_update_slice(arr, val[None], pos)

        Yw = put(Yw, jnp.where(m3, patch_f[:, 0:4, 4:20], top[:, 12:16, :]),
                 (K - 2, 1 + s_t, jnp.int32(12), zero))
        Yw = put(Yw, jnp.where(m3, patch_f[:, 4:20, 0:4], left[:, :, 12:16]),
                 (K - 1, 1 + s_l, zero, jnp.int32(12)))
        Yw = put(Yw, jnp.where(m3, patch_f[:, 4:20, 4:20], own), (K, 1, zero, zero))
        Uw = put(Uw, jnp.where(m3, up_f[:, 0:4, 4:12], top_u[:, 4:8, :]),
                 (K - 2, 1 + s_t, jnp.int32(4), zero))
        Uw = put(Uw, jnp.where(m3, up_f[:, 4:12, 0:4], left_u[:, :, 4:8]),
                 (K - 1, 1 + s_l, zero, jnp.int32(4)))
        Uw = put(Uw, jnp.where(m3, up_f[:, 4:12, 4:12], own_u), (K, 1, zero, zero))
        Vw = put(Vw, jnp.where(m3, vp_f[:, 0:4, 4:12], top_v[:, 4:8, :]),
                 (K - 2, 1 + s_t, jnp.int32(4), zero))
        Vw = put(Vw, jnp.where(m3, vp_f[:, 4:12, 0:4], left_v[:, :, 4:8]),
                 (K - 1, 1 + s_l, zero, jnp.int32(4)))
        Vw = put(Vw, jnp.where(m3, vp_f[:, 4:12, 4:12], own_v), (K, 1, zero, zero))
        return (Yw, Uw, Vw), None

    def step_unrolled(carry, kbase):
        for j in range(UNROLL):
            carry, _ = step(carry, kbase * UNROLL + j)
        return carry, None

    (Yw, Uw, Vw), _ = jax.lax.scan(
        step_unrolled, (Yw, Uw, Vw),
        jnp.arange(n_waves // UNROLL, dtype=jnp.int32))

    # ---- unshear ----
    pf = jnp.asarray(lay["perm_from"])
    yo = jnp.take(Yw.reshape(n_slots, 256), pf, axis=0).reshape(R, C, 16, 16)
    uo = jnp.take(Uw.reshape(n_slots, 64), pf, axis=0).reshape(R, C, 8, 8)
    vo = jnp.take(Vw.reshape(n_slots, 64), pf, axis=0).reshape(R, C, 8, 8)
    return (
        yo.transpose(0, 2, 1, 3).reshape(R * 16, C * 16),
        uo.transpose(0, 2, 1, 3).reshape(R * 8, C * 8),
        vo.transpose(0, 2, 1, 3).reshape(R * 8, C * 8),
    )


def deblock_frame(y, u, v, qp, qp_c, bs_v, bs_h, R: int, C: int, qp_map=None):
    """Deblock one frame in-place-semantics: returns filtered (y, u, v).

    y: (16R, 16C) int32; u/v: (8R, 8C); qp/qp_c: scalars (traced ok);
    bs_v/bs_h: (4R, 4C) strengths (vertical edge left of / horizontal edge
    above each 4x4 luma block; frame borders 0). qp_map: optional (R, C)
    per-MB luma QP (spec 8.7.2 per-edge qPav thresholds; qp/qp_c ignored).

    Default implementation is the wave-major shear (contiguous slices only);
    MEDIA_TPU_DEBLOCK_KERNEL selects the legacy gather/scatter formulation
    ("xla") or the Pallas wave kernel ("pallas") for cross-checking.
    """
    import os

    if os.environ.get("MEDIA_TPU_DEBLOCK_KERNEL", "wavemajor") == "wavemajor":
        return _deblock_frame_wavemajor(y, u, v, qp, qp_c, bs_v, bs_h, R, C,
                                        qp_map=qp_map)
    if qp_map is not None:
        raise NotImplementedError("per-MB QP deblocking requires the "
                                  "wave-major kernel")
    return _deblock_frame_gather(y, u, v, qp, qp_c, bs_v, bs_h, R, C)


def _deblock_frame_gather(y, u, v, qp, qp_c, bs_v, bs_h, R: int, C: int):
    """Legacy formulation: per-wave patch gathers + element scatters."""
    rows_t, cols_t, mask_t = _skew_waves(R, C)
    rows_t, cols_t, mask_t = map(jnp.asarray, (rows_t, cols_t, mask_t))
    n_waves, max_w = rows_t.shape

    alpha = jnp.asarray(db.ALPHA_TABLE)[jnp.clip(qp, 0, 51)]
    beta = jnp.asarray(db.BETA_TABLE)[jnp.clip(qp, 0, 51)]
    tc0_row = jnp.asarray(db.TC0_TABLE)[jnp.clip(qp, 0, 51)]  # (3,)
    alpha_c = jnp.asarray(db.ALPHA_TABLE)[jnp.clip(qp_c, 0, 51)]
    beta_c = jnp.asarray(db.BETA_TABLE)[jnp.clip(qp_c, 0, 51)]
    tc0_row_c = jnp.asarray(db.TC0_TABLE)[jnp.clip(qp_c, 0, 51)]

    def tc0_of(bs, row):
        return jnp.where(bs >= 4, 0, row[jnp.clip(bs - 1, 0, 2)])

    # Pad 4 left/top so edge-of-frame patches exist; pad never read usefully
    # because border bS == 0.
    yp = jnp.pad(jnp.asarray(y, jnp.int32), ((4, 0), (4, 0)))
    up = jnp.pad(jnp.asarray(u, jnp.int32), ((4, 0), (4, 0)))
    vp = jnp.pad(jnp.asarray(v, jnp.int32), ((4, 0), (4, 0)))
    bs_v = jnp.asarray(bs_v, jnp.int32)
    bs_h = jnp.asarray(bs_h, jnp.int32)

    span20 = jnp.arange(20)
    span12 = jnp.arange(12)
    span4 = jnp.arange(4)

    import os

    backend = os.environ.get("MEDIA_TPU_DEBLOCK_KERNEL", "xla")
    on_cpu = jax.default_backend() == "cpu"
    # The Pallas wave kernel compiles and is bit-exact on the real chip, but
    # per-wave dispatch through the remote-execution tunnel is far slower
    # than the XLA formulation, and interpret mode is slow on CPU — so XLA
    # is the default everywhere; set MEDIA_TPU_DEBLOCK_KERNEL=pallas to
    # opt in (tests pin the kernel's bit-exactness explicitly).
    use_pallas = backend == "pallas"
    interpret = on_cpu
    params = jnp.stack([alpha, beta, alpha_c, beta_c]).astype(jnp.int32)

    def tc0_sel(bs, row):
        return jnp.where(bs == 1, row[0],
                         jnp.where(bs == 2, row[1],
                                   jnp.where(bs == 3, row[2], 0)))

    from ..ops.deblock_pallas import deblock_wave_pallas

    def wave_step(planes, k):
        yp, up, vp = planes
        r = jax.lax.dynamic_index_in_dim(rows_t, k, keepdims=False)
        c = jax.lax.dynamic_index_in_dim(cols_t, k, keepdims=False)
        valid = jax.lax.dynamic_index_in_dim(mask_t, k, keepdims=False)
        # Invalid lanes point out of bounds: their scatters are dropped
        # (otherwise they would duplicate MB (0,0)'s indices and clobber it).
        rr = jnp.where(valid, r, R + 1)
        cc = jnp.where(valid, c, C + 1)
        mask3 = valid[:, None, None]

        # Gather patches.
        py = rr[:, None] * 16 + span20[None, :]
        px = cc[:, None] * 16 + span20[None, :]
        patch = yp[py[:, :, None], px[:, None, :]]
        cy = rr[:, None] * 8 + span12[None, :]
        cx = cc[:, None] * 8 + span12[None, :]
        upatch = up[cy[:, :, None], cx[:, None, :]]
        vpatch = vp[cy[:, :, None], cx[:, None, :]]

        # Per-edge strengths/tc0, edge index leading (Mosaic-friendly).
        brow = jnp.clip(rr[:, None] * 4 + span4[None, :], 0, R * 4 - 1)  # (N,4)
        bcol = jnp.clip(cc[:, None] * 4 + span4[None, :], 0, C * 4 - 1)
        ecol = jnp.clip(cc[:, None, None] * 4 + span4[None, :, None], 0, C * 4 - 1)
        erow = jnp.clip(rr[:, None, None] * 4 + span4[None, :, None], 0, R * 4 - 1)
        bsv_mb = jnp.where(mask3, bs_v[brow[:, None, :], ecol], 0)  # (N,4e,4blk)
        bsh_mb = jnp.where(mask3, bs_h[erow, bcol[:, None, :]], 0)

        bsv16 = jnp.repeat(bsv_mb, 4, axis=2).transpose(1, 0, 2)[..., None]
        bsh16 = jnp.repeat(bsh_mb, 4, axis=2).transpose(1, 0, 2)[:, :, None, :]
        tcv16 = tc0_sel(bsv16, tc0_row)
        tch16 = tc0_sel(bsh16, tc0_row)
        # Chroma edges use luma edges 0 and 2; 8 lanes map to blocks by /2.
        bscv = jnp.repeat(bsv_mb[:, (0, 2), :], 2, axis=2).transpose(1, 0, 2)[..., None]
        bsch = jnp.repeat(bsh_mb[:, (0, 2), :], 2, axis=2).transpose(1, 0, 2)[:, :, None, :]
        tccv = tc0_sel(bscv, tc0_row_c)
        tcch = tc0_sel(bsch, tc0_row_c)

        if use_pallas:
            patch_f, up_f, vp_f = deblock_wave_pallas(
                params, bsv16, tcv16, bsh16, tch16, bscv, tccv, bsch, tcch,
                patch, upatch, vpatch, interpret)
        else:
            patch_f, up_f, vp_f = _wave_filters_xla(
                patch, upatch, vpatch, bsv16, tcv16, bsh16, tch16,
                bscv, tccv, bsch, tcch, alpha, beta, alpha_c, beta_c)

        yp = yp.at[py[:, :, None], px[:, None, :]].set(
            jnp.where(mask3, patch_f, patch), mode="drop")
        up = up.at[cy[:, :, None], cx[:, None, :]].set(
            jnp.where(mask3, up_f, upatch), mode="drop")
        vp = vp.at[cy[:, :, None], cx[:, None, :]].set(
            jnp.where(mask3, vp_f, vpatch), mode="drop")
        return (yp, up, vp), None

    (yp, up, vp), _ = jax.lax.scan(wave_step, (yp, up, vp), jnp.arange(n_waves))
    return yp[4:, 4:], up[4:, 4:], vp[4:, 4:]


def _zero_slice_boundaries(bs_h, slice_starts):
    """disable_deblocking_filter_idc == 2: no filtering across slice
    boundaries — the horizontal edges at each interior slice-start MB row
    get bS 0 (the frame border row already is)."""
    for r0 in slice_starts:
        if r0 > 0:
            bs_h = bs_h.at[4 * r0, :].set(0)
    return bs_h


def deblock_pframe_from_symbols(recon_y, recon_u, recon_v, symbols, qp, qp_c,
                                R: int, C: int, slice_starts: tuple = (),
                                qp_map=None):
    """Apply inter deblocking given the packed symbol tensor (device-side)."""
    from ..ops.deblock import inter_bs_grids
    from .pframe_core import unpack_symbols_device

    mv, luma, _cdc, _cac = unpack_symbols_device(symbols)
    blk_nnz = jnp.sum(luma != 0, axis=3)  # (R, C, 16) raster blocks
    nnz_grid = (
        blk_nnz.reshape(R, C, 4, 4).transpose(0, 2, 1, 3).reshape(R * 4, C * 4)
    )
    bs_v, bs_h = inter_bs_grids(nnz_grid, mv, R, C)
    bs_h = _zero_slice_boundaries(bs_h, slice_starts)
    y, u, v = deblock_frame(recon_y, recon_u, recon_v, qp, qp_c, bs_v, bs_h,
                            R, C, qp_map=qp_map)
    return (
        jnp.clip(y, 0, 255).astype(jnp.uint8),
        jnp.clip(u, 0, 255).astype(jnp.uint8),
        jnp.clip(v, 0, 255).astype(jnp.uint8),
    )


def deblock_iframe(recon_y, recon_u, recon_v, qp, qp_c, R: int, C: int,
                   slice_starts: tuple = ()):
    from ..ops.deblock import intra_bs_grids

    bs_v, bs_h = intra_bs_grids(R, C)
    bs_h = _zero_slice_boundaries(bs_h, slice_starts)
    y, u, v = deblock_frame(recon_y, recon_u, recon_v, qp, qp_c, bs_v, bs_h, R, C)
    return (
        jnp.clip(y, 0, 255).astype(jnp.uint8),
        jnp.clip(u, 0, 255).astype(jnp.uint8),
        jnp.clip(v, 0, 255).astype(jnp.uint8),
    )
