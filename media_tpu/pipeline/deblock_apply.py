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


def deblock_frame(y, u, v, qp, qp_c, bs_v, bs_h, R: int, C: int):
    """Deblock one frame in-place-semantics: returns filtered (y, u, v).

    y: (16R, 16C) int32; u/v: (8R, 8C); qp/qp_c: scalars (traced ok);
    bs_v/bs_h: (4R, 4C) strengths (vertical edge left of / horizontal edge
    above each 4x4 luma block; frame borders 0).
    """
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

    def wave_step(planes, k):
        yp, up, vp = planes
        r = jax.lax.dynamic_index_in_dim(rows_t, k, keepdims=False)
        c = jax.lax.dynamic_index_in_dim(cols_t, k, keepdims=False)
        valid = jax.lax.dynamic_index_in_dim(mask_t, k, keepdims=False)
        # Invalid lanes point out of bounds: their scatters are dropped
        # (otherwise they would duplicate MB (0,0)'s indices and clobber it).
        rr = jnp.where(valid, r, R + 1)
        cc = jnp.where(valid, c, C + 1)

        # ---- luma patch (N, 20, 20): origin (16r - 4, 16c - 4) in frame =
        # (16r, 16c) in padded coords.
        py = rr[:, None] * 16 + span20[None, :]
        px = cc[:, None] * 16 + span20[None, :]
        patch = yp[py[:, :, None], px[:, None, :]]

        # per-edge bS rows: block row indices of this MB
        brow = rr[:, None] * 4 + span4[None, :]  # (N,4)

        for e in range(4):
            x = 4 + 4 * e
            bcol = cc * 4 + e
            bs = bs_v[brow, bcol[:, None]]  # (N, 4)
            bs16 = jnp.repeat(bs, 4, axis=1)  # (N, 16)
            p = patch[:, 4:20, x - 4 : x]
            q = patch[:, 4:20, x : x + 4]
            pn, qn = db.filter_edge_luma(p, q, bs16, alpha, beta,
                                         tc0_of(bs16, tc0_row))
            patch = patch.at[:, 4:20, x - 4 : x].set(pn)
            patch = patch.at[:, 4:20, x : x + 4].set(qn)
        for e in range(4):
            yy = 4 + 4 * e
            brow_e = rr * 4 + e
            bcol4 = cc[:, None] * 4 + span4[None, :]
            bs = bs_h[brow_e[:, None], bcol4]  # (N, 4)
            bs16 = jnp.repeat(bs, 4, axis=1)
            p = patch[:, yy - 4 : yy, 4:20].swapaxes(1, 2)  # (N, 16, 4)
            q = patch[:, yy : yy + 4, 4:20].swapaxes(1, 2)
            pn, qn = db.filter_edge_luma(p, q, bs16, alpha, beta,
                                         tc0_of(bs16, tc0_row))
            patch = patch.at[:, yy - 4 : yy, 4:20].set(pn.swapaxes(1, 2))
            patch = patch.at[:, yy : yy + 4, 4:20].set(qn.swapaxes(1, 2))

        mask3 = valid[:, None, None]
        old = yp[py[:, :, None], px[:, None, :]]
        yp = yp.at[py[:, :, None], px[:, None, :]].set(
            jnp.where(mask3, patch, old), mode="drop"
        )

        # ---- chroma patches (N, 12, 12): origin (8r - 4, 8c - 4).
        def chroma_pass(plane):
            cy = rr[:, None] * 8 + span12[None, :]
            cx = cc[:, None] * 8 + span12[None, :]
            cpatch = plane[cy[:, :, None], cx[:, None, :]]
            for e in range(2):
                x = 4 + 4 * e
                bcol = cc * 4 + 2 * e
                # chroma lane j (0..7) maps to luma block row 4r + j//2
                lane_block = rr[:, None] * 4 + (jnp.arange(8) // 2)[None, :]
                bs8 = bs_v[lane_block, bcol[:, None]]  # (N, 8)
                p = cpatch[:, 4:12, x - 2 : x]
                q = cpatch[:, 4:12, x : x + 2]
                pn, qn = db.filter_edge_chroma(p, q, bs8, alpha_c, beta_c,
                                               tc0_of(bs8, tc0_row_c))
                cpatch = cpatch.at[:, 4:12, x - 2 : x].set(pn)
                cpatch = cpatch.at[:, 4:12, x : x + 2].set(qn)
            for e in range(2):
                yy = 4 + 4 * e
                brow_e = rr * 4 + 2 * e
                lane_block = cc[:, None] * 4 + (jnp.arange(8) // 2)[None, :]
                bs8 = bs_h[brow_e[:, None], lane_block]
                p = cpatch[:, yy - 2 : yy, 4:12].swapaxes(1, 2)
                q = cpatch[:, yy : yy + 2, 4:12].swapaxes(1, 2)
                pn, qn = db.filter_edge_chroma(p, q, bs8, alpha_c, beta_c,
                                               tc0_of(bs8, tc0_row_c))
                cpatch = cpatch.at[:, yy - 2 : yy, 4:12].set(pn.swapaxes(1, 2))
                cpatch = cpatch.at[:, yy : yy + 2, 4:12].set(qn.swapaxes(1, 2))
            old_c = plane[cy[:, :, None], cx[:, None, :]]
            return plane.at[cy[:, :, None], cx[:, None, :]].set(
                jnp.where(mask3, cpatch, old_c), mode="drop"
            )

        up = chroma_pass(up)
        vp = chroma_pass(vp)
        return (yp, up, vp), None

    (yp, up, vp), _ = jax.lax.scan(wave_step, (yp, up, vp), jnp.arange(n_waves))
    return yp[4:, 4:], up[4:, 4:], vp[4:, 4:]


def deblock_pframe_from_symbols(recon_y, recon_u, recon_v, symbols, qp, qp_c,
                                R: int, C: int):
    """Apply inter deblocking given the packed symbol tensor (device-side)."""
    from ..ops.deblock import inter_bs_grids
    from .pframe_core import unpack_symbols_device

    mv, luma, _cdc, _cac = unpack_symbols_device(symbols)
    blk_nnz = jnp.sum(luma != 0, axis=3)  # (R, C, 16) raster blocks
    nnz_grid = (
        blk_nnz.reshape(R, C, 4, 4).transpose(0, 2, 1, 3).reshape(R * 4, C * 4)
    )
    bs_v, bs_h = inter_bs_grids(nnz_grid, mv, R, C)
    y, u, v = deblock_frame(recon_y, recon_u, recon_v, qp, qp_c, bs_v, bs_h, R, C)
    return (
        jnp.clip(y, 0, 255).astype(jnp.uint8),
        jnp.clip(u, 0, 255).astype(jnp.uint8),
        jnp.clip(v, 0, 255).astype(jnp.uint8),
    )


def deblock_iframe(recon_y, recon_u, recon_v, qp, qp_c, R: int, C: int):
    from ..ops.deblock import intra_bs_grids

    bs_v, bs_h = intra_bs_grids(R, C)
    y, u, v = deblock_frame(recon_y, recon_u, recon_v, qp, qp_c, bs_v, bs_h, R, C)
    return (
        jnp.clip(y, 0, 255).astype(jnp.uint8),
        jnp.clip(u, 0, 255).astype(jnp.uint8),
        jnp.clip(v, 0, 255).astype(jnp.uint8),
    )
