"""In-loop deblocking filter (Rec. ITU-T H.264 8.7) — JAX wavefront.

Filtering order is normative: MBs in raster order, each MB filtering its four
vertical luma edges left-to-right, then its four horizontal edges
top-to-bottom (two each for chroma), with neighbor MBs already fully
filtered. An MB's edge-0 filters write into the left/top neighbor, so MB
(r, c) effectively depends on (r, c-1), (r-1, c) and (r-1, c+1): anti-
diagonals of the skewed wave index 2r + c are independent and are processed
together (`lax.scan` over waves, vectorized across the wave's MBs and the 16
filter lanes of each edge).

Boundary strengths: intra frames use bS=4 on MB edges / 3 inside; inter
(P_L0_16x16) edges use bS=2 where either side has coefficients, else bS=1
when the MV difference reaches a full sample, else 0 (spec 8.7.2.1 subset
matching this encoder's tools).

NOTE: the alpha/beta/tc0 tables are transcribed from the spec; encoder and
decoder share exactly these values (tests enforce encoder==decoder
bit-exactness), pending third-party conformance cross-checks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

ALPHA_TABLE = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
       40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
       226, 255, 255],
    dtype=np.int32,
)
BETA_TABLE = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
       11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18],
    dtype=np.int32,
)
# tc0[idx][bS-1] for bS in 1..3
TC0_TABLE = np.array(
    [[0, 0, 0]] * 17
    + [
        [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 1],
        [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 2], [1, 1, 2],
        [1, 1, 2], [1, 1, 2], [1, 2, 3], [1, 2, 3], [2, 2, 3], [2, 2, 4],
        [2, 3, 4], [2, 3, 4], [3, 3, 5], [3, 4, 6], [3, 4, 6], [4, 5, 7],
        [4, 5, 8], [4, 6, 9], [5, 7, 10], [6, 8, 11], [6, 8, 13], [7, 10, 14],
        [8, 11, 16], [9, 12, 18], [10, 13, 20], [11, 15, 23], [13, 17, 25],
    ],
    dtype=np.int32,
)


def filter_luma_taps(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0):
    """Tap-wise luma edge filter core (spec 8.7.2.3/8.7.2.4). All args are
    broadcastable lane arrays; returns (p2', p1', p0', q0', q1', q2')."""

    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)

    # --- normal filter (bS < 4) ---
    tc = tc0 + (ap < beta).astype(jnp.int32) + (aq < beta).astype(jnp.int32)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)
    dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    p1_n = jnp.where(ap < beta, p1 + dp1, p1)
    q1_n = jnp.where(aq < beta, q1 + dq1, q1)

    # --- strong filter (bS == 4) ---
    strong_cond = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = strong_cond & (ap < beta)
    sq = strong_cond & (aq < beta)
    p0_s = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                     (2 * p1 + p0 + q1 + 2) >> 2)
    p1_s = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    p2_s = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    q0_s = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                     (2 * q1 + q0 + p1 + 2) >> 2)
    q1_s = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    q2_s = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs >= 4
    p0_o = jnp.where(filt, jnp.where(is4, p0_s, p0_n), p0)
    p1_o = jnp.where(filt & ~is4, p1_n, jnp.where(filt & is4, p1_s, p1))
    p2_o = jnp.where(filt & is4, p2_s, p2)
    q0_o = jnp.where(filt, jnp.where(is4, q0_s, q0_n), q0)
    q1_o = jnp.where(filt & ~is4, q1_n, jnp.where(filt & is4, q1_s, q1))
    q2_o = jnp.where(filt & is4, q2_s, q2)

    return p2_o, p1_o, p0_o, q0_o, q1_o, q2_o


def filter_edge_luma(p, q, bs, alpha, beta, tc0):
    """Array form: p (..., 4) = p3..p0 (p[...,3] adjacent); q (..., 4) = q0..q3."""
    p2_o, p1_o, p0_o, q0_o, q1_o, q2_o = filter_luma_taps(
        p[..., 0], p[..., 1], p[..., 2], p[..., 3],
        q[..., 0], q[..., 1], q[..., 2], q[..., 3], bs, alpha, beta, tc0)
    p_new = jnp.stack([p[..., 0], p2_o, p1_o, p0_o], axis=-1)
    q_new = jnp.stack([q0_o, q1_o, q2_o, q[..., 3]], axis=-1)
    return p_new, q_new


def filter_chroma_taps(p1, p0, q0, q1, bs, alpha, beta, tc0):
    """Tap-wise chroma filter core; returns (p0', q0')."""
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    tc = tc0 + 1
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)
    p0_s = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs >= 4
    p0_o = jnp.where(filt, jnp.where(is4, p0_s, p0_n), p0)
    q0_o = jnp.where(filt, jnp.where(is4, q0_s, q0_n), q0)
    return p0_o, q0_o


def filter_edge_chroma(p, q, bs, alpha, beta, tc0):
    """Array form: p (..., 2) = [p1, p0]; q (..., 2) = [q0, q1]."""
    p0_o, q0_o = filter_chroma_taps(
        p[..., 0], p[..., 1], q[..., 0], q[..., 1], bs, alpha, beta, tc0)
    return (
        jnp.stack([p[..., 0], p0_o], axis=-1),
        jnp.stack([q0_o, q[..., 1]], axis=-1),
    )


def inter_bs_grids(nnz_blk, mv_qpel, R: int, C: int):
    """Boundary strengths for an all-inter P frame.

    nnz_blk: (R*4, C*4) per-4x4 nonzero-coefficient counts;
    mv_qpel: (R, C, 2) per-MB quarter-pel MVs (16x16 partitions).
    Returns (bs_v, bs_h): (R*4, C*4) strengths for the vertical edge LEFT of
    each 4x4 block and the horizontal edge ABOVE it (edge at block col/row 0
    of the frame is unfiltered; encoded as 0).
    """
    nz = (nnz_blk > 0).astype(jnp.int32)
    mv_blk = jnp.repeat(jnp.repeat(mv_qpel, 4, axis=0), 4, axis=1)  # (4R,4C,2)

    def bs_dir(axis):
        nz_n = jnp.roll(nz, 1, axis=axis)
        coded = (nz | nz_n) > 0
        mv_n = jnp.roll(mv_blk, 1, axis=axis)
        far = jnp.any(jnp.abs(mv_blk - mv_n) >= 4, axis=-1)
        bs = jnp.where(coded, 2, jnp.where(far, 1, 0))
        if axis == 1:
            bs = bs.at[:, 0].set(0)
        else:
            bs = bs.at[0, :].set(0)
        return bs

    return bs_dir(1), bs_dir(0)


def intra_bs_grids(R: int, C: int):
    """bS for an all-intra frame: 4 on MB edges, 3 on internal edges."""
    col = jnp.arange(C * 4) % 4
    row = jnp.arange(R * 4) % 4
    bs_v = jnp.where(col[None, :] == 0, 4, 3) * jnp.ones((R * 4, 1), jnp.int32)
    bs_h = jnp.where(row[:, None] == 0, 4, 3) * jnp.ones((1, C * 4), jnp.int32)
    bs_v = bs_v.at[:, 0].set(0)
    bs_h = bs_h.at[0, :].set(0)
    return bs_v, bs_h
