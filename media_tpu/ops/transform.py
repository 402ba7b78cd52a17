"""H.264 4x4 integer transform, Hadamard DC transforms, quant/dequant — in JAX.

Everything is int32 and bit-exact against Rec. ITU-T H.264 sections 8.5.10-8.5.12
with flat (baseline) scaling lists. All functions are batched: blocks have shape
(..., 4, 4) (or (..., 2, 2) for chroma DC) so an entire frame's worth of blocks
is one VPU-friendly tensor op under jit.

The reference framework delegates this math to OpenH264 / NETINT hardware
(SURVEY.md §2); here it is the TPU compute path itself.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# --- Quantization tables (spec 8.5.12.1, Table 8-15 normAdjust / JM MF) ------

# Forward multiplier MF by qp%6 and coefficient class (0: (0,0),(0,2),(2,0),(2,2);
# 1: (1,1),(1,3),(3,1),(3,3); 2: others).
_MF_CLASS = np.array(
    [
        [13107, 5243, 8066],
        [11916, 4660, 7490],
        [10082, 4194, 6554],
        [9362, 3647, 5825],
        [8192, 3355, 5243],
        [7282, 2893, 4559],
    ],
    dtype=np.int32,
)

# Dequant scale V (normAdjust4x4) by qp%6 and class.
_V_CLASS = np.array(
    [
        [10, 16, 13],
        [11, 18, 14],
        [13, 20, 16],
        [14, 23, 18],
        [16, 25, 20],
        [18, 29, 23],
    ],
    dtype=np.int32,
)

# Position-class map for a 4x4 block.
_POS_CLASS = np.array(
    [
        [0, 2, 0, 2],
        [2, 1, 2, 1],
        [0, 2, 0, 2],
        [2, 1, 2, 1],
    ],
    dtype=np.int32,
)

# MF[qp%6, i, j] and V[qp%6, i, j] expanded to 4x4 maps.
MF_4x4 = _MF_CLASS[:, _POS_CLASS]  # (6, 4, 4)
V_4x4 = _V_CLASS[:, _POS_CLASS]  # (6, 4, 4)

# Chroma QP mapping (spec Table 8-12): qPc as a function of clip3(0,51,qPi).
CHROMA_QP_TABLE = np.array(
    list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37,
                       37, 38, 38, 38, 39, 39, 39, 39],
    dtype=np.int32,
)

# Zig-zag scan for 4x4 blocks (spec Table 8-13, frame coding).
ZIGZAG_4x4 = np.array(
    [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
     (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3)],
    dtype=np.int32,
)
# Flat index (row*4+col) per scan position, and its inverse permutation.
ZIGZAG_FLAT = np.array([r * 4 + c for r, c in ZIGZAG_4x4], dtype=np.int32)
INV_ZIGZAG_FLAT = np.argsort(ZIGZAG_FLAT).astype(np.int32)


def chroma_qp(qp_y, chroma_qp_index_offset: int = 0):
    """Derive chroma QP from luma QP (spec 8.5.8)."""
    qpi = np.clip(qp_y + chroma_qp_index_offset, 0, 51)
    return CHROMA_QP_TABLE[qpi]


# --- Core transforms ---------------------------------------------------------


def forward_4x4(x):
    """Forward 4x4 core transform W = Cf · X · Cf^T (JM/spec butterfly).

    x: int32 (..., 4, 4) residual. Returns int32 coefficients.
    """
    x = jnp.asarray(x, jnp.int32)

    def rows(v):
        a = v[..., 0, :] + v[..., 3, :]
        b = v[..., 1, :] + v[..., 2, :]
        c = v[..., 1, :] - v[..., 2, :]
        d = v[..., 0, :] - v[..., 3, :]
        return jnp.stack([a + b, 2 * d + c, a - b, d - 2 * c], axis=-2)

    # Transform columns then rows (equivalently Cf·X·CfT).
    t = rows(jnp.swapaxes(x, -1, -2))
    return rows(jnp.swapaxes(t, -1, -2))


def inverse_4x4(d):
    """Inverse 4x4 core transform incl. final (x+32)>>6 rounding (spec 8.5.12.2).

    d: int32 (..., 4, 4) dequantized coefficients. Returns int32 residual.
    """
    d = jnp.asarray(d, jnp.int32)

    def stage(v):
        e0 = v[..., 0, :] + v[..., 2, :]
        e1 = v[..., 0, :] - v[..., 2, :]
        e2 = (v[..., 1, :] >> 1) - v[..., 3, :]
        e3 = v[..., 1, :] + (v[..., 3, :] >> 1)
        return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-2)

    # Row transform first, then column (spec order: horizontal then vertical).
    h = stage(jnp.swapaxes(d, -1, -2))  # operate on rows
    h = stage(jnp.swapaxes(h, -1, -2))  # operate on columns
    return (h + 32) >> 6


def hadamard_4x4(x):
    """4x4 Hadamard transform (for intra16x16 luma DC), H · X · H with H rows
    [1,1,1,1],[1,1,-1,-1],[1,-1,-1,1],[1,-1,1,-1]."""
    x = jnp.asarray(x, jnp.int32)

    def rows(v):
        a = v[..., 0, :] + v[..., 3, :]
        b = v[..., 1, :] + v[..., 2, :]
        c = v[..., 1, :] - v[..., 2, :]
        d = v[..., 0, :] - v[..., 3, :]
        return jnp.stack([a + b, d + c, a - b, d - c], axis=-2)

    t = rows(jnp.swapaxes(x, -1, -2))
    return rows(jnp.swapaxes(t, -1, -2))


def hadamard_2x2(x):
    """2x2 transform for chroma DC: [[1,1],[1,-1]] · X · [[1,1],[1,-1]]."""
    x = jnp.asarray(x, jnp.int32)
    a = x[..., 0, 0]
    b = x[..., 0, 1]
    c = x[..., 1, 0]
    d = x[..., 1, 1]
    return jnp.stack(
        [
            jnp.stack([a + b + c + d, a - b + c - d], axis=-1),
            jnp.stack([a + b - c - d, a - b - c + d], axis=-1),
        ],
        axis=-2,
    )


# --- Quantization ------------------------------------------------------------


def _qp_broadcast(qp, w):
    """Align a scalar or per-batch (N,) QP with blocks w (N, ..., 4, 4).

    Returns (qp_e, table_shape_fn): qp_e broadcasts against w elementwise;
    table_shape_fn(t) reshapes a (N, 4, 4) table lookup to broadcast too."""
    qp = jnp.asarray(qp, jnp.int32)
    if qp.ndim == 0:
        return qp, lambda t: t
    n = qp.shape[0]
    qp_e = qp.reshape((n,) + (1,) * (w.ndim - 1))
    mid = (1,) * (w.ndim - 3)

    def shape_table(t):  # (n, 4, 4) -> (n, 1..., 4, 4)
        return t.reshape((n,) + mid + (4, 4))

    return qp_e, shape_table


def quant_4x4(w, qp, *, intra: bool, dc_only_table: bool = False):
    """Forward quantization (JM reference method, produces spec-decodable levels).

    w: int32 (..., 4, 4) transform coefficients.
    qp: scalar, or (N,) for per-MB QP where N == w.shape[0] (adaptive
    quantization / per-MB rate control).
    dc_only_table: use MF position (0,0) for every coefficient (DC transforms).
    """
    w = jnp.asarray(w, jnp.int32)
    qp_e, shape_table = _qp_broadcast(qp, w)
    qbits = 15 + qp_e // 6
    mf_all = shape_table(jnp.asarray(MF_4x4)[jnp.asarray(qp, jnp.int32) % 6])
    if dc_only_table:
        mf = mf_all[..., 0:1, 0:1]
    else:
        mf = mf_all
    f = ((1 << qbits) // (3 if intra else 6))
    wa = jnp.abs(w)
    level = ((wa * mf + f) >> qbits).astype(jnp.int32)
    # Clamp so every CAVLC level codeword fits the 28-bit escape window
    # (encoder-side choice; unreachable below QP~6 — see entropy/device_cavlc).
    return jnp.sign(w) * jnp.minimum(level, 2063)


def quant_dc_4x4(w_dc, qp, *, intra: bool = True):
    """Quantize intra16x16 luma DC given the raw forward Hadamard output.

    The decoder chain (spec 8.5.10) applies an inverse Hadamard (gain 16) and a
    DC dequant with gain V0*2^(qp/6)/4, so for the reconstructed DC to line up
    with the AC quant-dequant gain MF0*V0*2^(qp/6)/2^qbits the encoder level
    must be (|H·D·H| * MF0) / 2^(qbits+2) — i.e. a net /4 vs. plain quant,
    absorbed into a single rounded shift here.
    """
    w = jnp.asarray(w_dc, jnp.int32)
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    mf0 = jnp.asarray(MF_4x4)[qp % 6][..., 0:1, 0:1]
    f = ((1 << qbits) // (3 if intra else 6))
    wa = jnp.abs(w)
    level = ((wa * mf0 + 4 * f) >> (qbits + 2)).astype(jnp.int32)
    # No clamp: the I16 DC path is host-packed, where extended level escapes
    # (prefix > 15) are supported; clamping would hurt very-low-QP DC fidelity.
    return jnp.sign(w) * level


def quant_dc_2x2(w_dc, qp, *, intra: bool):
    """Quantize chroma DC after the 2x2 transform: (|W|*MF0 + 2f) >> (qbits+1)."""
    w = jnp.asarray(w_dc, jnp.int32)
    qp_e, shape_table = _qp_broadcast(qp, w)
    qbits = 15 + qp_e // 6
    mf0 = shape_table(
        jnp.asarray(MF_4x4)[jnp.asarray(qp, jnp.int32) % 6])[..., 0:1, 0:1]
    f = ((1 << qbits) // (3 if intra else 6))
    wa = jnp.abs(w)
    level = ((wa * mf0 + 2 * f) >> (qbits + 1)).astype(jnp.int32)
    return jnp.sign(w) * jnp.minimum(level, 2063)


def dequant_4x4(z, qp):
    """Dequantize 4x4 AC/residual levels: d = z * V(qp%6, pos) << (qp/6).

    Bit-exact with spec 8.5.12.1 under flat scaling lists for all QP.
    qp: scalar or per-batch (N,) (see quant_4x4).
    """
    z = jnp.asarray(z, jnp.int32)
    qp_e, shape_table = _qp_broadcast(qp, z)
    v = shape_table(jnp.asarray(V_4x4)[jnp.asarray(qp, jnp.int32) % 6])
    return (z * v) << (qp_e // 6)


def dequant_dc_4x4(f_dc, qp):
    """Dequantize intra16x16 luma DC *after* the decoder-side inverse Hadamard
    (spec 8.5.10): qp>=36: (f*16*V0) << (qp/6 - 6); else
    (f*16*V0 + 2^(5 - qp/6)) >> (6 - qp/6)."""
    f = jnp.asarray(f_dc, jnp.int32)
    qp = jnp.asarray(qp, jnp.int32)
    v0 = jnp.asarray(V_4x4)[qp % 6][..., 0:1, 0:1]
    ls = 16 * v0
    shift_hi = qp // 6 - 6
    lo = (f * ls + (1 << jnp.maximum(5 - qp // 6, 0))) >> jnp.maximum(6 - qp // 6, 0)
    hi = (f * ls) << jnp.maximum(shift_hi, 0)
    return jnp.where(qp >= 36, hi, lo)


def dequant_dc_2x2(f_dc, qp):
    """Dequantize chroma DC after the decoder-side 2x2 transform (spec 8.5.11):
    ((f * 16*V0) << (qp/6)) >> 5. qp: scalar or per-batch (N,)."""
    f = jnp.asarray(f_dc, jnp.int32)
    qp_e, shape_table = _qp_broadcast(qp, f)
    v0 = shape_table(
        jnp.asarray(V_4x4)[jnp.asarray(qp, jnp.int32) % 6])[..., 0:1, 0:1]
    return ((f * 16 * v0) << (qp_e // 6)) >> 5


# --- Zig-zag -----------------------------------------------------------------


def zigzag(blocks):
    """(..., 4, 4) -> (..., 16) in zig-zag scan order.

    Static slice+stack (not a take): constant-index gathers still serialize
    per row on TPU."""
    flat = jnp.asarray(blocks).reshape(*blocks.shape[:-2], 16)
    return jnp.stack([flat[..., int(i)] for i in ZIGZAG_FLAT], axis=-1)


def inverse_zigzag(scans):
    """(..., 16) zig-zag order -> (..., 4, 4)."""
    scans = jnp.asarray(scans)
    blocks = jnp.stack([scans[..., int(i)] for i in INV_ZIGZAG_FLAT], axis=-1)
    return blocks.reshape(*scans.shape[:-1], 4, 4)
