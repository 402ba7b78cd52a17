"""Literal, scalar (loop-based) H.264 transform/quant reference for tests.

Written as element-by-element translations of Rec. ITU-T H.264 8.5.10-8.5.12
pseudo-code, deliberately independent of media_tpu's vectorized JAX code so the
two implementations cross-check each other bit-exactly.
"""

import numpy as np

CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]])
H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]])
H2 = np.array([[1, 1], [1, -1]])

V_TABLE = {  # qp%6 -> (class0, class1, class2)
    0: (10, 16, 13), 1: (11, 18, 14), 2: (13, 20, 16),
    3: (14, 23, 18), 4: (16, 25, 20), 5: (18, 29, 23),
}
MF_TABLE = {
    0: (13107, 5243, 8066), 1: (11916, 4660, 7490), 2: (10082, 4194, 6554),
    3: (9362, 3647, 5825), 4: (8192, 3355, 5243), 5: (7282, 2893, 4559),
}


def pos_class(i, j):
    if (i % 2 == 0) and (j % 2 == 0):
        return 0
    if (i % 2 == 1) and (j % 2 == 1):
        return 1
    return 2


def forward_4x4(x):
    return CF @ np.asarray(x, np.int64) @ CF.T


def inverse_4x4(d):
    d = np.asarray(d, np.int64)
    # spec 8.5.12.2: rows then columns with >>1 on odd coefficients
    e = np.zeros((4, 4), np.int64)
    for i in range(4):
        e0 = d[i, 0] + d[i, 2]
        e1 = d[i, 0] - d[i, 2]
        e2 = (d[i, 1] >> 1) - d[i, 3]
        e3 = d[i, 1] + (d[i, 3] >> 1)
        e[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    h = np.zeros((4, 4), np.int64)
    for j in range(4):
        g0 = e[0, j] + e[2, j]
        g1 = e[0, j] - e[2, j]
        g2 = (e[1, j] >> 1) - e[3, j]
        g3 = e[1, j] + (e[3, j] >> 1)
        h[:, j] = [g0 + g3, g1 + g2, g1 - g2, g0 - g3]
    return (h + 32) >> 6


def quant_4x4(w, qp, intra):
    w = np.asarray(w, np.int64)
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    z = np.zeros((4, 4), np.int64)
    for i in range(4):
        for j in range(4):
            mf = MF_TABLE[qp % 6][pos_class(i, j)]
            lev = (abs(w[i, j]) * mf + f) >> qbits
            z[i, j] = lev if w[i, j] >= 0 else -lev
    return z


def dequant_4x4(z, qp):
    z = np.asarray(z, np.int64)
    d = np.zeros((4, 4), np.int64)
    for i in range(4):
        for j in range(4):
            v = V_TABLE[qp % 6][pos_class(i, j)]
            d[i, j] = (z[i, j] * v) << (qp // 6)
    return d


def decode_luma_dc(z_dc, qp):
    """Spec 8.5.10: inverse Hadamard then DC scaling."""
    f = H4 @ np.asarray(z_dc, np.int64) @ H4
    v0 = V_TABLE[qp % 6][0]
    ls = 16 * v0
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        for j in range(4):
            if qp >= 36:
                out[i, j] = (f[i, j] * ls) << (qp // 6 - 6)
            else:
                out[i, j] = (f[i, j] * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)
    return out


def decode_chroma_dc(z_dc, qp):
    """Spec 8.5.11."""
    f = H2 @ np.asarray(z_dc, np.int64) @ H2
    v0 = V_TABLE[qp % 6][0]
    out = np.zeros((2, 2), np.int64)
    for i in range(2):
        for j in range(2):
            out[i, j] = ((f[i, j] * 16 * v0) << (qp // 6)) >> 5
    return out
