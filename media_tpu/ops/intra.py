"""H.264 intra prediction (spec 8.3.3 luma 16x16, 8.3.4 chroma 8x8) — batched JAX.

All prediction functions operate on batches of macroblocks: inputs are the
neighbor pixel vectors (reconstructed top row / left column) plus availability
flags, outputs are predicted blocks. This shape lets a whole wavefront
diagonal of MBs be predicted in one VPU op under jit (the TPU-native answer to
the reference's per-MB serial vendor encoders, SURVEY.md §2.3).

Mode numbering (luma 16x16, spec 8.3.3): 0=V, 1=H, 2=DC, 3=Plane.
Mode numbering (chroma, spec 8.3.4):     0=DC, 1=H, 2=V, 3=Plane.
"""

from __future__ import annotations

import jax.numpy as jnp

I16_VERTICAL = 0
I16_HORIZONTAL = 1
I16_DC = 2
I16_PLANE = 3

CHROMA_DC = 0
CHROMA_HORIZONTAL = 1
CHROMA_VERTICAL = 2
CHROMA_PLANE = 3


def _clip_pixel(x):
    return jnp.clip(x, 0, 255)


def pred_16x16_vertical(top):
    """top: (N, 16) int32 -> (N, 16, 16)."""
    return jnp.broadcast_to(top[:, None, :], (*top.shape[:-1], 16, 16))


def pred_16x16_horizontal(left):
    return jnp.broadcast_to(left[:, :, None], (*left.shape[:-1], 16, 16))


def pred_16x16_dc(top, left, avail_top, avail_left):
    """DC prediction with availability rules (spec 8.3.3.3).

    avail_*: (N,) bool. Returns (N, 16, 16).
    """
    sum_t = jnp.sum(top, axis=-1)
    sum_l = jnp.sum(left, axis=-1)
    both = (sum_t + sum_l + 16) >> 5
    only_t = (sum_t + 8) >> 4
    only_l = (sum_l + 8) >> 4
    dc = jnp.where(
        avail_top & avail_left,
        both,
        jnp.where(avail_top, only_t, jnp.where(avail_left, only_l, 128)),
    )
    return jnp.broadcast_to(dc[:, None, None], (*dc.shape, 16, 16))


def pred_16x16_plane(top, left, top_left):
    """Plane prediction (spec 8.3.3.4). top/left: (N,16), top_left: (N,)."""
    n = top.shape[0]
    x = jnp.arange(1, 9, dtype=jnp.int32)  # 1..8
    # p[-1, 7+x] - p[-1, 7-x]; p[-1,-1] enters at x == 8.
    top_ext = jnp.concatenate([top_left[:, None], top], axis=-1)  # index i = p[-1, i-1]
    h = jnp.sum(x * (top_ext[:, 8 + x] - top_ext[:, 8 - x]), axis=-1)
    left_ext = jnp.concatenate([top_left[:, None], left], axis=-1)
    v = jnp.sum(x * (left_ext[:, 8 + x] - left_ext[:, 8 - x]), axis=-1)
    a = 16 * (top[:, 15] + left[:, 15])
    b = (5 * h + 32) >> 6
    c = (5 * v + 32) >> 6
    xs = jnp.arange(16, dtype=jnp.int32)[None, None, :] - 7
    ys = jnp.arange(16, dtype=jnp.int32)[None, :, None] - 7
    pred = (a[:, None, None] + b[:, None, None] * xs + c[:, None, None] * ys + 16) >> 5
    return _clip_pixel(pred)


def pred_16x16_all(top, left, top_left, avail_top, avail_left):
    """All four 16x16 modes stacked: (N, 4, 16, 16) in mode order V,H,DC,Plane."""
    return jnp.stack(
        [
            pred_16x16_vertical(top),
            pred_16x16_horizontal(left),
            pred_16x16_dc(top, left, avail_top, avail_left),
            pred_16x16_plane(top, left, top_left),
        ],
        axis=1,
    )


def mode_available_16x16(avail_top, avail_left):
    """(N, 4) bool — which 16x16 modes may be signaled (spec 8.3.3)."""
    return jnp.stack(
        [avail_top, avail_left, jnp.ones_like(avail_top), avail_top & avail_left],
        axis=-1,
    )


# --- Chroma 8x8 --------------------------------------------------------------


def pred_chroma_dc(top, left, avail_top, avail_left):
    """Chroma DC per spec 8.3.4.1: each 4x4 quadrant has its own DC rule.

    top/left: (N, 8) int32, returns (N, 8, 8).
    """
    sum_t0 = jnp.sum(top[:, 0:4], axis=-1)
    sum_t1 = jnp.sum(top[:, 4:8], axis=-1)
    sum_l0 = jnp.sum(left[:, 0:4], axis=-1)
    sum_l1 = jnp.sum(left[:, 4:8], axis=-1)

    def corner(sum_t, sum_l, prefer_top):
        both = (sum_t + sum_l + 4) >> 3
        only_t = (sum_t + 2) >> 2
        only_l = (sum_l + 2) >> 2
        if prefer_top is None:  # average corners (0,0) and (4,4)
            return jnp.where(
                avail_top & avail_left,
                both,
                jnp.where(avail_top, only_t, jnp.where(avail_left, only_l, 128)),
            )
        if prefer_top:  # block (4,0): top half preferred
            return jnp.where(avail_top, only_t, jnp.where(avail_left, only_l, 128))
        return jnp.where(avail_left, only_l, jnp.where(avail_top, only_t, 128))

    dc00 = corner(sum_t0, sum_l0, None)
    dc10 = corner(sum_t1, sum_l0, True)  # x=4..7, y=0..3
    dc01 = corner(sum_t0, sum_l1, False)  # x=0..3, y=4..7
    dc11 = corner(sum_t1, sum_l1, None)

    topq = jnp.stack([dc00, dc10], axis=-1)  # (N, 2)
    botq = jnp.stack([dc01, dc11], axis=-1)
    quad = jnp.stack([topq, botq], axis=-2)  # (N, 2, 2) [y][x]
    return jnp.repeat(jnp.repeat(quad, 4, axis=-2), 4, axis=-1)


def pred_chroma_horizontal(left):
    return jnp.broadcast_to(left[:, :, None], (*left.shape[:-1], 8, 8))


def pred_chroma_vertical(top):
    return jnp.broadcast_to(top[:, None, :], (*top.shape[:-1], 8, 8))


def pred_chroma_plane(top, left, top_left):
    """Chroma plane prediction (spec 8.3.4.4)."""
    x = jnp.arange(1, 5, dtype=jnp.int32)  # 1..4
    top_ext = jnp.concatenate([top_left[:, None], top], axis=-1)
    h = jnp.sum(x * (top_ext[:, 4 + x] - top_ext[:, 4 - x]), axis=-1)
    left_ext = jnp.concatenate([top_left[:, None], left], axis=-1)
    v = jnp.sum(x * (left_ext[:, 4 + x] - left_ext[:, 4 - x]), axis=-1)
    a = 16 * (top[:, 7] + left[:, 7])
    b = (17 * h + 16) >> 5
    c = (17 * v + 16) >> 5
    xs = jnp.arange(8, dtype=jnp.int32)[None, None, :] - 3
    ys = jnp.arange(8, dtype=jnp.int32)[None, :, None] - 3
    pred = (a[:, None, None] + b[:, None, None] * xs + c[:, None, None] * ys + 16) >> 5
    return _clip_pixel(pred)


def pred_chroma_all(top, left, top_left, avail_top, avail_left):
    """(N, 4, 8, 8) in chroma mode order DC,H,V,Plane."""
    return jnp.stack(
        [
            pred_chroma_dc(top, left, avail_top, avail_left),
            pred_chroma_horizontal(left),
            pred_chroma_vertical(top),
            pred_chroma_plane(top, left, top_left),
        ],
        axis=1,
    )


def mode_available_chroma(avail_top, avail_left):
    """(N, 4) bool in chroma mode order DC,H,V,Plane."""
    return jnp.stack(
        [jnp.ones_like(avail_top), avail_left, avail_top, avail_top & avail_left],
        axis=-1,
    )


# --- Luma 4x4 (spec 8.3.1.2): 9 modes -----------------------------------------

I4_V, I4_H, I4_DC, I4_DDL, I4_DDR, I4_VR, I4_HD, I4_VL, I4_HU = range(9)


def pred_4x4_all(top8, left4, corner, avail_top, avail_left, avail_tr):
    """All nine 4x4 intra modes, batched.

    top8: (N, 8) p[0..7, -1] — the caller must already have substituted
    p[3,-1] into x=4..7 when the top-right is unavailable (spec 8.3.1.2
    substitution; avail_tr only gates the *mode list*, not the samples).
    left4: (N, 4) p[-1, 0..3]; corner: (N,) p[-1, -1].
    avail_*: (N,) bool. Returns (preds (N, 9, 4, 4) int32, ok (N, 9) bool).
    """
    n = top8.shape[0]

    def t(i):  # p[i, -1]
        return top8[:, i]

    def l(i):  # p[-1, i]
        return left4[:, i]

    def grid(fn):
        rows = [jnp.stack([fn(x, y) for x in range(4)], axis=-1)
                for y in range(4)]
        return jnp.stack(rows, axis=-2)  # (N, 4, 4) [y][x]

    p_v = grid(lambda x, y: t(x))
    p_h = grid(lambda x, y: l(y))

    sum_t = jnp.sum(top8[:, :4], axis=-1)
    sum_l = jnp.sum(left4, axis=-1)
    dc = jnp.where(
        avail_top & avail_left, (sum_t + sum_l + 4) >> 3,
        jnp.where(avail_top, (sum_t + 2) >> 2,
                  jnp.where(avail_left, (sum_l + 2) >> 2, 128)))
    p_dc = jnp.broadcast_to(dc[:, None, None], (n, 4, 4))

    def ddl(x, y):
        if x == 3 and y == 3:
            return (t(6) + 3 * t(7) + 2) >> 2
        return (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2

    p_ddl = grid(ddl)

    def px(i):  # p[i, -1] with p[-1, -1] at i == -1
        return corner if i == -1 else t(i)

    def py(i):  # p[-1, i] with p[-1, -1] at i == -1
        return corner if i == -1 else l(i)

    def ddr(x, y):
        # |x-y| == 1 reaches p[-1,-1]: px/py map index -1 to the corner
        # (a bare t(-1)/l(-1) would wrap to t[7]/l[3]).
        if x > y:
            return (px(x - y - 2) + 2 * px(x - y - 1) + px(x - y) + 2) >> 2
        if x < y:
            return (py(y - x - 2) + 2 * py(y - x - 1) + py(y - x) + 2) >> 2
        return (t(0) + 2 * corner + l(0) + 2) >> 2

    p_ddr = grid(ddr)

    def vr(x, y):
        z = 2 * x - y
        if z >= 0 and z % 2 == 0:
            return (px(x - (y >> 1) - 1) + px(x - (y >> 1)) + 1) >> 1
        if z >= 0:
            return (px(x - (y >> 1) - 2) + 2 * px(x - (y >> 1) - 1)
                    + px(x - (y >> 1)) + 2) >> 2
        if z == -1:
            return (l(0) + 2 * corner + t(0) + 2) >> 2
        return (py(y - 2 * x - 1) + 2 * py(y - 2 * x - 2)
                + py(y - 2 * x - 3) + 2) >> 2

    p_vr = grid(vr)

    def hd(x, y):
        z = 2 * y - x
        if z >= 0 and z % 2 == 0:
            return (py(y - (x >> 1) - 1) + py(y - (x >> 1)) + 1) >> 1
        if z >= 0:
            return (py(y - (x >> 1) - 2) + 2 * py(y - (x >> 1) - 1)
                    + py(y - (x >> 1)) + 2) >> 2
        if z == -1:
            return (l(0) + 2 * corner + t(0) + 2) >> 2
        return (px(x - 2 * y - 1) + 2 * px(x - 2 * y - 2)
                + px(x - 2 * y - 3) + 2) >> 2

    p_hd = grid(hd)

    def vl(x, y):
        if y % 2 == 0:
            return (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
        return (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1)
                + t(x + (y >> 1) + 2) + 2) >> 2

    p_vl = grid(vl)

    def hu(x, y):
        z = x + 2 * y
        if z > 5:
            return l(3)
        if z == 5:
            return (l(2) + 3 * l(3) + 2) >> 2
        if z % 2 == 0:
            return (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
        return (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1)
                + l(y + (x >> 1) + 2) + 2) >> 2

    p_hu = grid(hu)

    preds = jnp.stack(
        [p_v, p_h, p_dc, p_ddl, p_ddr, p_vr, p_hd, p_vl, p_hu], axis=1)
    tl = avail_top & avail_left
    ok = jnp.stack([
        avail_top, avail_left, jnp.ones_like(avail_top),
        avail_top, tl, tl, tl, avail_top, avail_left,
    ], axis=-1)
    return preds, ok


def sad_cost(pred_modes, original):
    """SAD between each candidate mode and the original block.

    pred_modes: (N, M, H, W); original: (N, H, W) -> (N, M) int32.
    """
    diff = jnp.abs(pred_modes - original[:, None, :, :])
    return jnp.sum(diff, axis=(-1, -2))


def satd_cost(pred_modes, original):
    """SATD (4x4 Hadamard-transformed SAD): predicts coded bits much better
    than plain SAD, so mode decisions trade prediction error against
    transform compaction. H and W must be multiples of 4.

    pred_modes: (N, M, H, W); original: (N, H, W) -> (N, M) int32.
    """
    from . import transform as T

    res = pred_modes - original[:, None, :, :]
    n, m, hh, ww = res.shape
    blocks = (res.reshape(n, m, hh // 4, 4, ww // 4, 4)
              .transpose(0, 1, 2, 4, 3, 5))
    h = T.hadamard_4x4(blocks)
    return (jnp.sum(jnp.abs(h), axis=(-1, -2, -3, -4)) >> 1).astype(jnp.int32)
