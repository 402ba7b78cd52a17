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


def sad_cost(pred_modes, original):
    """SAD between each candidate mode and the original block.

    pred_modes: (N, M, H, W); original: (N, H, W) -> (N, M) int32.
    """
    diff = jnp.abs(pred_modes - original[:, None, :, :])
    return jnp.sum(diff, axis=(-1, -2))
