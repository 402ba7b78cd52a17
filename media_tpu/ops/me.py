"""Motion estimation and compensation (full-pel search, batched) — JAX.

TPU-first formulation: every MB of the frame is processed in one batch.
Search windows are gathered once into a (N, 16+2R, 16+2R) tensor; the
(2R+1)^2 candidate offsets are evaluated with a `lax.scan` that keeps the
running best (cost, offset) — memory stays O(N * window), not O(N * candidates).

This replaces the vendor-internal ME of OpenH264/NETINT (SURVEY.md §2); the
halo the window gather implies is what becomes an ICI `ppermute` halo exchange
when the MB grid is sharded across chips (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gather_mb_windows(ref_plane, n_rows: int, n_cols: int, mb: int, radius: int):
    """(H, W) reference -> (N, mb+2R, mb+2R) per-MB search windows.

    The reference is edge-padded by `radius` so out-of-frame candidates use
    border replication (matching clamped MC in the decoder).
    """
    pad = jnp.pad(ref_plane, radius, mode="edge")
    n = n_rows * n_cols
    r = jnp.arange(n, dtype=jnp.int32) // n_cols
    c = jnp.arange(n, dtype=jnp.int32) % n_cols
    span = jnp.arange(mb + 2 * radius, dtype=jnp.int32)
    rows = r[:, None] * mb + span[None, :]  # (N, mb+2R); +radius-R cancels
    cols = c[:, None] * mb + span[None, :]
    return pad[rows[:, :, None], cols[:, None, :]]


@functools.partial(jax.jit, static_argnums=(2, 3))
def full_search(cur_mbs, windows, radius: int, lambda_mv: int = 4):
    """Full-pel exhaustive SAD search.

    cur_mbs: (N, 16, 16) int current MBs.
    windows: (N, 16+2R, 16+2R) int reference windows.
    Returns (mv, sad): mv (N, 2) int32 full-pel (mvx, mvy) relative offsets in
    luma pels, sad (N,) best cost (SAD + lambda * |mv|_1 rate bias).

    Fully unrolled static slicing: every (dy, dx) candidate row is an
    independent fusion producing its (N, K) SAD vector, so the VPU sees one
    wide data-parallel graph instead of a serialized best-so-far chain (the
    old lax.scan carried a 17-step dependency). Differences are computed in
    int16 (pixels are 8-bit; |diff| <= 255) with int32 accumulation, halving
    the bandwidth of the dominant tensor op. The winner is a single argmin
    over the (N, K*K) cost table; argmin's first-minimum rule reproduces the
    old (dy, dx)-lexicographic tie-break exactly, so bitstreams and the
    sharded session's byte-identity are unchanged.
    """
    K = 2 * radius + 1
    # Barrier: materialize the int16 copies once — without it XLA remats
    # the windows build into many of the K^2 candidate fusions.
    cur16, win16 = jax.lax.optimization_barrier(
        (cur_mbs.astype(jnp.int16), windows.astype(jnp.int16)))
    mvx_cost = (lambda_mv * jnp.abs(jnp.arange(K) - radius)).astype(jnp.int32)

    def row_costs(dy):  # static dy: pure static slicing
        wslice = win16[:, dy : dy + 16, :]  # (N, 16, 16+2R)
        cand = jnp.stack(
            [wslice[:, :, dx : dx + 16] for dx in range(K)], axis=2
        )  # (N, 16, K, 16) int16
        sad = jnp.sum(
            jnp.abs(cand - cur16[:, :, None, :]).astype(jnp.int32),
            axis=(1, 3),
        )  # (N, K)
        return sad + mvx_cost[None, :] + lambda_mv * abs(dy - radius)

    costs = jnp.stack([row_costs(dy) for dy in range(K)], axis=1)  # (N,K,K)
    flat = costs.reshape(-1, K * K)
    idx = jnp.argmin(flat, axis=1).astype(jnp.int32)
    cost = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    dy = idx // K
    dx = idx % K
    mv = jnp.stack([dx - radius, dy - radius], axis=-1)  # (mvx, mvy)
    return mv, cost


def mc_luma(windows, mv, radius: int):
    """Fetch the predicted MB for each best MV from the gathered windows.

    windows: (N, 16+2R, 16+2R); mv: (N, 2) full-pel (mvx, mvy) -> (N, 16, 16).
    """
    n = windows.shape[0]
    idx = jnp.arange(n)[:, None, None]
    ys = (mv[:, 1] + radius)[:, None, None] + jnp.arange(16)[None, :, None]
    xs = (mv[:, 0] + radius)[:, None, None] + jnp.arange(16)[None, None, :]
    return windows[idx, ys, xs]


def mc_chroma(ref_plane, mv, n_rows: int, n_cols: int):
    """Chroma motion compensation for full-pel luma MVs (spec 8.4.2.2.2).

    A full-pel luma MV is mv/2 chroma pels: integer part by floor, plus a
    half-pel bilinear tap when the luma MV is odd. ref_plane: (H/2, W/2);
    mv: (N, 2) full-pel luma. Returns (N, 8, 8) int32.
    """
    # 1/8-chroma-pel MV = luma quarter-pel MV value; here mv is full-pel luma
    # so mv_c8 = 4 * mv.
    mv_c8 = 4 * mv
    ix = mv_c8[:, 0] >> 3
    iy = mv_c8[:, 1] >> 3
    fx = (mv_c8[:, 0] & 7)[:, None, None]
    fy = (mv_c8[:, 1] & 7)[:, None, None]

    h, w = ref_plane.shape
    # Pad enough for the maximum chroma displacement + 1 for bilinear.
    pad = jnp.pad(ref_plane, ((0, 1), (0, 1)), mode="edge")  # bilinear tap
    n = n_rows * n_cols
    r = jnp.arange(n, dtype=jnp.int32) // n_cols
    c = jnp.arange(n, dtype=jnp.int32) % n_cols
    ys = jnp.clip(r[:, None] * 8 + iy[:, None] + jnp.arange(9)[None, :], 0, h)
    xs = jnp.clip(c[:, None] * 8 + ix[:, None] + jnp.arange(9)[None, :], 0, w)
    patch = pad[ys[:, :, None], xs[:, None, :]]  # (N, 9, 9)

    a = patch[:, :8, :8]
    b = patch[:, :8, 1:9]
    cc = patch[:, 1:9, :8]
    d = patch[:, 1:9, 1:9]
    return (
        (8 - fx) * (8 - fy) * a
        + fx * (8 - fy) * b
        + (8 - fx) * fy * cc
        + fx * fy * d
        + 32
    ) >> 6
