"""Luma sub-pel interpolation (spec 8.4.2.2.1) and quarter-pel MC — JAX.

Half-pel samples come from the 6-tap (1,-5,20,20,-5,1) filter; the center
position j is filtered from UNROUNDED horizontal intermediates. Quarter-pel
samples are rounded averages of the two nearest integer/half samples
(Table 8-12's a..s positions). The encoder computes the three half-pel planes
once per reference frame; per-candidate evaluation in the sub-pel refinement
is then pure static slicing of per-MB windows (no gathers in the inner loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def half_pel_planes(ref):
    """ref: (H, W) int32 (already edge-extended as needed by the caller).

    Returns (b, h, j) planes of the same shape:
      b[y,x] = half-pel at (x+1/2, y); h[y,x] = (x, y+1/2);
      j[y,x] = (x+1/2, y+1/2).
    Out-of-range taps use edge replication (== the spec's coordinate clip).
    """
    ref = jnp.asarray(ref, jnp.int32)
    H, W = ref.shape
    p = jnp.pad(ref, 3, mode="edge")  # taps reach -2..+3

    def hfilter(a):
        w = a.shape[1]
        return (
            a[:, 0 : w - 5]
            - 5 * a[:, 1 : w - 4]
            + 20 * a[:, 2 : w - 3]
            + 20 * a[:, 3 : w - 2]
            - 5 * a[:, 4 : w - 1]
            + a[:, 5:w]
        )

    def vfilter(a):
        h_ = a.shape[0]
        return (
            a[0 : h_ - 5, :]
            - 5 * a[1 : h_ - 4, :]
            + 20 * a[2 : h_ - 3, :]
            + 20 * a[3 : h_ - 2, :]
            - 5 * a[4 : h_ - 1, :]
            + a[5:h_, :]
        )

    # b1 over padded rows: input p (H+6, W+6); hfilter drops 5 cols -> W+1;
    # sample x of b uses cols x-2..x+3 => b1_allrows[:, x] with col base 1.
    b1_rows = hfilter(p)  # (H+6, W+1): col i corresponds to x = i - 1
    b1 = b1_rows[3 : 3 + H, 1 : 1 + W]
    b = jnp.clip((b1 + 16) >> 5, 0, 255)

    h1_cols = vfilter(p)  # (H+1, W+6): row i -> y = i - 1
    h1 = h1_cols[1 : 1 + H, 3 : 3 + W]
    h = jnp.clip((h1 + 16) >> 5, 0, 255)

    # j: vertical 6-tap over b1 intermediates (rows y-2..y+3 of b1_rows).
    j1 = vfilter(b1_rows)[1 : 1 + H, 1 : 1 + W]
    j = jnp.clip((j1 + 512) >> 10, 0, 255)
    return b, h, j


def subpel_value(win_g, win_b, win_h, win_j, dx: int, dy: int):
    """Predicted 16x16 block for a quarter-pel offset (dx, dy) in [-3, 3].

    win_*: (N, 18, 18) windows whose [1, 1] element is the full-pel base
    position. Static dx/dy — all slicing is compile-time.
    """
    ox = 1 + (dx >> 2)  # arithmetic shift: floor division by 4
    oy = 1 + (dy >> 2)
    xf = dx & 3
    yf = dy & 3

    def g(px=0, py=0):
        return win_g[:, oy + py : oy + py + 16, ox + px : ox + px + 16]

    def b(px=0, py=0):
        return win_b[:, oy + py : oy + py + 16, ox + px : ox + px + 16]

    def h(px=0, py=0):
        return win_h[:, oy + py : oy + py + 16, ox + px : ox + px + 16]

    def j():
        return win_j[:, oy : oy + 16, ox : ox + 16]

    def avg(a, bb):
        return (a + bb + 1) >> 1

    table = {
        (0, 0): lambda: g(),
        (1, 0): lambda: avg(g(), b()),
        (2, 0): lambda: b(),
        (3, 0): lambda: avg(b(), g(px=1)),
        (0, 1): lambda: avg(g(), h()),
        (1, 1): lambda: avg(b(), h()),
        (2, 1): lambda: avg(b(), j()),
        (3, 1): lambda: avg(b(), h(px=1)),
        (0, 2): lambda: h(),
        (1, 2): lambda: avg(h(), j()),
        (2, 2): lambda: j(),
        (3, 2): lambda: avg(j(), h(px=1)),
        (0, 3): lambda: avg(h(), g(py=1)),
        (1, 3): lambda: avg(h(), b(py=1)),
        (2, 3): lambda: avg(j(), b(py=1)),
        (3, 3): lambda: avg(h(px=1), b(py=1)),
    }
    return table[(xf, yf)]()
