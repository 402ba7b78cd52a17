"""Motion-vector prediction shared by encoder entropy stage and decoders.

Median MV prediction for 16x16 partitions (spec 8.4.1.3) and the P_Skip
motion inference rule (spec 8.4.1.1). Both sides of the codec must apply
identical rules, so they live in one place.

`mv_map` maps (mb_row, mb_col) -> (mvx, mvy) for macroblocks that are
inter-coded; intra MBs are absent (their refIdx is -1, so they contribute a
zero MV to the median but never trigger the skip zero-rule).
"""

from __future__ import annotations


def median3(a, b, c):
    return max(min(a, b), min(max(a, b), c))


def predict_mv(mv_map, r: int, c: int, n_cols: int):
    """Median MV predictor for the 16x16 partition at MB (r, c)."""
    a = mv_map.get((r, c - 1)) if c > 0 else None
    b = mv_map.get((r - 1, c)) if r > 0 else None
    cc = mv_map.get((r - 1, c + 1)) if (r > 0 and c + 1 < n_cols) else None
    c_avail = r > 0 and c + 1 < n_cols
    if not c_avail and r > 0 and c > 0:
        cc = mv_map.get((r - 1, c - 1))  # D substitutes for C
        c_avail = True
    a_avail = c > 0
    b_avail = r > 0
    if a_avail and not b_avail and not c_avail:
        return a if a is not None else (0, 0)
    va = a if a is not None else (0, 0)
    vb = b if b is not None else (0, 0)
    vc = cc if cc is not None else (0, 0)
    return (
        median3(va[0], vb[0], vc[0]),
        median3(va[1], vb[1], vc[1]),
    )


def skip_mv(mv_map, r: int, c: int, n_cols: int):
    """MV inferred for a P_Skip macroblock (spec 8.4.1.1)."""
    if r == 0 or c == 0:
        return (0, 0)
    a = mv_map.get((r, c - 1))
    b = mv_map.get((r - 1, c))
    if (a is not None and a == (0, 0)) or (b is not None and b == (0, 0)):
        return (0, 0)
    return predict_mv(mv_map, r, c, n_cols)
