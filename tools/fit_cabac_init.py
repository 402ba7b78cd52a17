#!/usr/bin/env python
"""Fit CABAC context-init tables from this encoder's own bin statistics.

Provenance strategy (PARITY.md deviation; VERDICT round-2 item 3): the spec's
Tables 9-12..9-33 cannot be verified here, so each context's (m, n) is fit
from measured bin statistics:

  1. Encode three content classes — (0) static/low-motion, (1) high-motion
     pan, (2) dense texture — at QPs {22, 28, 34, 40}, counting
     (ctxIdx, bin) occurrences in the CABAC encoder.
  2. Convert each context's measured P(bin=1 | qp) into the spec's
     preCtxState domain: the engine's 64 LPS states follow
     pLPS(s) ~= 0.5 * alpha^s with alpha = (0.01875 / 0.5)^(1/63), so
     preCtxState = 64 + s for valMPS=1 and 63 - s for valMPS=0.
  3. Least-squares fit preCtxState(qp) = ((m * qp) >> 4) + n per context.

I slices get one table (fit pooled over classes — the spec has a single I
table); P slices get one table per class, selected by cabac_init_idc.
Contexts with too few observations keep the uniform (0, 64) init.

Writes media_tpu/entropy/cabac_init_fitted.py (an RD-experiment artifact;
the CODEC ships the normative spec tables in cabac_init_tables.py — do NOT
overwrite them: they are third-party-validated).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

from media_tpu.entropy import cabac_slice
from media_tpu.entropy.cabac_contexts import NUM_CTX
from media_tpu.pipeline.encoder import FrameEncoder
from media_tpu.pipeline.pframe_core import unpack_symbols

QPS = [22, 28, 34, 40]
W, H = 176, 144
N_P = 6  # P frames per (class, qp)
ALPHA = (0.01875 / 0.5) ** (1.0 / 63.0)
MIN_BINS = 200  # below this, keep the uniform init


def make_class(cls, n, seed=7):
    """Frames (y, u, v) for a content class."""
    rng = np.random.default_rng(seed + cls)
    big = rng.integers(0, 256, (H + 96, W + 96)).astype(np.float64)
    passes = {0: 4, 1: 3, 2: 0}[cls]  # texture density via low-passing
    for _ in range(passes):
        big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
               + np.roll(big, 2, 0) + np.roll(big, 2, 1)) / 5
    big = ((big - big.min()) / (big.max() - big.min() + 1e-9) * 220 + 16)
    step = {0: 1, 1: 7, 2: 3}[cls]  # motion magnitude
    frames = []
    for t in range(n):
        dx, dy = (step * t) % 80, (step * t // 2) % 80
        y = big[dy : dy + H, dx : dx + W]
        if cls == 0:  # static: tiny noise only
            y = y + rng.normal(0, 0.7, y.shape)
        y = y.round().clip(0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
        frames.append((y.astype(np.int32), u.astype(np.int32),
                       v.astype(np.int32)))
    return frames


def collect(cls):
    """Returns {qp: (stats_i, stats_p)} with (NUM_CTX, 2) counts."""
    enc = FrameEncoder(W, H)
    out = {}
    frames = make_class(cls, N_P + 1)
    for qp in QPS:
        stats_i = np.zeros((NUM_CTX, 2), np.int64)
        stats_p = np.zeros((NUM_CTX, 2), np.int64)
        ir = enc.encode_iframe(*frames[0], qp)
        cabac_slice.write_islice_cabac(
            ir.mode16, ir.chroma_mode, ir.dc_levels, ir.ac_levels,
            ir.cdc_levels, ir.cac_levels, qp, stats=stats_i)
        recon = (ir.recon_y, ir.recon_u, ir.recon_v)
        for t in range(1, N_P + 1):
            pr = enc.encode_pframe(*frames[t], *recon, qp)
            recon = (pr.recon_y, pr.recon_u, pr.recon_v)
            cabac_slice.write_pslice_cabac(
                pr.mv, pr.luma_levels, pr.cdc_levels, pr.cac_levels, qp,
                stats=stats_p)
        out[qp] = (stats_i, stats_p)
        print(f"  class {cls} qp {qp}: I bins {int(stats_i.sum())}, "
              f"P bins {int(stats_p.sum())}")
    return out


def pre_state_of(p1):
    """Measured P(bin=1) -> preCtxState (spec 9.3.1.1 domain)."""
    if p1 >= 0.5:
        plps = np.clip(1.0 - p1, 0.01875, 0.5)
        s = np.clip(np.log(plps / 0.5) / np.log(ALPHA), 0, 62)
        return 64.0 + s
    plps = np.clip(p1, 0.01875, 0.5)
    s = np.clip(np.log(plps / 0.5) / np.log(ALPHA), 0, 62)
    return 63.0 - s


def fit_table(per_qp_stats):
    """per_qp_stats: {qp: (NUM_CTX, 2) counts} -> (NUM_CTX, 2) (m, n)."""
    tbl = np.zeros((NUM_CTX, 2), np.int64)
    tbl[:, 1] = 64
    for i in range(NUM_CTX):
        xs, ys, ws = [], [], []
        for qp, st in per_qp_stats.items():
            tot = st[i].sum()
            if tot < MIN_BINS:
                continue
            p1 = st[i, 1] / tot
            xs.append(qp)
            ys.append(pre_state_of(p1))
            ws.append(np.sqrt(tot))
        if len(xs) >= 2:
            a, b = np.polyfit(xs, ys, 1, w=ws)
            m = int(np.clip(round(a * 16), -127, 127))
            # n chosen so the fit is exact at the mid QP (the >>4 floors).
            qp_mid = int(np.median(xs))
            n = int(np.clip(round(np.polyval([a, b], qp_mid)
                                  - ((m * qp_mid) >> 4)), -128, 255))
            tbl[i] = (m, n)
        elif len(xs) == 1:
            tbl[i] = (0, int(np.clip(round(ys[0]), 1, 126)))
    return tbl


def main():
    per_class = []
    pooled_i = {qp: np.zeros((NUM_CTX, 2), np.int64) for qp in QPS}
    for cls in range(3):
        print(f"class {cls}:")
        st = collect(cls)
        per_class.append(st)
        for qp in QPS:
            pooled_i[qp] += st[qp][0]
    tbl_i = fit_table(pooled_i)
    tbls_p = [fit_table({qp: st[qp][1] for qp in QPS}) for st in per_class]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "media_tpu/entropy/cabac_init_fitted.py")
    try:
        with open(path) as f:
            head = f.read().split("# --- fitted data")[0].rstrip()
            # keep the docstring/header; regenerate the data section
            head = head[: head.index("NUM_CTX = 460") + len("NUM_CTX = 460")]
    except FileNotFoundError:
        head = ('"""Fitted CABAC init tables (RD experiment artifact; the codec\n'
                'ships the normative tables in cabac_init_tables.py)."""\n\n'
                "import numpy as np\n\nNUM_CTX = 460")

    def fmt(a):
        rows = ", ".join(f"({int(m)},{int(n)})" for m, n in a)
        return rows

    with open(path, "w") as f:
        f.write(head + "\n\n# --- fitted data (tools/fit_cabac_init.py) ---\n")
        f.write("_I = [" + fmt(tbl_i) + "]\n")
        for k in range(3):
            f.write(f"_P{k} = [" + fmt(tbls_p[k]) + "]\n")
        f.write(
            "\nINIT_MN_I = np.array(_I, np.int32)\n"
            "INIT_MN_P = np.array([_P0, _P1, _P2], np.int32)\n"
            "FITTED = True\n")
    n_fit = int((tbl_i[:, 0] != 0).sum() + sum(
        (t[:, 0] != 0).sum() for t in tbls_p))
    print(f"wrote {path} (contexts with nonzero slope: {n_fit})")


if __name__ == "__main__":
    main()
