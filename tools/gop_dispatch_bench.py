#!/usr/bin/env python
"""GOP-dispatch scaling bench: encode N GOPs with 1 vs W workers.

Writes GOP_DISPATCH.json: wall times, per-GOP compute, bytes moved, and the
dispatch overhead fraction (the scheduler+stitch cost outside per-GOP
compute). On the shared-core CPU mesh workers contend for the same host, so
wall-clock cannot scale here — the quantitative claim this artifact backs is
that the DISPATCH layer costs <= a few percent (per-GOP compute dominates),
i.e. multi-host scaling is bounded by compute, not by this scheduler.

Usage: python tools/gop_dispatch_bench.py [W H n_gops gop_size workers]
"""

import json
import os
import sys

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


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    n_gops = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    gop = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    workers = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from media_tpu.parallel.gop_dispatch import GopDispatcher
    from media_tpu.pipeline.codec import EncoderConfig
    from media_tpu.utils import yuv

    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    frames = []
    for t in range(n_gops * gop):
        y = big[(2 * t) % 64 : (2 * t) % 64 + h,
                (3 * t) % 64 : (3 * t) % 64 + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
        frames.append(yuv.pack_i420(y, u, v))

    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=gop)
    out = {}
    for nw in (1, workers):
        d = GopDispatcher(cfg, n_workers=nw)
        aus = d.encode(frames)  # warm compile
        d2 = GopDispatcher(cfg, n_workers=nw)
        aus = d2.encode(frames)
        rep = d2.report.to_json()
        rep["fps"] = len(frames) / d2.report.wall_s
        out[f"workers_{nw}"] = rep
        d.close()
        d2.close()
        print(f"workers={nw}: wall {rep['wall_s']:.2f}s  "
              f"fps {rep['fps']:.2f}  overhead {rep['dispatch_overhead']:.3f}")

    out["note"] = ("CPU-mesh workers share one host's cores; wall scaling is "
                   "not expected here. dispatch_overhead is the claim: the "
                   "scheduler+stitch layer outside per-GOP compute.")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GOP_DISPATCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
