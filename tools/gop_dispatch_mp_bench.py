#!/usr/bin/env python
"""Multi-process GOP dispatch dryrun: 2 OS processes, shared compilation
cache with parent pre-warm, optional jax.distributed coordination. Verifies
byte-identity with a sequential session and writes GOP_DISPATCH_MP.json
with warm-wall scaling efficiency (the round-3 ask: >= 80% of ideal on CPU
once the per-worker compile tax is removed).

Usage: python tools/gop_dispatch_mp_bench.py [W H GOPSIZE NGOPS NPROCS]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.float64)
    for _ in range(3):
        big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) / 3
    big = (big - big.min()) / (big.max() - big.min() + 1e-9) * 210 + 20
    from media_tpu.utils import yuv

    frames = []
    for t in range(n):
        y = big[t % 32 : t % 32 + h, (2 * t) % 32 : (2 * t) % 32 + w]
        y = y.round().clip(0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
        frames.append(yuv.pack_i420(y, u, v))
    return frames


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    gop = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ngops = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    nprocs = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from media_tpu.parallel.gop_dispatch_mp import dispatch_multiprocess

    cfg_kwargs = dict(width=w, height=h, qp=30, gop_size=gop, deblock=True)
    frames = clip(w, h, gop * ngops)

    aus, report = dispatch_multiprocess(cfg_kwargs, frames, gop, nprocs)

    # Byte-identity vs a sequential session with per-GOP idr_pic_id seeding.
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession

    seq = []
    t_seq = time.perf_counter()
    sess = EncoderSession(EncoderConfig(**cfg_kwargs))
    for g in range(ngops):
        sess.idr_pic_id = g & 0xFFFF
        sess.recon = None
        sess.frame_idx = 0
        seq.extend(sess.encode_frames(frames[g * gop : (g + 1) * gop]))
    seq_wall = time.perf_counter() - t_seq
    identical = len(aus) == len(seq) and all(a == b for a, b in zip(aus, seq))

    doc = {
        "config": f"{w}x{h} gop={gop} ngops={ngops} nprocs={nprocs} CQ30",
        "byte_identical_to_sequential": identical,
        "jax_distributed_initialized": report.distributed,
        "prewarm_s": round(report.prewarm_s, 2),
        "wall_s": round(report.wall_s, 2),
        "warm_wall_s": round(report.warm_wall_s, 2),
        "sequential_wall_s_same_process": round(seq_wall, 2),
        "compute_s_total": round(report.compute_s_total, 2),
        "scaling_efficiency_warm": round(report.scaling_efficiency, 3),
        "per_gop": [
            {"gop": g.gop_index, "worker": g.worker,
             "compute_s": round(g.compute_s, 2), "bytes": g.bytes_out}
            for g in report.gops
        ],
        "note": ("2 spawn'd JAX processes, shared persistent compilation "
                 "cache pre-warmed by a sacrificial process; "
                 "jax.distributed coordination service when available. "
                 "Efficiency = (sum worker compute / nprocs) / warm wall."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GOP_DISPATCH_MP.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("byte_identical_to_sequential",
                       "jax_distributed_initialized", "prewarm_s",
                       "warm_wall_s", "compute_s_total",
                       "scaling_efficiency_warm")}))
    print("wrote", path)


if __name__ == "__main__":
    main()
