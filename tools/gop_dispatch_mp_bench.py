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
    rc = sys.argv[6] if len(sys.argv) > 6 else "cq"

    from media_tpu.parallel.gop_dispatch_mp import dispatch_multiprocess

    cfg_kwargs = dict(width=w, height=h, qp=30, gop_size=gop, deblock=True)
    if rc == "cbr":
        # Product-shaped config: CBR budgeting per GOP (each GOP is an
        # independent rate-control scope — reference sessions are
        # per-stream too).
        cfg_kwargs.update(rc_mode="cbr",
                          bitrate=max(1_000_000, w * h * 30 // 8),
                          framerate=30)
    frames = clip(w, h, gop * ngops)

    aus, report = dispatch_multiprocess(cfg_kwargs, frames, gop, nprocs,
                                        pin_cpus=True)

    # Byte-identity vs a sequential session with the same per-GOP resets.
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession

    seq = []
    # Warm the sequential session identically (outside its timed wall).
    sess = EncoderSession(EncoderConfig(**cfg_kwargs))
    sess.encode_frames(frames[:gop])
    sess.reset_gop_state(0)
    t_seq = time.perf_counter()
    for g in range(ngops):
        sess.reset_gop_state(g)
        t_g = time.perf_counter()
        seq.extend(sess.encode_frames(frames[g * gop : (g + 1) * gop]))
        print(f"# seq gop {g}: {time.perf_counter() - t_g:.2f}s", flush=True)
    seq_wall = time.perf_counter() - t_seq
    identical = len(aus) == len(seq) and all(a == b for a, b in zip(aus, seq))
    n_frames = gop * ngops

    # Per-core sequential baseline: one XLA CPU process already saturates
    # every core with intra-op threading, so the fair multi-host proxy on
    # one box pins the sequential run to the SAME core budget each worker
    # got (ncpu / nprocs).
    ncpu = os.cpu_count() or 1
    per = max(1, ncpu // nprocs)
    seq_wall_pinned = None
    try:
        old_aff = os.sched_getaffinity(0)
        os.sched_setaffinity(0, set(range(per)))
        sess.reset_gop_state(0)
        sess.encode_frames(frames[:gop])  # re-warm under the affinity
        t_seq = time.perf_counter()
        for g in range(ngops):
            sess.reset_gop_state(g)
            sess.encode_frames(frames[g * gop : (g + 1) * gop])
        seq_wall_pinned = time.perf_counter() - t_seq
        os.sched_setaffinity(0, old_aff)
    except (OSError, AttributeError):
        pass

    doc = {
        "config": f"{w}x{h} gop={gop} ngops={ngops} nprocs={nprocs} "
                  f"rc={rc}",
        "end_to_end": {
            # The round-4 critique: compute-sum efficiency oversold the
            # result. These are wall-clock throughputs: mp_warm excludes
            # only process startup + per-worker warmup (every worker
            # signalled ready); mp_total is everything including spawn.
            # Workers are pinned to disjoint core slices; the per-core
            # sequential baseline uses the same core budget one worker got
            # (a single XLA process otherwise saturates every core, so the
            # unpinned comparison measures core saturation, not dispatch).
            "fps_sequential_all_cores": round(n_frames / seq_wall, 3),
            "fps_sequential_per_core_budget": (
                round(n_frames / seq_wall_pinned, 3)
                if seq_wall_pinned else None),
            "fps_mp_warm_wall": round(n_frames / report.warm_wall_s, 3),
            "fps_mp_total_wall": round(n_frames / report.wall_s, 3),
            "speedup_vs_per_core_sequential": (
                round(seq_wall_pinned / report.warm_wall_s, 3)
                if seq_wall_pinned else None),
            "scaling_efficiency_per_core": (
                round(seq_wall_pinned / report.warm_wall_s / nprocs, 3)
                if seq_wall_pinned else None),
            "speedup_vs_all_core_sequential": round(
                seq_wall / report.warm_wall_s, 3),
        },
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
