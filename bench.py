#!/usr/bin/env python
"""Benchmark: 1080p encode throughput per chip (full pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: OpenH264 single-core software encode at 1080p — the reference
framework's CPU path (SURVEY.md §6: the reference publishes no numbers, so the
effective baseline is OpenH264 itself). Single-core x86 OpenH264 at 1080p
high-motion runs ~30 fps; vs_baseline = our_fps / 30.

Runs on whatever JAX platform the ambient environment provides (the real TPU
chip under the driver). MEDIA_TPU_BENCH_{W,H,FRAMES,QP} override for local
smoke runs.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_FPS = 30.0  # OpenH264 single-core 1080p (see module docstring)


def synthetic_video(w, h, n, seed=0):
    """Moving textured scene: global pan + local object motion + light noise."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 128, w + 128)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, 2, 0) + np.roll(big, 2, 1)) // 5
    frames = []
    for t in range(n):
        dx, dy = (3 * t) % 64, (2 * t) % 64
        y = big[dy : dy + h, dx : dx + w].astype(np.uint8).copy()
        bx = (40 + 11 * t) % max(w - 80, 1)
        by = (30 + 7 * t) % max(h - 80, 1)
        y[by : by + 64, bx : bx + 64] = ((y[by : by + 64, bx : bx + 64].astype(np.int32) + 90) % 256).astype(np.uint8)
        u = ((big[dy : dy + h : 2, dx : dx + w : 2] // 2) + 40).astype(np.uint8)
        v = ((big[dy : dy + h : 2, dx : dx + w : 2] // 3) + 70).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
    from media_tpu.utils import yuv

    w = int(os.environ.get("MEDIA_TPU_BENCH_W", 1920))
    h = int(os.environ.get("MEDIA_TPU_BENCH_H", 1080))
    n = int(os.environ.get("MEDIA_TPU_BENCH_FRAMES", 12))
    qp = int(os.environ.get("MEDIA_TPU_BENCH_QP", 30))

    frames = synthetic_video(w, h, 2 * n + 1)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=qp, gop_size=300))

    # Warm-up: compile the IDR path and the batched-P path at batch size n.
    sess.encode_frame(yuv.pack_i420(*frames[0]))
    warm = [yuv.pack_i420(y, u, v) for y, u, v in frames[1 : 1 + n]]
    sess.encode_frames(warm)

    bufs = [yuv.pack_i420(y, u, v) for y, u, v in frames[1 + n : 1 + 2 * n]]
    t0 = time.perf_counter()
    aus = sess.encode_frames(bufs)
    elapsed = time.perf_counter() - t0
    total_bytes = sum(len(a) for a in aus)
    fps = n / elapsed

    psnr = yuv.psnr(np.asarray(sess.recon[0])[:h, :w], frames[2 * n][0])
    print(
        json.dumps(
            {
                "metric": f"encode_fps_{h}p_qp{qp}_psnr{psnr:.1f}dB_{total_bytes * 8 // n // 1000}kbpf",
                "value": round(fps, 3),
                "unit": "fps/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        ),
        flush=True,
    )
    os._exit(0)  # skip the TPU plugin's slow interpreter teardown


if __name__ == "__main__":
    main()
