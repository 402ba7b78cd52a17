#!/usr/bin/env python
"""End-to-end demo: encode synthetic I420 frames to H.264, decode with the
scalar reference decoder, report sizes and PSNR.

Usage: python examples/roundtrip_demo.py [WIDTH HEIGHT QP NFRAMES]
Runs on CPU by default (set MEDIA_TPU_PLATFORM=axon/tpu for real hardware).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("MEDIA_TPU_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession  # noqa: E402
from media_tpu.ref.decoder import ReferenceDecoder  # noqa: E402
from media_tpu.utils import yuv  # noqa: E402


def synthetic(w, h, t):
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 64 * np.sin((xx + 4 * t) / 11.0) * np.cos(yy / 7.0)).astype(np.uint8)
    rng = np.random.default_rng(t)
    y = np.clip(y.astype(np.int32) + rng.integers(-8, 9, y.shape), 0, 255).astype(np.uint8)
    u = (((xx[::2, ::2] + yy[::2, ::2]) // 4 + 64 + 2 * t) % 256).astype(np.uint8)
    v = (255 - u).astype(np.uint8)
    return y, u, v


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 352
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 288
    qp = int(sys.argv[3]) if len(sys.argv) > 3 else 28
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=qp, gop_size=30))
    dec = ReferenceDecoder()
    total_bits = 0
    for t in range(n):
        y, u, v = synthetic(w, h, t)
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        total_bits += len(au) * 8
        frames = dec.decode_annexb(au)
        f = frames[0]
        same = (
            np.array_equal(f.y[:h, :w], sess.recon[0][:h, :w])
            and np.array_equal(f.u, sess.recon[1])
            and np.array_equal(f.v, sess.recon[2])
        )
        print(
            f"frame {t}: {'IDR' if f.idr else 'P  '} {len(au):6d} bytes  "
            f"Y-PSNR {yuv.psnr(f.y[:h, :w], y):6.2f} dB  "
            f"decoder==encoder-recon: {same}"
        )
        if not same:
            raise SystemExit("MISMATCH: decoder disagrees with encoder reconstruction")
    print(f"total: {total_bits/8/1024:.1f} KiB for {n} frames {w}x{h} @ QP{qp}")


if __name__ == "__main__":
    main()
