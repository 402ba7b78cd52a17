#!/usr/bin/env python
"""Host-side phase timing of the bench path: upload / dispatch / download / merge."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    w, h, k = 1920, 1080, 8
    qp = 30
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synthetic_video
    from media_tpu.ops.transform import chroma_qp
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
    from media_tpu.pipeline.encoder import FrameEncoder
    from media_tpu.utils import yuv

    frames = synthetic_video(w, h, k + 1)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=qp, gop_size=300))
    enc = sess._frame_encoder

    t0 = time.perf_counter()
    sess.encode_frame(yuv.pack_i420(*frames[0]))
    print(f"IDR encode+entropy (compile incl): {time.perf_counter()-t0:.2f}s")

    planes = [
        (yuv.pad_to_mb_grid(f[0], 16), yuv.pad_to_mb_grid(f[1], 8),
         yuv.pad_to_mb_grid(f[2], 8)) for f in frames[1:]
    ]
    ys = np.stack([p[0] for p in planes])
    us = np.stack([p[1] for p in planes])
    vs = np.stack([p[2] for p in planes])
    print(f"upload payload: {(ys.nbytes+us.nbytes+vs.nbytes)/1e6:.1f} MB, "
          f"stream cap {enc.cap_words*4/1e6:.2f} MB/frame")

    # Warm compile
    t0 = time.perf_counter()
    streams, bits, recon = enc.encode_pframes_packed(
        ys, us, vs, *sess.recon, qp, deblock=True)
    print(f"first packed batch (compile): {time.perf_counter()-t0:.2f}s")

    for trial in range(2):
        t0 = time.perf_counter()
        dy = jax.device_put(ys)
        du = jax.device_put(us)
        dv = jax.device_put(vs)
        jax.block_until_ready((dy, du, dv))
        t1 = time.perf_counter()
        qp_c = int(chroma_qp(qp))
        st, bt, rc = enc._encode_pbatch_packed_device(
            dy, du, dv, *sess.recon, jnp.int32(qp), jnp.int32(qp_c), 8, True)
        jax.block_until_ready((st, bt))
        t2 = time.perf_counter()
        bits_np = np.asarray(bt)
        t3 = time.perf_counter()
        st_np = np.asarray(st)
        t4 = time.perf_counter()
        aus = [sess._pslice_au_packed(st_np[j], int(bits_np[j])) for j in range(k)]
        t5 = time.perf_counter()
        print(f"trial{trial}: upload {t1-t0:.3f}s  dispatch+sync {t2-t1:.3f}s  "
              f"bits dl {t3-t2:.3f}s  streams dl {t4-t3:.3f}s  "
              f"merge {t5-t4:.3f}s  total {t5-t0:.3f}s "
              f"({k/(t5-t0):.2f} fps)")
        print(f"  actual bits/frame: {bits_np.tolist()}")
    os._exit(0)


if __name__ == "__main__":
    main()
