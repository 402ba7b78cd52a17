"""Multi-process GOP dispatch: spawned JAX workers with a shared
compilation cache must produce AUs byte-identical to a sequential session
(the cross-host embodiment of GOP independence; see gop_dispatch_mp.py)."""

import numpy as np
import pytest

from media_tpu.utils import yuv


@pytest.mark.slow
def test_multiprocess_dispatch_byte_identical():
    from media_tpu.parallel.gop_dispatch_mp import dispatch_multiprocess
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession

    w, h, gop, ngops = 64, 48, 3, 2
    rng = np.random.default_rng(4)
    frames = []
    for _ in range(gop * ngops):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 90, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        frames.append(yuv.pack_i420(y, u, v))

    cfg_kwargs = dict(width=w, height=h, qp=30, gop_size=gop)
    aus, report = dispatch_multiprocess(
        cfg_kwargs, frames, gop, n_procs=2, use_distributed=False,
        prewarm=False)
    assert report.n_procs == 2
    assert len(aus) == len(frames)

    seq = []
    sess = EncoderSession(EncoderConfig(**cfg_kwargs))
    for g in range(ngops):
        sess.idr_pic_id = g & 0xFFFF
        sess.recon = None
        sess.frame_idx = 0
        seq.extend(sess.encode_frames(frames[g * gop : (g + 1) * gop]))
    assert [len(a) for a in aus] == [len(a) for a in seq]
    assert all(a == b for a, b in zip(aus, seq))
