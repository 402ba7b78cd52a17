"""encode_frames_staged (pre-uploaded input) must emit byte-identical AUs
to encode_frames on the same frames — the staged path only moves the
host->device copy out of the encode loop, never changes the bitstream."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.utils import yuv


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 8, w + 8)).astype(np.uint8)
    out = []
    for t in range(n):
        y = base[t % 8 : t % 8 + h, t % 8 : t % 8 + w]
        u = (y[::2, ::2] // 2 + 30).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 60).astype(np.uint8)
        out.append(yuv.pack_i420(y, u, v))
    return out


def test_staged_matches_streamed():
    w, h, n = 128, 96, 6
    frames = _frames(w, h, 1 + n)
    cfg = dict(width=w, height=h, qp=30, gop_size=100, entropy_mode="device")

    a = EncoderSession(EncoderConfig(**cfg))
    a.encode_frame(frames[0])
    ref = a.encode_frames(frames[1:])

    b = EncoderSession(EncoderConfig(**cfg))
    b.encode_frame(frames[0])
    chunks = b.upload_frames(frames[1:])
    got = b.encode_frames_staged(chunks)

    assert len(got) == len(ref)
    for x, y_ in zip(got, ref):
        assert x == y_


def test_staged_guards():
    w, h = 64, 48
    frames = _frames(w, h, 3)
    s = EncoderSession(EncoderConfig(width=w, height=h, qp=30, gop_size=2,
                                     entropy_mode="device"))
    with pytest.raises(RuntimeError):  # no reference yet
        s.encode_frames_staged(s.upload_frames(frames[:1]))
    s.encode_frame(frames[0])
    with pytest.raises(RuntimeError):  # IDR due inside the run (gop 2)
        s.encode_frames_staged(s.upload_frames(frames[1:]))
