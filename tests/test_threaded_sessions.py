"""Concurrent-session stress: two encoder sessions (and two decoders) on
separate threads must behave exactly like serial runs.

The reference's cautionary tale is its unguarded dlsym-table globals
(VideoEncoderNetint.cpp:277-287, SURVEY.md §5); this framework keeps
backend state per-session and guards the native loader/ParamStore with
locks — this test is the regression net for that claim."""

import threading

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # concurrent jit compiles dominate on 2 CPUs

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def _clip(w, h, n, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.float64)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    out = []
    for t in range(n):
        y = base[t : t + h, t : t + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 60).astype(np.uint8)
        out.append(yuv.pack_i420(y, u, v))
    return out


def test_two_encoder_sessions_threaded_byte_identical():
    w, h = 64, 48
    cfgs = [
        EncoderConfig(width=w, height=h, qp=26, gop_size=30, deblock=True),
        EncoderConfig(width=w, height=h, qp=32, gop_size=2, deblock=False,
                      i4x4=True),
    ]
    clips = [_clip(w, h, 5, 1), _clip(w, h, 5, 2)]

    # Serial golden runs.
    golden = []
    for cfg, clip in zip(cfgs, clips):
        s = EncoderSession(EncoderConfig(**vars(cfg)))
        golden.append([s.encode_frame(b) for b in clip])

    results = [None, None]
    errors = []

    def worker(i):
        try:
            s = EncoderSession(EncoderConfig(**vars(cfgs[i])))
            results[i] = [s.encode_frame(b) for b in clips[i]]
        except Exception as e:  # surfaced below
            errors.append((i, repr(e)))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors, errors
    for i in range(2):
        assert results[i] is not None, "worker hung"
        assert results[i] == golden[i], f"session {i} diverged under threads"


def test_two_decoder_sessions_threaded():
    w, h = 64, 48
    clip = _clip(w, h, 4, 3)
    s = EncoderSession(EncoderConfig(width=w, height=h, qp=28, gop_size=30))
    stream = b"".join(s.encode_frame(b) for b in clip)
    golden = [f.y.copy() for f in ReferenceDecoder().decode_annexb(stream)]

    outs = [None, None]
    errors = []

    def worker(i):
        try:
            outs[i] = [f.y.copy()
                       for f in ReferenceDecoder().decode_annexb(stream)]
        except Exception as e:
            errors.append((i, repr(e)))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors, errors
    for i in range(2):
        assert outs[i] is not None
        assert len(outs[i]) == len(golden)
        for a, b in zip(outs[i], golden):
            np.testing.assert_array_equal(a, b)
