"""B-frame skeleton: fast CPU round-trips through the in-repo decoder.

The ffmpeg bit-exactness check lives in test_conformance.py
(test_bframes_ffmpeg_exact)."""

import numpy as np
import pytest

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 40, w + 40)).astype(np.float64)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    out = []
    for t in range(n):
        y = base[t : t + h, 2 * t : 2 * t + w]
        y = ((y - y.min()) / (base.max() - base.min() + 1e-9) * 200
             + 20).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 60).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_bgop_roundtrip_and_order():
    w, h = 64, 48
    frames = _frames(w, h, 7)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28,
                                        gop_size=30, deblock=False,
                                        b_frames=1))
    aus = sess.encode_frames([yuv.pack_i420(*f) for f in frames])
    assert len(aus) == len(frames)
    got = ReferenceDecoder().decode_annexb(b"".join(aus))
    assert len(got) == len(frames)
    # Coding order: I, P(d=2), B(d=1), P(d=4), B(d=3), ...
    assert [f.poc for f in got] == [0, 4, 2, 8, 6, 12, 10]
    disp = sorted(got, key=lambda f: f.poc)
    for i, f in enumerate(disp):
        mse = np.mean((f.y.astype(float) - frames[i][0]) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 28, (i, psnr)


def test_bgop_api_decoder_fallback():
    """A B stream through the public VideoDecoder must route to the scalar
    decoder (TPU path refuses POC-type-0 streams on the first slice) and
    produce every frame."""
    from media_tpu.api.decoder_api import CodecFormat, DecoderRetCode, VideoDecoder

    w, h = 64, 48
    frames = _frames(w, h, 5, seed=2)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28,
                                        gop_size=30, b_frames=1,
                                        deblock=False))
    aus = sess.encode_frames([yuv.pack_i420(*f) for f in frames])
    dec = VideoDecoder()
    assert dec.create_decoder(CodecFormat.H264) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.init_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
    dec.set_decode_params(width=w, height=h)
    assert dec.start_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
    n_out = 0
    for au in aus:
        dec.send_stream_data(au)
        while True:
            rc, payload, info = dec.retrieve_frame_data()
            if rc != DecoderRetCode.VIDEO_DECODER_SUCCESS:
                break
            n_out += 1
    dec.send_stream_data(b"")  # EOS
    while True:
        rc, payload, info = dec.retrieve_frame_data()
        if rc != DecoderRetCode.VIDEO_DECODER_SUCCESS:
            break
        n_out += 1
    assert n_out == len(frames)
