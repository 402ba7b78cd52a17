"""Lossless (all-I_PCM) mode: bit-exact round trips through the in-repo
reference decoder, including non-MB-aligned sizes and multi-slice frames.

The independent-ffmpeg check lives in test_conformance.py
(test_lossless_roundtrip_ffmpeg_exact); this file is the fast CPU tier.
"""

import numpy as np
import pytest

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("size", [(64, 48), (50, 34)])
def test_lossless_ref_decoder_exact(size):
    w, h = size
    frames = _frames(w, h, 3)
    sess = EncoderSession(EncoderConfig(width=w, height=h, lossless=True))
    dec = ReferenceDecoder()
    for y, u, v in frames:
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        got = dec.decode_annexb(au)
        assert len(got) == 1 and got[0].idr
        np.testing.assert_array_equal(got[0].y[:h, :w], y)
        np.testing.assert_array_equal(got[0].u[: h // 2, : w // 2], u)
        np.testing.assert_array_equal(got[0].v[: h // 2, : w // 2], v)


def test_lossless_multislice_exact():
    w, h = 64, 96
    frames = _frames(w, h, 2, seed=3)
    sess = EncoderSession(EncoderConfig(width=w, height=h, lossless=True,
                                        num_slices=3))
    dec = ReferenceDecoder()
    for y, u, v in frames:
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        got = dec.decode_annexb(au)
        assert len(got) == 1
        np.testing.assert_array_equal(got[0].y, y)
        np.testing.assert_array_equal(got[0].u, u)
        np.testing.assert_array_equal(got[0].v, v)


def test_lossless_worst_case_epb():
    """All-zero and all-0x01 planes maximize emulation-prevention insertion;
    the escape/unescape pair must stay exact."""
    w, h = 48, 32
    dec = ReferenceDecoder()
    for fill in (0, 1, 2, 3, 255):
        sess = EncoderSession(EncoderConfig(width=w, height=h, lossless=True))
        y = np.full((h, w), fill, np.uint8)
        u = np.full((h // 2, w // 2), fill, np.uint8)
        v = np.full((h // 2, w // 2), fill, np.uint8)
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        got = dec.decode_annexb(au)
        np.testing.assert_array_equal(got[0].y, y)
        np.testing.assert_array_equal(got[0].u, u)
        np.testing.assert_array_equal(got[0].v, v)
