"""IPPP GOP round trip: encoder (I + P frames, full-pel ME) vs the scalar
reference decoder — bit-exact reconstruction match across the GOP."""

import numpy as np
import pytest

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def moving_scene(w, h, t, seed=0):
    """Textured background translating by t pixels + a moving square."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.uint8)
    # Smooth the noise so motion search has gradients to lock onto.
    big = (big.astype(np.int32) + np.roll(big, 1, 0) + np.roll(big, 1, 1) +
           np.roll(big, 2, 0) + np.roll(big, 2, 1)) // 5
    dx, dy = (3 * t) % 16, (2 * t) % 16
    y = big[dy : dy + h, dx : dx + w].astype(np.uint8).copy()
    bx = (10 + 5 * t) % max(w - 20, 1)
    y[h // 3 : h // 3 + 12, bx : bx + 12] = 230
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    u[(h // 8 + t) % (h // 4) :, :] = 90
    return y, u, v


@pytest.mark.parametrize("qp", [24, 32])
def test_ippp_roundtrip(qp):
    w, h = 128, 96
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=qp, gop_size=8))
    dec = ReferenceDecoder()
    sizes = []
    for t in range(4):
        y, u, v = moving_scene(w, h, t)
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        sizes.append(len(au))
        frames = dec.decode_annexb(au)
        assert len(frames) == 1
        f = frames[0]
        assert f.idr == (t == 0)
        np.testing.assert_array_equal(f.y, sess.recon[0], err_msg=f"frame {t} Y")
        np.testing.assert_array_equal(f.u, sess.recon[1], err_msg=f"frame {t} U")
        np.testing.assert_array_equal(f.v, sess.recon[2], err_msg=f"frame {t} V")
        assert yuv.psnr(f.y, y) > (34 if qp == 24 else 28), t
    # P frames must be much smaller than the IDR.
    assert max(sizes[1:]) < sizes[0], sizes


def test_static_scene_mostly_skip():
    w, h = 128, 96
    y, u, v = moving_scene(w, h, 0)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28, gop_size=10))
    dec = ReferenceDecoder()
    au0 = sess.encode_frame(yuv.pack_i420(y, u, v))
    dec.decode_annexb(au0)
    au1 = sess.encode_frame(yuv.pack_i420(y, u, v))  # identical frame
    f = dec.decode_annexb(au1)[0]
    np.testing.assert_array_equal(f.y, sess.recon[0])
    # A static P frame should collapse to a few dozen bytes of skips.
    assert len(au1) < len(au0) // 20, (len(au0), len(au1))


def test_forced_keyframe_midstream():
    w, h = 64, 48
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=26, gop_size=100))
    dec = ReferenceDecoder()
    for t in range(2):
        y, u, v = moving_scene(w, h, t, seed=5)
        dec.decode_annexb(sess.encode_frame(yuv.pack_i420(y, u, v)))
    sess.force_keyframe()
    y, u, v = moving_scene(w, h, 2, seed=5)
    au = sess.encode_frame(yuv.pack_i420(y, u, v))
    f = dec.decode_annexb(au)[0]
    assert f.idr
    np.testing.assert_array_equal(f.y, sess.recon[0])


def test_batched_gop_matches_sequential():
    """encode_frames (GOP-batched device scan) must produce byte-identical
    bitstreams to frame-by-frame encode_frame calls."""
    w, h = 128, 96
    bufs = []
    for t in range(5):
        y, u, v = moving_scene(w, h, t, seed=9)
        bufs.append(yuv.pack_i420(y, u, v))

    s1 = EncoderSession(EncoderConfig(width=w, height=h, qp=28, gop_size=4))
    seq = [s1.encode_frame(b) for b in bufs]
    s2 = EncoderSession(EncoderConfig(width=w, height=h, qp=28, gop_size=4))
    batched = s2.encode_frames(bufs)
    assert len(batched) == len(seq)
    for t, (a, b) in enumerate(zip(seq, batched)):
        assert a == b, f"frame {t} differs (len {len(a)} vs {len(b)})"
    # And the stream decodes bit-exact.
    dec = ReferenceDecoder()
    frames = dec.decode_annexb(b"".join(batched))
    assert len(frames) == 5
    np.testing.assert_array_equal(frames[-1].y, np.asarray(s2.recon[0]))
