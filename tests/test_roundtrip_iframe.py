"""End-to-end I-frame round trip: TPU-path encoder -> Annex-B bitstream ->
independent scalar reference decoder. The reference decoder's output must be
bit-exact with the encoder's own reconstruction, and PSNR vs the original must
be reasonable for the QP."""

import numpy as np
import pytest

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def synthetic_frame(width, height, seed=0, flavor="mixed"):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    if flavor == "gradient":
        y = ((xx * 255) // max(width - 1, 1) + yy // 3) % 256
    elif flavor == "noise":
        y = rng.integers(0, 256, (height, width))
    else:
        y = (128 + 64 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.int32)
        y[height // 4 : height // 2, width // 4 : width // 2] = rng.integers(
            0, 256, (height // 4, width // 4)
        )
    u = ((xx[::2, ::2] + yy[::2, ::2]) // 4 + 64) % 256
    v = (255 - u) % 256
    return (
        np.asarray(y, np.uint8),
        np.asarray(u, np.uint8),
        np.asarray(v, np.uint8),
    )


@pytest.mark.parametrize("qp", [20, 28, 38])
@pytest.mark.parametrize("flavor", ["gradient", "mixed"])
def test_iframe_roundtrip_qcif(qp, flavor):
    w, h = 176, 144
    y, u, v = synthetic_frame(w, h, flavor=flavor)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=qp, gop_size=1))
    stream = sess.encode_frame(yuv.pack_i420(y, u, v))

    dec = ReferenceDecoder()
    frames = dec.decode_annexb(stream)
    assert len(frames) == 1
    f = frames[0]
    assert f.idr

    # Decoder output must match the encoder's own reconstruction bit-exactly.
    np.testing.assert_array_equal(f.y, sess.recon[0])
    np.testing.assert_array_equal(f.u, sess.recon[1])
    np.testing.assert_array_equal(f.v, sess.recon[2])

    # And quality must be sane for the QP.
    p = yuv.psnr(f.y, y)
    min_psnr = {20: 38.0, 28: 32.0, 38: 24.0}[qp]
    assert p > min_psnr, (qp, p)


def test_iframe_roundtrip_noise_worstcase():
    w, h = 96, 80
    y, u, v = synthetic_frame(w, h, seed=3, flavor="noise")
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30, gop_size=1))
    stream = sess.encode_frame(yuv.pack_i420(y, u, v))
    f = ReferenceDecoder().decode_annexb(stream)[0]
    np.testing.assert_array_equal(f.y, sess.recon[0])
    np.testing.assert_array_equal(f.u, sess.recon[1])
    np.testing.assert_array_equal(f.v, sess.recon[2])


def test_iframe_odd_size_cropping():
    # 100x52 -> padded to 112x64 internally, crop window in SPS
    w, h = 100, 52
    y, u, v = synthetic_frame(w, h, seed=1)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=26, gop_size=1))
    stream = sess.encode_frame(yuv.pack_i420(y, u, v))
    dec = ReferenceDecoder()
    f = dec.decode_annexb(stream)[0]
    assert dec.sps.width == w and dec.sps.height == h
    # Compare on the visible window.
    assert yuv.psnr(f.y[:h, :w], y) > 30


def test_two_idr_frames_stream():
    w, h = 64, 48
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=26, gop_size=1))
    stream = b""
    originals = []
    for i in range(2):
        y, u, v = synthetic_frame(w, h, seed=i)
        originals.append((y, u, v))
        stream += sess.encode_frame(yuv.pack_i420(y, u, v))
    frames = ReferenceDecoder().decode_annexb(stream)
    assert len(frames) == 2
    for f, (y, u, v) in zip(frames, originals):
        assert yuv.psnr(f.y, y) > 30
