"""CBR rate control: hit the bitrate target within tolerance, adapt QP, and
stay bit-exact decodable (per-frame QP in slice headers)."""

import numpy as np
import pytest

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def scene(w, h, t, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1) + np.roll(big, 2, 1)) // 4
    dx, dy = (3 * t) % 32, (2 * t) % 32
    y = big[dy : dy + h, dx : dx + w].astype(np.uint8)
    u = ((big[dy : dy + h : 2, dx : dx + w : 2] // 2) + 40).astype(np.uint8)
    v = ((big[dy : dy + h : 2, dx : dx + w : 2] // 3) + 70).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("bitrate", [400_000, 1_200_000])
def test_cbr_hits_target(bitrate):
    w, h, fps, n = 176, 144, 30, 24
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=bitrate, framerate=fps)
    sess = EncoderSession(cfg)
    bufs = [yuv.pack_i420(*scene(w, h, t)) for t in range(n)]
    aus = sess.encode_frames(bufs)
    total_bits = sum(len(a) * 8 for a in aus)
    # Judge on the P-frame steady state (exclude the one IDR).
    p_bits = sum(len(a) * 8 for a in aus[1:])
    per_frame_target = bitrate / fps
    avg_p = p_bits / (n - 1)
    assert 0.7 * per_frame_target < avg_p < 1.35 * per_frame_target, (
        bitrate, avg_p, per_frame_target)

    # The stream must still decode bit-exact against the session recon.
    dec = ReferenceDecoder()
    frames = dec.decode_annexb(b"".join(aus))
    assert len(frames) == n
    np.testing.assert_array_equal(frames[-1].y, np.asarray(sess.recon[0]))


def test_cbr_adapts_qp_to_content():
    w, h = 176, 144
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=600_000, framerate=30)
    sess = EncoderSession(cfg)
    # Static scene first: QP should drift down (cheap frames).
    y, u, v = scene(w, h, 0)
    for _ in range(8):
        sess.encode_frame(yuv.pack_i420(y, u, v))
    qp_static = sess.rc_state["qp"]
    # Then high-motion noise: QP must rise.
    for t in range(8):
        yn, un, vn = scene(w, h, 7 * t + 3, seed=t + 1)
        sess.encode_frame(yuv.pack_i420(yn, un, vn))
    qp_noise = sess.rc_state["qp"]
    assert qp_noise > qp_static, (qp_static, qp_noise)


def test_cbr_single_frame_path_matches_contract():
    w, h = 64, 48
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=10,
                        rc_mode="cbr", bitrate=300_000, framerate=30)
    sess = EncoderSession(cfg)
    dec = ReferenceDecoder()
    for t in range(4):
        au = sess.encode_frame(yuv.pack_i420(*scene(w, h, t)))
        f = dec.decode_annexb(au)[0]
        np.testing.assert_array_equal(f.y, np.asarray(sess.recon[0]))
    assert sess.frame_idx == 4


@pytest.mark.parametrize("bitrate", [500_000, 1_000_000])
def test_cbr_adaptive_qp_tight(bitrate):
    """Per-MB QP modulation (mb_qp_delta) realizes fractional QP: the CBR
    steady state tightens to +-15% of the per-frame target, and the stream
    still decodes bit-exact (reference decoder tracks the running QP)."""
    w, h, fps, n = 176, 144, 30, 24
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=bitrate, framerate=fps,
                        deblock=False, adaptive_qp=True)
    sess = EncoderSession(cfg)
    bufs = [yuv.pack_i420(*scene(w, h, t)) for t in range(n)]
    aus = sess.encode_frames(bufs)
    p_bits = sum(len(a) * 8 for a in aus[1:])
    per_frame_target = bitrate / fps
    avg_p = p_bits / (n - 1)
    assert 0.85 * per_frame_target < avg_p < 1.15 * per_frame_target, (
        bitrate, avg_p, per_frame_target)

    dec = ReferenceDecoder()
    frames = dec.decode_annexb(b"".join(aus))
    assert len(frames) == n
    np.testing.assert_array_equal(frames[-1].y, np.asarray(sess.recon[0]))
    np.testing.assert_array_equal(frames[-1].u, np.asarray(sess.recon[1]))


def test_cbr_adaptive_qp_with_deblock_roundtrip():
    """adaptive_qp composes with in-loop deblocking: the filter applies
    per-edge qPav thresholds (spec 8.7.2) from the decoder-visible QP map,
    and encoder recon stays bit-exact vs the reference decoder."""
    w, h, fps, n = 176, 144, 30, 12
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=700_000, framerate=fps,
                        deblock=True, adaptive_qp=True)
    sess = EncoderSession(cfg)
    bufs = [yuv.pack_i420(*scene(w, h, t)) for t in range(n)]
    aus = sess.encode_frames(bufs)
    dec = ReferenceDecoder()
    frames = dec.decode_annexb(b"".join(aus))
    assert len(frames) == n
    for f, got in ((frames[-1], sess.recon),):
        np.testing.assert_array_equal(f.y, np.asarray(got[0]))
        np.testing.assert_array_equal(f.u, np.asarray(got[1]))
        np.testing.assert_array_equal(f.v, np.asarray(got[2]))


@pytest.mark.parametrize("deblock", [False, True])
def test_tpu_decoder_adaptive_qp_stream(deblock):
    """The TPU decode path parses mb_qp_delta, dequantizes per MB and (with
    deblock) applies the per-edge qPav thresholds."""
    from media_tpu.pipeline.decoder_tpu import TpuDecoder

    w, h = 176, 144
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=600_000, framerate=30,
                        deblock=deblock, adaptive_qp=True)
    sess = EncoderSession(cfg)
    bufs = [yuv.pack_i420(*scene(w, h, t)) for t in range(6)]
    aus = sess.encode_frames(bufs)
    dec = TpuDecoder()
    for au in aus:
        frames = dec.decode_annexb(au)
    np.testing.assert_array_equal(frames[-1].y, np.asarray(sess.recon[0]))
    np.testing.assert_array_equal(frames[-1].v, np.asarray(sess.recon[2]))
