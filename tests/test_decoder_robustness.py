"""Round-3 decoder robustness: the TPU path decodes multi-slice and I_4x4
streams (everything this encoder emits), and the API survives a corrupt AU
with per-AU DECODE_FAIL instead of killing the session (the reference only
stops on transport errors, VideoDecoderNetint.cpp:591-594)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from media_tpu.api.decoder_api import VideoDecoder
from media_tpu.api.errors import DecoderRetCode
from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.pipeline.decoder_tpu import TpuDecoder
from media_tpu.utils import yuv


def make_frames(w, h, n, seed=1):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    out = []
    for t in range(n):
        y = big[2 * t : 2 * t + h, 3 * t : 3 * t + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
        out.append(yuv.pack_i420(y, u, v))
    return out


@pytest.mark.parametrize("across", [True, False])
def test_tpu_decoder_multislice(across):
    """Multi-slice pictures (both deblock idc 0 and 2) decode bit-exact on
    the TPU path — per-slice parse with slice-local neighbor rules, one
    device reconstruction per picture."""
    w, h = 128, 128
    frames = make_frames(w, h, 4)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=100, deblock=True,
                        num_slices=4, deblock_across_slices=across,
                        entropy_mode="host")
    s = EncoderSession(cfg)
    aus = s.encode_frames(frames)
    dec = TpuDecoder()
    out = []
    for au in aus:
        out += dec.decode_annexb(au)
    assert len(out) == len(frames)
    np.testing.assert_array_equal(out[-1].y, np.asarray(s.recon[0]))
    np.testing.assert_array_equal(out[-1].u, np.asarray(s.recon[1]))
    np.testing.assert_array_equal(out[-1].v, np.asarray(s.recon[2]))


def test_tpu_decoder_multislice_i4x4_cavlc():
    w, h = 128, 128
    frames = make_frames(w, h, 2, seed=3)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, deblock=True,
                        num_slices=2, i4x4=True, entropy_mode="host")
    s = EncoderSession(cfg)
    aus = s.encode_frames(frames)
    dec = TpuDecoder()
    out = []
    for au in aus:
        out += dec.decode_annexb(au)
    np.testing.assert_array_equal(out[-1].y, np.asarray(s.recon[0]))


def test_corrupt_au_keeps_session_alive():
    """A corrupt AU yields DECODE_FAIL but the session keeps decoding the
    following intact AUs (resync at the next IDR via saved headers)."""
    w, h = 96, 80
    frames = make_frames(w, h, 6, seed=5)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=3)
    s = EncoderSession(cfg)
    aus = s.encode_frames(frames)  # IDR P P IDR P P

    dec = VideoDecoder()
    assert dec.create_decoder(0) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.init_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.start_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
    dec.set_decode_params(width=w, height=h)

    # First GOP decodes (EOS-marker flush drains the leftover assembly).
    for au in aus[:3]:
        assert dec.send_stream_data(au) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.send_stream_data(b"") == DecoderRetCode.VIDEO_DECODER_SUCCESS
    got = 0
    while True:
        code, payload, _info = dec.retrieve_frame_data()
        if code != DecoderRetCode.VIDEO_DECODER_SUCCESS:
            break
        got += 1
    assert got == 3

    # Corrupt the 4th AU's slice payload: the parse error surfaces as
    # DECODE_FAIL at whichever send flushes those bytes out of the leftover
    # assembly (this one or the next), and the session stays alive.
    bad = bytearray(aus[3])
    bad[len(bad) // 2 :] = bytes(len(bad) - len(bad) // 2)
    code = dec.send_stream_data(bytes(bad))
    code2 = dec.send_stream_data(aus[3])
    assert DecoderRetCode.VIDEO_DECODER_DECODE_FAIL in (code, code2)

    # After recovery the next intact IDR resumes decoding.
    assert dec.send_stream_data(aus[3]) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    for au in aus[4:]:
        assert dec.send_stream_data(au) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.send_stream_data(b"") == DecoderRetCode.VIDEO_DECODER_SUCCESS
    got2 = 0
    while True:
        code, payload, _info = dec.retrieve_frame_data()
        if code != DecoderRetCode.VIDEO_DECODER_SUCCESS:
            break
        got2 += 1
    assert got2 >= 3  # the full second GOP came through
    assert dec.stop_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS


def test_decoder_api_h265_route():
    """The decoder API accepts format H265 (the reference decodes both,
    VideoDecoderNetint.cpp:822-824) and routes to the HEVC oracle."""
    from media_tpu.api.errors import CodecFormat
    from media_tpu.hevc import HevcEncoderSession

    w, h = 96, 64
    rng = np.random.default_rng(0)
    y = (rng.integers(0, 256, (h, w)) // 2 + 60).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
    v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
    s = HevcEncoderSession(w, h, qp=30)
    au = s.encode_frame(y, u, v)

    dec = VideoDecoder()
    assert dec.create_decoder(
        CodecFormat.H265) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    dec.init_decoder()
    dec.start_decoder()
    dec.set_decode_params(width=w, height=h)
    assert dec.send_stream_data(au) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.send_stream_data(b"") == DecoderRetCode.VIDEO_DECODER_SUCCESS
    code, payload, _info = dec.retrieve_frame_data()
    assert code == DecoderRetCode.VIDEO_DECODER_SUCCESS, code
    got = np.frombuffer(payload[: w * h], np.uint8).reshape(h, w)
    np.testing.assert_array_equal(got, np.asarray(s.recon[0]))
