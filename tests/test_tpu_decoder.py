"""TPU decode path: bit-exact vs the scalar reference decoder and vs the
encoder's own reconstruction, for CAVLC and CABAC streams. Runs jitted on
the CPU backend (conftest), where integer jit semantics match the TPU."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.pipeline.decoder_tpu import TpuDecoder
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv
from tests.test_roundtrip_pframe import moving_scene


@pytest.mark.parametrize("deblock", [True, False])
def test_tpu_decode_matches_reference_cavlc(deblock):
    w, h = 128, 96
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28, gop_size=8,
                                        deblock=deblock))
    tdec = TpuDecoder()
    rdec = ReferenceDecoder()
    for t in range(4):
        y, u, v = moving_scene(w, h, t)
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        tf = tdec.decode_annexb(au)
        rf = rdec.decode_annexb(au)
        assert len(tf) == len(rf) == 1
        np.testing.assert_array_equal(tf[0].y, rf[0].y, err_msg=f"frame {t} Y")
        np.testing.assert_array_equal(tf[0].u, rf[0].u, err_msg=f"frame {t} U")
        np.testing.assert_array_equal(tf[0].v, rf[0].v, err_msg=f"frame {t} V")
        np.testing.assert_array_equal(tf[0].y, np.asarray(sess.recon[0]))


def test_tpu_decode_cabac_stream():
    """CABAC AUs decode on the TPU path; recon must equal the encoder's."""
    w, h = 128, 96
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30, gop_size=8,
                                        cabac=True))
    tdec = TpuDecoder()
    for t in range(3):
        y, u, v = moving_scene(w, h, t)
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        tf = tdec.decode_annexb(au)
        assert len(tf) == 1
        np.testing.assert_array_equal(tf[0].y, np.asarray(sess.recon[0]),
                                      err_msg=f"frame {t} Y")
        np.testing.assert_array_equal(tf[0].u, np.asarray(sess.recon[1]))
        np.testing.assert_array_equal(tf[0].v, np.asarray(sess.recon[2]))


def test_api_tpu_backend_with_fallback():
    """The API decoder on the forced TPU backend decodes our streams and
    falls back to the reference decoder on unsupported ones (multi-slice)."""
    from media_tpu.api.decoder_api import VideoDecoder
    from media_tpu.api.errors import CodecFormat, DecoderRetCode

    w, h = 128, 96
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30, gop_size=8,
                                        num_slices=2))  # multi-slice: fallback
    dec = VideoDecoder(backend="tpu")
    assert dec.create_decoder(CodecFormat.H264) == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.init_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.set_decode_params(width=w, height=h) == \
        DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert dec.start_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
    y, u, v = moving_scene(w, h, 0)
    au = sess.encode_frame(yuv.pack_i420(y, u, v))
    assert dec.send_stream_data(au + b"\x00\x00\x01\x09\x10") == \
        DecoderRetCode.VIDEO_DECODER_SUCCESS
    code, payload, info = dec.retrieve_frame_data()
    assert code == DecoderRetCode.VIDEO_DECODER_SUCCESS
    assert info["width"] == w and info["height"] == h
    np.testing.assert_array_equal(
        np.frombuffer(payload[: w * h], np.uint8).reshape(h, w),
        np.asarray(sess.recon[0]))
