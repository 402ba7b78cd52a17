"""API-contract tests: lifecycle + error-code semantics catalogued from the
reference (SURVEY.md §3/§4.3): reset-on-reconfig, force-IDR poll, input size
guard, overflow/underflow backpressure, EOS, flush-resume, BAD_PIC_SIZE."""

import numpy as np
import pytest

from media_tpu.api import (
    DecoderRetCode,
    EncoderRetCode,
    VideoDecoder,
    VideoEncoder,
    create_video_decoder,
    create_video_encoder,
)
from media_tpu.api.errors import DecoderEvent
from media_tpu.core import params as P
from media_tpu.utils import yuv


def small_store(w=64, h=48):
    store = P.ParamStore()
    store.set(P.KEY_HW_WIDTH, w)
    store.set(P.KEY_HW_HEIGHT, h)
    store.set(P.KEY_HW_FPS, 30)
    store.set(P.KEY_GOPSIZE, 30)
    return store


def frame_bytes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return yuv.pack_i420(y, u, v)


class TestEncoderLifecycle:
    def test_full_lifecycle(self):
        enc = create_video_encoder(small_store())
        assert enc is not None
        assert enc.init_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        assert enc.start_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        code, data = enc.encode_one_frame(frame_bytes(64, 48))
        assert code == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        assert data.startswith(b"\x00\x00\x00\x01")
        assert enc.stop_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        assert enc.destroy_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        # destroy is idempotent
        assert enc.destroy_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS

    def test_encode_before_init_fails(self):
        enc = VideoEncoder(small_store())
        code, _ = enc.encode_one_frame(b"")
        assert code == EncoderRetCode.VIDEO_ENCODER_NOT_INITED

    def test_input_size_guard(self):
        enc = VideoEncoder(small_store())
        enc.init_encoder()
        enc.start_encoder()
        code, _ = enc.encode_one_frame(b"\x00" * 10)
        # Reference contract: VIDEO_ENCODER_ENCODE_FAIL (0x04) on short input
        # (VideoEncoderOpenH264.cpp:307-310).
        assert code == EncoderRetCode.VIDEO_ENCODER_ENCODE_FAIL

    def test_force_keyframe_poll(self):
        store = small_store()
        enc = VideoEncoder(store)
        enc.init_encoder()
        enc.start_encoder()
        enc.encode_one_frame(frame_bytes(64, 48, 0))
        _, p1 = enc.encode_one_frame(frame_bytes(64, 48, 1))
        # P frame: single non-IDR NAL
        assert p1[4] & 0x1F == 1
        store.set(P.KEY_FORCE_KEYFRAME, "1")
        _, p2 = enc.encode_one_frame(frame_bytes(64, 48, 2))
        from media_tpu.core.nal import iter_nal_units

        types = [n.nal_type for n in iter_nal_units(p2)]
        assert 5 in types  # IDR emitted
        assert store.get_str(P.KEY_FORCE_KEYFRAME) == "0"  # poll consumed

    def test_param_adjust_triggers_reset(self):
        store = small_store()
        enc = VideoEncoder(store)
        enc.init_encoder()
        enc.start_encoder()
        enc.encode_one_frame(frame_bytes(64, 48, 0))
        store.set(P.KEY_GOPSIZE, "60")
        store.set(P.KEY_PARAM_ADJUSTING, "1")
        code, data = enc.encode_one_frame(frame_bytes(64, 48, 1))
        assert code == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        assert enc.session.cfg.gop_size == 60
        # reset implies a fresh IDR
        assert data[4] & 0x1F == 7  # SPS first

    def test_invalid_param_repair(self):
        store = small_store()
        store.set(P.KEY_BITRATE, "999")  # below envelope -> repaired
        enc = VideoEncoder(store)
        assert enc.init_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        assert store.get_int(P.KEY_BITRATE) == 5_000_000  # written back

    def test_invalid_geometry_fails_init(self):
        store = small_store(w=8, h=8)
        enc = VideoEncoder(store)
        assert enc.init_encoder() == EncoderRetCode.VIDEO_ENCODER_INIT_FAIL

    def test_factory_format_select(self):
        store = small_store()
        store.set(P.KEY_ENCODE_FORMAT, "2")
        enc265 = create_video_encoder(store)  # H.265 intra-only skeleton
        assert enc265 is not None
        from media_tpu.api.errors import CodecFormat

        assert enc265._codec == CodecFormat.H265
        store.set(P.KEY_ENCODE_FORMAT, "1")
        assert create_video_encoder(store) is not None
        store.set(P.KEY_ENCODE_FORMAT, "7")
        assert create_video_encoder(store) is None  # unknown format


def encode_stream(w, h, n, gop=30, qp_seed=0):
    store = small_store(w, h)
    enc = VideoEncoder(store)
    enc.init_encoder()
    enc.start_encoder()
    aus = []
    frames = []
    for t in range(n):
        buf = frame_bytes(w, h, qp_seed * 100 + t)
        frames.append(buf)
        code, data = enc.encode_one_frame(buf)
        assert code == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        aus.append(bytes(data))
    return aus, frames


class TestDecoderLifecycle:
    def test_full_decode_loop(self):
        w, h = 64, 48
        aus, _ = encode_stream(w, h, 3)
        dec = create_video_decoder()
        assert dec.create_decoder(0) == DecoderRetCode.VIDEO_DECODER_SUCCESS
        assert dec.init_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS
        dec.set_decode_params(width=w, height=h)
        assert dec.start_decoder() == DecoderRetCode.VIDEO_DECODER_SUCCESS

        got = 0
        for au in aus:
            assert dec.send_stream_data(au + b"\x00\x00\x00\x01") in (
                DecoderRetCode.VIDEO_DECODER_SUCCESS,
            )
            code, payload, info = dec.retrieve_frame_data()
            if code == DecoderRetCode.VIDEO_DECODER_SUCCESS:
                got += 1
                assert len(payload) == w * h * 3 // 2
        assert got >= 2

    def test_underflow_then_eos(self):
        dec = VideoDecoder()
        dec.create_decoder(0)
        dec.init_decoder()
        dec.start_decoder()
        code, _, _ = dec.retrieve_frame_data()
        assert code == DecoderRetCode.VIDEO_DECODER_READ_UNDERFLOW
        dec.send_stream_data(b"")  # EOS marker
        code, _, _ = dec.retrieve_frame_data()
        assert code == DecoderRetCode.VIDEO_DECODER_EOS

    def test_pic_info_change_event(self):
        w, h = 64, 48
        aus, _ = encode_stream(w, h, 1)
        dec = VideoDecoder()
        dec.create_decoder(0)
        dec.init_decoder()
        dec.set_decode_params(width=128, height=96)  # wrong expectation
        dec.start_decoder()
        events = []
        dec.set_callbacks(lambda ev, info: events.append((ev, info)))
        dec.send_stream_data(aus[0] + b"\x00\x00\x00\x01")
        code, _, info = dec.retrieve_frame_data()
        assert code == DecoderRetCode.VIDEO_DECODER_BAD_PIC_SIZE
        assert events and events[0][0] == DecoderEvent.INDEX_PIC_INFO_CHANGE
        # After adopting the new geometry the frame is deliverable.
        code, payload, _ = dec.retrieve_frame_data()
        assert code == DecoderRetCode.VIDEO_DECODER_SUCCESS
        assert len(payload) == w * h * 3 // 2

    def test_partial_nal_leftover_assembly(self):
        w, h = 64, 48
        aus, _ = encode_stream(w, h, 2)
        stream = b"".join(aus) + b"\x00\x00\x00\x01"
        dec = VideoDecoder()
        dec.create_decoder(0)
        dec.init_decoder()
        dec.set_decode_params(width=w, height=h)
        dec.start_decoder()
        # Feed in awkward chunks that split NALs mid-way.
        for i in range(0, len(stream), 37):
            assert dec.send_stream_data(stream[i : i + 37]) == DecoderRetCode.VIDEO_DECODER_SUCCESS
        got = 0
        while True:
            code, payload, _ = dec.retrieve_frame_data()
            if code != DecoderRetCode.VIDEO_DECODER_SUCCESS:
                break
            got += 1
        assert got == 2

    def test_flush_resume_with_saved_headers(self):
        w, h = 64, 48
        store = small_store(w, h)
        enc = VideoEncoder(store)
        enc.init_encoder()
        enc.start_encoder()
        bufs = [frame_bytes(w, h, t) for t in range(3)]
        au0 = bytes(enc.encode_one_frame(bufs[0])[1])  # IDR (SPS+PPS+slice)
        dec = VideoDecoder()
        dec.create_decoder(0)
        dec.init_decoder()
        dec.set_decode_params(width=w, height=h)
        dec.start_decoder()
        dec.send_stream_data(au0 + b"\x00\x00\x00\x01")
        assert dec.retrieve_frame_data()[0] == DecoderRetCode.VIDEO_DECODER_SUCCESS
        # Flush drops state but keeps SPS/PPS; a new IDR (without headers)
        # must decode because headers were saved.
        dec.flush()
        store.set(P.KEY_FORCE_KEYFRAME, "1")
        au1 = bytes(enc.encode_one_frame(bufs[1])[1])
        from media_tpu.core.nal import iter_nal_units, wrap_nal

        idr_only = b"".join(
            wrap_nal(n.nal_type, n.rbsp, nal_ref_idc=n.nal_ref_idc)
            for n in iter_nal_units(au1)
            if n.nal_type == 5
        )
        assert dec.send_stream_data(idr_only + b"\x00\x00\x00\x01") == DecoderRetCode.VIDEO_DECODER_SUCCESS
        assert dec.retrieve_frame_data()[0] == DecoderRetCode.VIDEO_DECODER_SUCCESS


class TestReferencePolicyConfig:
    """create_video_encoder must build the reference's InitParamExt policy
    (VideoEncoderOpenH264.cpp:239-291): RC_BITRATE_MODE CBR at the persist
    bitrate, CABAC for profile >= main, deblocking on, full intra toolset."""

    def test_factory_builds_reference_policy(self):
        store = small_store()
        store.set(P.KEY_PROFILE, "main")
        store.set(P.KEY_BITRATE, 2_000_000)
        enc = create_video_encoder(store)
        assert enc.init_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        cfg = enc.session.cfg
        assert cfg.rc_mode == "cbr"
        assert cfg.bitrate == 2_000_000
        assert cfg.cabac is True
        assert cfg.deblock is True
        assert cfg.i4x4 is True
        assert cfg.gop_size == 30
        assert cfg.framerate == 30

    def test_baseline_profile_disables_cabac(self):
        store = small_store()
        store.set(P.KEY_PROFILE, "baseline")
        enc = create_video_encoder(store)
        enc.init_encoder()
        assert enc.session.cfg.cabac is False
        assert enc.session.cfg.rc_mode == "cbr"

    def test_api_stream_hits_target_bitrate(self):
        store = small_store(w=64, h=64)
        store.set(P.KEY_PROFILE, "main")
        store.set(P.KEY_BITRATE, 1_000_000)
        enc = create_video_encoder(store)
        enc.init_encoder()
        enc.start_encoder()
        total = 0
        n = 10
        for i in range(n):
            code, data = enc.encode_one_frame(frame_bytes(64, 64, seed=i))
            assert code == EncoderRetCode.VIDEO_ENCODER_SUCCESS
            total += len(data)
        # CBR: the noise content must be held near 1 Mbps / 30 fps per
        # frame (wide tolerance: short run incl. the IDR).
        per_frame_bits = total * 8 / n
        assert per_frame_bits < 4 * 1_000_000 / 30

    def test_multichip_placement_via_pool(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device backend")
        from media_tpu.parallel.sharding import ShardedEncoderSession, get_pool

        store = small_store(w=64, h=16 * len(jax.devices()))
        store.set(P.KEY_MULTICHIP, "1")
        enc = create_video_encoder(store)
        assert enc.init_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
        assert isinstance(enc.session, ShardedEncoderSession)
        pool = get_pool()
        assert any(v > 0 for v in pool.loads())
        enc.destroy_encoder()
        assert all(v == 0 for v in pool.loads())


def test_ret_code_values_match_reference():
    """Value-exact with the reference headers: VideoCodecApi.h:8-20 and
    VideoDecoder.h:10-26."""
    from media_tpu.api.errors import DecoderRetCode, EncoderRetCode

    E = EncoderRetCode
    assert [int(x) for x in (
        E.VIDEO_ENCODER_SUCCESS, E.VIDEO_ENCODER_CREATE_FAIL,
        E.VIDEO_ENCODER_INIT_FAIL, E.VIDEO_ENCODER_START_FAIL,
        E.VIDEO_ENCODER_ENCODE_FAIL, E.VIDEO_ENCODER_STOP_FAIL,
        E.VIDEO_ENCODER_DESTROY_FAIL, E.VIDEO_ENCODER_REGISTER_FAIL,
        E.VIDEO_ENCODER_RESET_FAIL, E.VIDEO_ENCODER_FORCE_KEY_FRAME_FAIL,
        E.VIDEO_ENCODER_SET_ENCODE_PARAMS_FAIL,
    )] == list(range(0x0B))
    D = DecoderRetCode
    assert [int(x) for x in (
        D.VIDEO_DECODER_SUCCESS, D.VIDEO_DECODER_CREATE_FAIL,
        D.VIDEO_DECODER_INIT_FAIL, D.VIDEO_DECODER_START_FAIL,
        D.VIDEO_DECODER_DECODE_FAIL, D.VIDEO_DECODER_STOP_FAIL,
        D.VIDEO_DECODER_DESTROY_FAIL, D.VIDEO_DECODER_RESET_FAIL,
        D.VIDEO_DECODER_GET_DECODE_PARAMS_FAIL,
        D.VIDEO_DECODER_SET_DECODE_PARAMS_FAIL,
        D.VIDEO_DECODER_SET_FUNC_FAIL, D.VIDEO_DECODER_WRITE_OVERFLOW,
        D.VIDEO_DECODER_READ_UNDERFLOW, D.VIDEO_DECODER_BAD_PIC_SIZE,
        D.VIDEO_DECODER_EOS,
    )] == list(range(15))
    # Framework extensions live outside the reference value space.
    assert int(E.VIDEO_ENCODER_NOT_INITED) >= 0x100
    assert int(D.VIDEO_DECODER_NOT_INITED) >= 0x100


def test_encoder_statistics_surface():
    """SEncoderStatistics analog (codec_app_def.h:735-760): frame/byte
    counters, average QP and speed, forced-IDR count."""
    store = small_store()
    enc = create_video_encoder(store)
    enc.init_encoder()
    enc.start_encoder()
    for i in range(3):
        code, _ = enc.encode_one_frame(frame_bytes(64, 48, seed=i))
        assert code == EncoderRetCode.VIDEO_ENCODER_SUCCESS
    store.set(P.KEY_FORCE_KEYFRAME, "1")
    enc.encode_one_frame(frame_bytes(64, 48, seed=9))
    st = enc.get_encoder_statistics()
    assert st["width"] == 64 and st["height"] == 48
    assert st["input_frame_count"] == 4
    assert st["encoded_bytes"] > 0
    assert st["average_frame_qp"] > 0
    assert st["average_frame_speed_ms"] > 0
    assert st["idr_req_num"] == 1
