"""VUI timing, SEI, and AUD syntax (reference parity: these NALs are part of
the streams the reference's decoder adapter must pass through — its NAL
scanner classifies SEI/AUD as non-VCL, VideoDecoderNetint.cpp:794-842)."""

import numpy as np

from media_tpu.core.bitstream import BitReader, BitWriter
from media_tpu.core.syntax import (
    SPS,
    parse_sei_rbsp,
    sei_recovery_point,
    sei_user_data,
    write_aud_rbsp,
    write_sei_rbsp,
)


def test_sps_vui_timing_roundtrip():
    sps = SPS.for_size(1920, 1080)
    sps.vui_timing = (1, 60)  # 30 fps
    w = BitWriter()
    sps.write(w)
    w.rbsp_trailing_bits()
    back = SPS.parse(BitReader(w.get_bytes()))
    assert back.vui_timing == (1, 60)
    assert back.fixed_frame_rate
    assert back.width == 1920 and back.height == 1080


def test_sps_no_vui_roundtrip():
    sps = SPS.for_size(352, 288)
    w = BitWriter()
    sps.write(w)
    w.rbsp_trailing_bits()
    back = SPS.parse(BitReader(w.get_bytes()))
    assert back.vui_timing is None


def test_sei_roundtrip():
    msgs = [sei_recovery_point(0), sei_user_data(b"hello world")]
    rbsp = write_sei_rbsp(msgs)
    back = parse_sei_rbsp(rbsp)
    assert [t for t, _ in back] == [6, 5]
    assert back[1][1].endswith(b"hello world")


def test_sei_long_payload_roundtrip():
    # Payload sizes >= 255 exercise the ff-extension byte encoding.
    big = bytes(range(256)) * 3
    rbsp = write_sei_rbsp([sei_user_data(big)])
    back = parse_sei_rbsp(rbsp)
    assert len(back) == 1
    assert back[0][1][16:] == big


def test_aud_rbsp():
    assert write_aud_rbsp(0) == bytes([0b000_10000])
    assert write_aud_rbsp(1) == bytes([0b001_10000])


def test_encode_with_aud_sei_decodes_identically():
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
    from media_tpu.ref.decoder import ReferenceDecoder

    rng = np.random.default_rng(7)
    w, h = 48, 32
    frames = [
        rng.integers(0, 256, (w * h * 3 // 2,), dtype=np.uint8).tobytes()
        for _ in range(3)
    ]

    def run(**kw):
        sess = EncoderSession(EncoderConfig(width=w, height=h, gop_size=3,
                                            deblock=False, **kw))
        dec = ReferenceDecoder()
        outs = []
        for f in frames:
            for fr in dec.decode_annexb(sess.encode_frame(f)):
                outs.append((fr.y, fr.u, fr.v))
        return outs

    plain = run(insert_aud=False, insert_sei=False, signal_timing=False)
    decorated = run(insert_aud=True, insert_sei=True, signal_timing=True)
    assert len(plain) == len(decorated) == 3
    for a, b in zip(plain, decorated):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
