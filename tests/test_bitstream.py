"""Bit-level round-trip tests: Exp-Golomb, RBSP escaping, NAL scanning."""

import random

import pytest

from media_tpu.core.bitstream import BitReader, BitWriter
from media_tpu.core.nal import (
    H264NalType,
    escape_rbsp,
    find_start_code,
    iter_nal_units,
    split_parameter_sets,
    unescape_rbsp,
    wrap_nal,
)
from media_tpu.core.syntax import PPS, SPS, SliceHeader


def test_u_bits_msb_first():
    w = BitWriter()
    w.u(4, 0b1010)
    w.u(4, 0b0101)
    w.u(16, 0xBEEF)
    assert w.get_bytes() == bytes([0xA5, 0xBE, 0xEF])
    r = BitReader(w.get_bytes())
    assert r.u(4) == 0b1010
    assert r.u(4) == 0b0101
    assert r.u(16) == 0xBEEF


def test_ue_known_codewords():
    # Spec 9.1 Table 9-2: 0->1, 1->010, 2->011, 3->00100 ...
    for value, bits in [(0, "1"), (1, "010"), (2, "011"), (3, "00100"),
                        (4, "00101"), (5, "00110"), (6, "00111"), (7, "0001000")]:
        w = BitWriter()
        w.ue(value)
        w.rbsp_trailing_bits()
        got = "".join(f"{b:08b}" for b in w.get_bytes())
        assert got.startswith(bits), (value, got, bits)


def test_se_mapping():
    # Spec Table 9-3: 0->0, 1->1, -1->2, 2->3, -2->4
    for v, code in [(0, 0), (1, 1), (-1, 2), (2, 3), (-2, 4), (3, 5), (-3, 6)]:
        w = BitWriter()
        w.se(v)
        w.rbsp_trailing_bits()
        r = BitReader(w.get_bytes())
        assert r.ue() == code
        w2 = BitWriter()
        w2.ue(code)
        w2.rbsp_trailing_bits()
        assert BitReader(w2.get_bytes()).se() == v


@pytest.mark.parametrize("seed", range(5))
def test_expgolomb_roundtrip_random(seed):
    rng = random.Random(seed)
    ops = []
    w = BitWriter()
    for _ in range(500):
        kind = rng.randrange(4)
        if kind == 0:
            v = rng.randrange(0, 100000)
            w.ue(v)
        elif kind == 1:
            v = rng.randrange(-50000, 50000)
            w.se(v)
        elif kind == 2:
            n = rng.randrange(1, 25)
            v = rng.randrange(0, 1 << n)
            w.u(n, v)
            kind = (kind, n)
        else:
            v = rng.randrange(0, 2)
            w.te(v, 1)
        ops.append((kind, v))
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for kind, v in ops:
        if kind == 0:
            assert r.ue() == v
        elif kind == 1:
            assert r.se() == v
        elif kind == 3:
            assert r.te(1) == v
        else:
            assert r.u(kind[1]) == v


def test_rbsp_escape_roundtrip():
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x00\x00\x02",
        b"\x00\x00\x03\x00\x00",
        b"abc\x00\x00\x00\x00\x01xyz",
        bytes(range(256)) * 3,
        b"\x00" * 64,
    ]
    for rbsp in cases:
        esc = escape_rbsp(rbsp)
        # No forbidden 00 00 0x patterns with x < 3 survive in escaped form.
        for i in range(len(esc) - 2):
            assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] < 3), esc
        assert unescape_rbsp(esc) == rbsp


def test_rbsp_escape_random_roundtrip():
    rng = random.Random(42)
    for _ in range(50):
        rbsp = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randrange(200)))
        assert unescape_rbsp(escape_rbsp(rbsp)) == rbsp


def test_find_start_code_prefers_4byte():
    assert find_start_code(b"\x00\x00\x00\x01x") == (0, 4)
    assert find_start_code(b"\xff\x00\x00\x01x") == (1, 3)
    assert find_start_code(b"\xff\xff") == (-1, 0)
    # 3-byte code right at pos boundary must not look back before pos
    assert find_start_code(b"\x00\x00\x00\x01", 1) == (1, 3)


def test_iter_nal_units_and_split():
    sps = wrap_nal(H264NalType.SPS, b"\x01\x02")
    pps = wrap_nal(H264NalType.PPS, b"\x03", long_start_code=False)
    idr = wrap_nal(H264NalType.IDR_SLICE, b"\x00\x00\x00\x00payload")
    stream = sps + pps + idr
    nals = list(iter_nal_units(stream))
    assert [n.nal_type for n in nals] == [7, 8, 5]
    assert nals[0].rbsp == b"\x01\x02"
    assert nals[1].rbsp == b"\x03"
    assert nals[2].rbsp == b"\x00\x00\x00\x00payload"
    headers, rest = split_parameter_sets(stream)
    assert headers == sps + pps
    assert rest == idr


def test_sps_roundtrip():
    sps = SPS.for_size(352, 288, profile_idc=66, level_idc=20)
    assert sps.width == 352 and sps.height == 288
    w = BitWriter()
    sps.write(w)
    w.rbsp_trailing_bits()
    parsed = SPS.parse(BitReader(w.get_bytes()))
    assert parsed == sps

    sps2 = SPS.for_size(1920, 1080, profile_idc=100, level_idc=40,
                        log2_max_frame_num=9, max_num_ref_frames=2)
    assert sps2.width == 1920 and sps2.height == 1080
    assert sps2.crop_bottom == 4  # 1088 -> 1080
    w = BitWriter()
    sps2.write(w)
    w.rbsp_trailing_bits()
    assert SPS.parse(BitReader(w.get_bytes())) == sps2


def test_pps_roundtrip():
    pps = PPS(pic_init_qp=30, chroma_qp_index_offset=2,
              deblocking_filter_control_present=True)
    w = BitWriter()
    pps.write(w)
    w.rbsp_trailing_bits()
    assert PPS.parse(BitReader(w.get_bytes())) == pps


def test_slice_header_roundtrip():
    sps = SPS.for_size(352, 288)
    pps = PPS(pic_init_qp=28)
    for hdr in [
        SliceHeader(slice_type=7, idr=True, slice_qp_delta=2,
                    disable_deblocking_filter_idc=1),
        SliceHeader(slice_type=5, frame_num=3, slice_qp_delta=-4,
                    disable_deblocking_filter_idc=0),
        SliceHeader(slice_type=5, frame_num=7, first_mb_in_slice=22,
                    disable_deblocking_filter_idc=2, nal_ref_idc=2),
    ]:
        w = BitWriter()
        hdr.write(w, sps, pps)
        w.rbsp_trailing_bits()
        parsed = SliceHeader.parse(
            BitReader(w.get_bytes()), sps, pps,
            nal_type=5 if hdr.idr else 1, nal_ref_idc=hdr.nal_ref_idc)
        assert parsed == hdr
