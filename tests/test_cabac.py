"""CABAC: engine round trips, slice-symbol round trips, session integration,
and the CAVLC-vs-CABAC size comparison."""

import numpy as np
import pytest

from media_tpu.entropy import cabac_contexts as cc
from media_tpu.entropy.cabac_engine import CabacDecoder, CabacEncoder
from media_tpu.entropy import cabac_slice as cs


def test_engine_roundtrip_random_bins():
    rng = np.random.default_rng(0)
    n = 5000
    kinds = rng.integers(0, 3, n)  # 0=ctx bin, 1=bypass, 2 reserved->ctx
    ctx_idx = rng.integers(0, 100, n)
    bins = rng.integers(0, 2, n)
    enc = CabacEncoder()
    ctx_e = cc.ContextModels(28)
    for k, i, b in zip(kinds, ctx_idx, bins):
        if k == 1:
            enc.encode_bypass(int(b))
        else:
            enc.encode_bin(ctx_e, int(i), int(b))
    enc.encode_terminate(1)
    data = enc.get_bytes()

    dec = CabacDecoder(data)
    ctx_d = cc.ContextModels(28)
    for k, i, b in zip(kinds, ctx_idx, bins):
        if k == 1:
            got = dec.decode_bypass()
        else:
            got = dec.decode_bin(ctx_d, int(i))
        assert got == int(b)
    assert dec.decode_terminate() == 1
    np.testing.assert_array_equal(ctx_e.state, ctx_d.state)
    np.testing.assert_array_equal(ctx_e.mps, ctx_d.mps)


def test_engine_terminate_mid_stream():
    enc = CabacEncoder()
    ctx = cc.ContextModels(30)
    for i in range(50):
        enc.encode_bin(ctx, i % 7, i % 2)
        enc.encode_terminate(0)
    enc.encode_bypass(1)
    enc.encode_terminate(1)
    data = enc.get_bytes()
    dec = CabacDecoder(data)
    ctx2 = cc.ContextModels(30)
    for i in range(50):
        assert dec.decode_bin(ctx2, i % 7) == i % 2
        assert dec.decode_terminate() == 0
    assert dec.decode_bypass() == 1
    assert dec.decode_terminate() == 1


def random_psymbols(R, C, seed, density=6, mv_range=33):
    rng = np.random.default_rng(seed)
    luma = (rng.integers(0, density, (R, C, 16, 16)) == 0) * rng.integers(
        -40, 41, (R, C, 16, 16))
    mv = rng.integers(-mv_range, mv_range + 1, (R, C, 2))
    zero = rng.random((R, C)) < 0.35
    luma[zero] = 0
    mv[zero] = 0
    cdc = (rng.integers(0, 4, (R, C, 2, 4)) == 0) * rng.integers(
        -20, 21, (R, C, 2, 4))
    cac = (rng.integers(0, 8, (R, C, 2, 4, 15)) == 0) * rng.integers(
        -9, 10, (R, C, 2, 4, 15))
    cdc[zero] = 0
    cac[zero] = 0
    return (mv.astype(np.int32), luma.astype(np.int32),
            cdc.astype(np.int32), cac.astype(np.int32))


@pytest.mark.parametrize("seed", [0, 1])
def test_pslice_symbol_roundtrip(seed):
    R, C = 7, 9
    mv, luma, cdc, cac = random_psymbols(R, C, seed)
    data = cs.write_pslice_cabac(mv, luma, cdc, cac, qp=28)
    out = cs.parse_pslice_cabac(data, 0, R, C, qp=28)
    np.testing.assert_array_equal(out["mv"], mv)
    np.testing.assert_array_equal(out["luma_levels"], luma)
    np.testing.assert_array_equal(out["cdc_levels"], cdc)
    np.testing.assert_array_equal(out["cac_levels"], cac)


def test_pslice_all_skip_and_escape_levels():
    R, C = 4, 5
    mv = np.zeros((R, C, 2), np.int32)
    luma = np.zeros((R, C, 16, 16), np.int32)
    cdc = np.zeros((R, C, 2, 4), np.int32)
    cac = np.zeros((R, C, 2, 4, 15), np.int32)
    data = cs.write_pslice_cabac(mv, luma, cdc, cac, qp=30)
    out = cs.parse_pslice_cabac(data, 0, R, C, qp=30)
    np.testing.assert_array_equal(out["mv"], mv)
    # escape path: |level|-1 >= 14 exercises the UEG0 bypass suffix
    luma[0, 0, 0, 0] = 2063
    luma[0, 0, 0, 1] = -500
    mv[2, 3] = (120, -88)
    data = cs.write_pslice_cabac(mv, luma, cdc, cac, qp=30)
    out = cs.parse_pslice_cabac(data, 0, R, C, qp=30)
    np.testing.assert_array_equal(out["luma_levels"], luma)
    np.testing.assert_array_equal(out["mv"], mv)


def test_islice_symbol_roundtrip():
    rng = np.random.default_rng(3)
    R, C = 6, 8
    mode16 = rng.integers(0, 4, (R, C)).astype(np.int32)
    mode16[0, 0] = 2  # DC at origin (no neighbors) like the real encoder
    chroma_mode = rng.integers(0, 4, (R, C)).astype(np.int32)
    dc = (rng.integers(0, 3, (R, C, 16)) == 0) * rng.integers(-30, 31, (R, C, 16))
    ac = (rng.integers(0, 6, (R, C, 16, 15)) == 0) * rng.integers(-20, 21, (R, C, 16, 15))
    cdc = (rng.integers(0, 3, (R, C, 2, 4)) == 0) * rng.integers(-15, 16, (R, C, 2, 4))
    cac = (rng.integers(0, 8, (R, C, 2, 4, 15)) == 0) * rng.integers(-9, 10, (R, C, 2, 4, 15))
    args = [x.astype(np.int32) for x in (dc, ac, cdc, cac)]
    data = cs.write_islice_cabac(mode16, chroma_mode, *args, qp=26)
    out = cs.parse_islice_cabac(data, 0, R, C, qp=26)
    np.testing.assert_array_equal(out["mode16"], mode16)
    np.testing.assert_array_equal(out["chroma_mode"], chroma_mode)
    np.testing.assert_array_equal(out["dc_levels"], args[0])
    np.testing.assert_array_equal(out["ac_levels"], args[1])
    np.testing.assert_array_equal(out["cdc_levels"], args[2])
    np.testing.assert_array_equal(out["cac_levels"], args[3])


def test_session_cabac_au_and_size_vs_cavlc():
    """A cabac=True session produces parseable AUs whose slice payloads
    round-trip symbol-exact, and whose P-frame sizes show the CABAC
    compression gain over CAVLC on the same content."""
    from media_tpu.core import nal as nal_mod
    from media_tpu.core.bitstream import BitReader
    from media_tpu.core.syntax import PPS, SPS, SliceHeader
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
    from media_tpu.utils import yuv
    from tests.test_roundtrip_pframe import moving_scene

    w, h = 192, 160
    sizes = {}
    payloads = {}
    for mode in ("cavlc", "cabac"):
        sess = EncoderSession(EncoderConfig(
            width=w, height=h, qp=30, gop_size=10, cabac=(mode == "cabac")))
        aus = []
        for t in range(4):
            y, u, v = moving_scene(w, h, t)
            aus.append(sess.encode_frame(yuv.pack_i420(y, u, v)))
        sizes[mode] = [len(a) for a in aus]
        payloads[mode] = aus
    # CABAC P frames must not be larger than CAVLC's (uniform-init costs a
    # small ramp, CABAC's adaptivity wins it back and more).
    cavlc_p = sum(sizes["cavlc"][1:])
    cabac_p = sum(sizes["cabac"][1:])
    assert cabac_p < cavlc_p, (sizes, "expected CABAC saving")

    # parse the CABAC P slice back to symbols
    sps = pps = None
    n_p = 0
    for au in payloads["cabac"]:
        for nu in nal_mod.iter_nal_units(au):
            nal_type, rbsp = nu.nal_type, nu.rbsp
            if nal_type == 7:
                sps = SPS.parse(BitReader(rbsp))
            elif nal_type == 8:
                pps = PPS.parse(BitReader(rbsp))
            elif nal_type == 1:
                br = BitReader(rbsp)
                hdr = SliceHeader.parse(br, sps, pps, nal_type=1, nal_ref_idc=2)
                pos = br.bit_position
                pos += (8 - pos % 8) % 8  # cabac_alignment_one_bit
                qp = pps.pic_init_qp + hdr.slice_qp_delta
                out = cs.parse_pslice_cabac(
                    rbsp, pos, sps.pic_height_in_mbs, sps.pic_width_in_mbs, qp)
                assert out["mv"].shape == (h // 16, w // 16, 2)
                n_p += 1
    assert n_p == 3
    assert pps.entropy_coding_mode == 1
    assert sps.profile_idc == 77
