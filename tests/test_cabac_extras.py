"""CABAC features: normative init tables (cabac_init_idc), the C++
CABAC packer (byte-equal to the Python coder), I_4x4 CABAC slices, and the
reference operating point (CABAC + CBR + deblock + I_4x4) as one runnable
config (VideoEncoderOpenH264.cpp:239-291 semantics)."""

import numpy as np
import pytest

from media_tpu.entropy import cabac_slice
from media_tpu.entropy.cabac_contexts import ContextModels
from media_tpu.entropy import cabac_init_tables as cit


def random_psymbols(R, C, seed):
    rng = np.random.default_rng(seed)
    mv = rng.integers(-20, 21, (R, C, 2)).astype(np.int32)
    luma = ((rng.integers(0, 6, (R, C, 16, 16)) == 0)
            * rng.integers(-9, 10, (R, C, 16, 16))).astype(np.int32)
    cdc = ((rng.integers(0, 4, (R, C, 2, 4)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4))).astype(np.int32)
    cac = ((rng.integers(0, 8, (R, C, 2, 4, 15)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4, 15))).astype(np.int32)
    zero = rng.random((R, C)) < 0.3
    luma[zero] = 0
    mv[zero] = 0
    cdc[zero] = 0
    cac[zero] = 0
    return mv, luma, cdc, cac


def test_init_tables_structure():
    """Spec tables: correct shapes, distinct per idc, and every derived
    preCtxState within the normative clip bounds for all QPs."""
    assert cit.INIT_MN_I.shape == (cit.NUM_CTX, 2)
    assert cit.INIT_MN_P.shape == (3, cit.NUM_CTX, 2)
    assert not cit.FITTED, "the codec must ship the normative tables"
    # Spot-check normative values (Table 9-12 ctxIdx 0..2 / 70).
    assert tuple(cit.INIT_MN_I[0]) == (20, -15)
    assert tuple(cit.INIT_MN_I[2]) == (3, 74)
    # The three P tables are genuinely distinct (per-idc spec data).
    assert not (cit.INIT_MN_P[0] == cit.INIT_MN_P[1]).all()
    assert not (cit.INIT_MN_P[1] == cit.INIT_MN_P[2]).all()
    for qp in (0, 10, 26, 40, 51):
        for tbl in (cit.INIT_MN_I, *cit.INIT_MN_P):
            pre = np.clip(((tbl[:, 0] * qp) >> 4) + tbl[:, 1], 1, 126)
            state = np.where(pre > 63, pre - 64, 63 - pre)
            assert (state >= 0).all() and (state <= 62).all()


def test_context_models_slice_type_and_idc():
    """ContextModels selects the right table; states differ across idc."""
    i_ctx = ContextModels(30, slice_type="I")
    p0 = ContextModels(30, 0, slice_type="P")
    p1 = ContextModels(30, 1, slice_type="P")
    assert not (p0.state == p1.state).all() or not (p0.mps == p1.mps).all()
    assert (i_ctx.state >= 0).all() and (i_ctx.state <= 62).all()


@pytest.mark.parametrize("idc", [0, 1, 2])
def test_pslice_roundtrip_per_idc(idc):
    R, C = 5, 7
    mv, luma, cdc, cac = random_psymbols(R, C, 10 + idc)
    payload = cabac_slice.write_pslice_cabac(mv, luma, cdc, cac, 30,
                                             cabac_init_idc=idc)
    sym = cabac_slice.parse_pslice_cabac(payload, 0, R, C, 30,
                                         cabac_init_idc=idc)
    np.testing.assert_array_equal(sym["mv"], mv)
    np.testing.assert_array_equal(sym["luma_levels"], luma)
    np.testing.assert_array_equal(sym["cdc_levels"], cdc)
    np.testing.assert_array_equal(sym["cac_levels"], cac)


def test_wrong_idc_fails_or_differs():
    """Streams depend on the init set: parsing with the wrong idc must not
    silently yield the same symbols."""
    R, C = 4, 6
    mv, luma, cdc, cac = random_psymbols(R, C, 3)
    payload = cabac_slice.write_pslice_cabac(mv, luma, cdc, cac, 30,
                                             cabac_init_idc=2)
    try:
        sym = cabac_slice.parse_pslice_cabac(payload, 0, R, C, 30,
                                             cabac_init_idc=0)
        same = (np.array_equal(sym["mv"], mv)
                and np.array_equal(sym["luma_levels"], luma))
    except Exception:
        same = False
    assert not same


@pytest.mark.parametrize("idc", [0, 1, 2])
def test_native_pslice_byte_equal(idc):
    from media_tpu import native

    R, C = 6, 8
    mv, luma, cdc, cac = random_psymbols(R, C, 20 + idc)
    py = cabac_slice.write_pslice_cabac(mv, luma, cdc, cac, 28,
                                        cabac_init_idc=idc)
    nat = native.cabac_write_pslice_native(mv, luma, cdc, cac, 28,
                                           cabac_init_idc=idc)
    if nat is None:
        pytest.skip("native library unavailable")
    assert nat == py


def test_native_islice_byte_equal():
    from media_tpu import native

    rng = np.random.default_rng(4)
    R, C = 5, 7
    mode16 = rng.integers(0, 4, (R, C)).astype(np.int32)
    cmode = rng.integers(0, 4, (R, C)).astype(np.int32)
    dc = ((rng.integers(0, 3, (R, C, 16)) == 0)
          * rng.integers(-9, 10, (R, C, 16))).astype(np.int32)
    ac = ((rng.integers(0, 6, (R, C, 16, 15)) == 0)
          * rng.integers(-9, 10, (R, C, 16, 15))).astype(np.int32)
    cdc = ((rng.integers(0, 3, (R, C, 2, 4)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4))).astype(np.int32)
    cac = ((rng.integers(0, 7, (R, C, 2, 4, 15)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4, 15))).astype(np.int32)
    py = cabac_slice.write_islice_cabac(mode16, cmode, dc, ac, cdc, cac, 30)
    nat = native.cabac_write_islice_native(mode16, cmode, dc, ac, cdc, cac, 30)
    if nat is None:
        pytest.skip("native library unavailable")
    assert nat == py


def test_islice_i4_roundtrip():
    rng = np.random.default_rng(2)
    R, C = 5, 7
    mode16 = rng.integers(0, 4, (R, C)).astype(np.int32)
    cmode = rng.integers(0, 4, (R, C)).astype(np.int32)
    dc = ((rng.integers(0, 3, (R, C, 16)) == 0)
          * rng.integers(-9, 10, (R, C, 16))).astype(np.int32)
    ac = ((rng.integers(0, 6, (R, C, 16, 15)) == 0)
          * rng.integers(-9, 10, (R, C, 16, 15))).astype(np.int32)
    cdc = ((rng.integers(0, 3, (R, C, 2, 4)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4))).astype(np.int32)
    cac = ((rng.integers(0, 7, (R, C, 2, 4, 15)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4, 15))).astype(np.int32)
    is_i4 = rng.random((R, C)) < 0.5
    modes4 = rng.integers(0, 9, (R, C, 16)).astype(np.int32)
    luma4 = ((rng.integers(0, 5, (R, C, 16, 16)) == 0)
             * rng.integers(-9, 10, (R, C, 16, 16))).astype(np.int32)
    ac[is_i4] = 0
    dc[is_i4] = 0
    modes4[~is_i4] = 0
    luma4[~is_i4] = 0
    payload = cabac_slice.write_islice_cabac(
        mode16, cmode, dc, ac, cdc, cac, 30,
        is_i4=is_i4, modes4=modes4, luma4_levels=luma4)
    sym = cabac_slice.parse_islice_cabac(payload, 0, R, C, 30)
    np.testing.assert_array_equal(sym["is_i4"], is_i4)
    np.testing.assert_array_equal(sym["modes4"], modes4)
    np.testing.assert_array_equal(sym["luma4_levels"], luma4)
    np.testing.assert_array_equal(sym["dc_levels"], dc)
    np.testing.assert_array_equal(sym["ac_levels"], ac)
    np.testing.assert_array_equal(sym["cdc_levels"], cdc)
    np.testing.assert_array_equal(sym["cac_levels"], cac)


def test_native_islice_i4_byte_equal():
    from media_tpu import native

    rng = np.random.default_rng(9)
    R, C = 5, 7
    mode16 = rng.integers(0, 4, (R, C)).astype(np.int32)
    cmode = rng.integers(0, 4, (R, C)).astype(np.int32)
    dc = ((rng.integers(0, 3, (R, C, 16)) == 0)
          * rng.integers(-9, 10, (R, C, 16))).astype(np.int32)
    ac = ((rng.integers(0, 6, (R, C, 16, 15)) == 0)
          * rng.integers(-9, 10, (R, C, 16, 15))).astype(np.int32)
    cdc = ((rng.integers(0, 3, (R, C, 2, 4)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4))).astype(np.int32)
    cac = ((rng.integers(0, 7, (R, C, 2, 4, 15)) == 0)
           * rng.integers(-9, 10, (R, C, 2, 4, 15))).astype(np.int32)
    is_i4 = rng.random((R, C)) < 0.5
    modes4 = rng.integers(0, 9, (R, C, 16)).astype(np.int32)
    luma4 = ((rng.integers(0, 5, (R, C, 16, 16)) == 0)
             * rng.integers(-9, 10, (R, C, 16, 16))).astype(np.int32)
    ac[is_i4] = 0
    dc[is_i4] = 0
    modes4[~is_i4] = 0
    luma4[~is_i4] = 0
    py = cabac_slice.write_islice_cabac(
        mode16, cmode, dc, ac, cdc, cac, 30,
        is_i4=is_i4, modes4=modes4, luma4_levels=luma4)
    nat = native.cabac_write_islice_native(
        mode16, cmode, dc, ac, cdc, cac, 30,
        is_i4=is_i4.astype(np.int32), modes4=modes4, luma4_levels=luma4)
    if nat is None:
        pytest.skip("native library unavailable")
    assert nat == py


def scene(w, h, t, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, 2, 1)) // 4
    dx, dy = (3 * t) % 32, (2 * t) % 32
    y = big[dy : dy + h, dx : dx + w].astype(np.uint8)
    u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
    v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
    return y, u, v


def test_reference_operating_point_roundtrip():
    """CABAC + CBR + deblock + I_4x4 in ONE config (the reference's actual
    software operating point) encodes and decodes bit-exact end to end, and
    the CBR loop integrates exact CABAC bits."""
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
    from media_tpu.pipeline.decoder_tpu import TpuDecoder
    from media_tpu.utils import yuv

    w, h, fps, n = 176, 144, 30, 10
    bitrate = 700_000
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=bitrate, framerate=fps,
                        deblock=True, cabac=True, i4x4=True,
                        cabac_init_idc=1)
    sess = EncoderSession(cfg)
    aus = [sess.encode_frame(yuv.pack_i420(*scene(w, h, t))) for t in range(n)]
    p_bits = sum(len(a) * 8 for a in aus[1:])
    avg_p = p_bits / (n - 1)
    target = bitrate / fps
    assert 0.6 * target < avg_p < 1.5 * target, (avg_p, target)

    dec = TpuDecoder()
    for au in aus:
        frames = dec.decode_annexb(au)
    np.testing.assert_array_equal(frames[-1].y, np.asarray(sess.recon[0]))
    np.testing.assert_array_equal(frames[-1].u, np.asarray(sess.recon[1]))
    np.testing.assert_array_equal(frames[-1].v, np.asarray(sess.recon[2]))


def test_native_islice_cabac_parser_matches_oracle():
    """C++ I-slice CABAC parser (csrc/cabac_parse.cpp) vs the Python
    oracle: identical symbol arrays on I_16x16 and mixed I_4x4 content."""
    import numpy as np

    from media_tpu import native
    from media_tpu.entropy.cabac_slice import (
        parse_islice_cabac, write_islice_cabac,
    )

    rng = np.random.default_rng(7)
    for trial in range(3):
        R, C = 4, 5
        mode16 = rng.integers(0, 4, (R, C)).astype(np.int32)
        cm = rng.integers(0, 4, (R, C)).astype(np.int32)
        dc = ((rng.integers(0, 3, (R, C, 16)) == 0)
              * rng.integers(-9, 10, (R, C, 16))).astype(np.int32)
        ac = ((rng.integers(0, 4, (R, C, 16, 15)) == 0)
              * rng.integers(-9, 10, (R, C, 16, 15))).astype(np.int32)
        cdc = ((rng.integers(0, 3, (R, C, 2, 4)) == 0)
               * rng.integers(-9, 10, (R, C, 2, 4))).astype(np.int32)
        cac = ((rng.integers(0, 5, (R, C, 2, 4, 15)) == 0)
               * rng.integers(-9, 10, (R, C, 2, 4, 15))).astype(np.int32)
        is_i4 = rng.random((R, C)) < (0.5 if trial else 0.0)
        modes4 = rng.integers(0, 9, (R, C, 16)).astype(np.int32)
        luma4 = ((rng.integers(0, 4, (R, C, 16, 16)) == 0)
                 * rng.integers(-9, 10, (R, C, 16, 16))).astype(np.int32)
        ac[is_i4] = 0
        dc[is_i4] = 0
        luma4[~is_i4] = 0
        modes4[~is_i4] = 0
        qp = int(rng.integers(20, 40))
        payload = write_islice_cabac(mode16, cm, dc, ac, cdc, cac, qp,
                                     is_i4=is_i4, modes4=modes4,
                                     luma4_levels=luma4)
        nat = native.cabac_parse_islice_native(payload, 0, R, C, qp)
        if nat is None:
            import pytest

            pytest.skip("native library unavailable")
        ref = parse_islice_cabac(payload, 0, R, C, qp)
        for k in ref:
            if k == "covered":
                assert ref[k] == nat[k]
            else:
                np.testing.assert_array_equal(
                    np.asarray(ref[k]), np.asarray(nat[k]), err_msg=k)


def test_cabac_qp_delta_roundtrip_and_native_parity():
    """mb_qp_delta through CABAC: Python write/parse round-trip and C++
    writer/parser byte- and symbol-parity on an adaptive-QP slice."""
    import numpy as np

    from media_tpu import native
    from media_tpu.entropy.cabac_slice import (
        parse_pslice_cabac, write_pslice_cabac,
    )

    rng = np.random.default_rng(3)
    R, C = 5, 7
    mv = rng.integers(-12, 13, (R, C, 2)).astype(np.int32)
    luma = ((rng.integers(0, 5, (R, C, 16, 16)) == 0)
            * rng.integers(-8, 9, (R, C, 16, 16))).astype(np.int32)
    zero = rng.random((R, C)) < 0.3
    luma[zero] = 0
    mv[zero] = 0
    cdc = ((rng.integers(0, 4, (R, C, 2, 4)) == 0)
           * rng.integers(-8, 9, (R, C, 2, 4))).astype(np.int32)
    cac = ((rng.integers(0, 7, (R, C, 2, 4, 15)) == 0)
           * rng.integers(-8, 9, (R, C, 2, 4, 15))).astype(np.int32)
    cdc[zero] = 0
    cac[zero] = 0
    qp = 28
    qp_map = np.clip(qp + rng.integers(-3, 4, (R, C)), 0, 51).astype(np.int32)
    py = write_pslice_cabac(mv, luma, cdc, cac, qp, cabac_init_idc=1,
                            qp_map=qp_map)
    nat = native.cabac_write_pslice_native(mv, luma, cdc, cac, qp,
                                           cabac_init_idc=1, qp_map=qp_map)
    if nat is not None:
        assert nat == py
    sym = parse_pslice_cabac(py, 0, R, C, qp, cabac_init_idc=1)
    np.testing.assert_array_equal(sym["mv"], mv)
    np.testing.assert_array_equal(sym["luma_levels"], luma)
    # decoder-visible QP: deltas only coded on cbp != 0 MBs; others keep
    # the running QP — verify coded MBs land on the requested map.
    coded = (luma.any((2, 3)) | cdc.any((2, 3)) | cac.any((2, 3, 4)))
    np.testing.assert_array_equal(sym["qp_map"][coded], qp_map[coded])
    natp = native.cabac_parse_pslice_native(py, 0, R, C, qp,
                                            cabac_init_idc=1)
    if natp is not None:
        for k in ("mv", "luma_levels", "cdc_levels", "cac_levels", "qp_map"):
            np.testing.assert_array_equal(natp[k], sym[k], err_msg=k)
