"""Native C++ CAVLC packer must produce byte-identical output to the Python
oracle on both slice types, including the continued-bit-state interface."""

import numpy as np
import pytest

from media_tpu import native
from media_tpu.core.bitstream import BitWriter
from media_tpu.pipeline import slice_coder

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def random_iframe_arrays(R, C, seed=0, density=0.3):
    rng = np.random.default_rng(seed)

    def sparse(shape, lo=-60, hi=60):
        a = rng.integers(lo, hi, size=shape).astype(np.int32)
        mask = rng.random(shape) < density
        return (a * mask).astype(np.int32)

    return dict(
        mode16=rng.integers(0, 4, (R, C)).astype(np.int32),
        chroma_mode=rng.integers(0, 4, (R, C)).astype(np.int32),
        dc_levels=sparse((R, C, 16)),
        ac_levels=sparse((R, C, 16, 15)),
        cdc_levels=sparse((R, C, 2, 4)),
        cac_levels=sparse((R, C, 2, 4, 15)),
    )


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("density", [0.0, 0.15, 0.6])
def test_islice_native_matches_python(seed, density):
    R, C = 4, 5
    arrays = random_iframe_arrays(R, C, seed, density)

    bw_py = BitWriter()
    bw_py.u(7, 0x55)  # simulate a non-byte-aligned slice header tail
    slice_coder.write_islice_mbs(bw_py, **arrays)
    bw_py.rbsp_trailing_bits()

    bw_nat = BitWriter()
    bw_nat.u(7, 0x55)
    assert native.write_islice_native(
        bw_nat, arrays["mode16"], arrays["chroma_mode"], arrays["dc_levels"],
        arrays["ac_levels"], arrays["cdc_levels"], arrays["cac_levels"],
    )
    assert bw_nat.get_bytes() == bw_py.get_bytes()


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("density", [0.0, 0.1, 0.5])
def test_pslice_native_matches_python(seed, density):
    R, C = 4, 5
    rng = np.random.default_rng(100 + seed)

    def sparse(shape, lo=-40, hi=40):
        a = rng.integers(lo, hi, size=shape).astype(np.int32)
        mask = rng.random(shape) < density
        return (a * mask).astype(np.int32)

    mv = rng.integers(-8, 9, (R, C, 2)).astype(np.int32)
    # Make some MBs skip candidates: zero mv + zero residual regions.
    mv[R // 2 :, : C // 2] = 0
    luma = sparse((R, C, 16, 16))
    luma[R // 2 :, : C // 2] = 0
    cdc = sparse((R, C, 2, 4))
    cdc[R // 2 :, : C // 2] = 0
    cac = sparse((R, C, 2, 4, 15))
    cac[R // 2 :, : C // 2] = 0

    bw_py = BitWriter()
    bw_py.u(3, 0x5)
    slice_coder.write_pslice_mbs(bw_py, mv=mv, luma_levels=luma, cdc_levels=cdc, cac_levels=cac)
    bw_py.rbsp_trailing_bits()

    bw_nat = BitWriter()
    bw_nat.u(3, 0x5)
    assert native.write_pslice_native(bw_nat, mv, luma, cdc, cac)
    assert bw_nat.get_bytes() == bw_py.get_bytes()


def test_escape_native_matches_python():
    from media_tpu.core.nal import escape_rbsp

    rng = np.random.default_rng(0)
    for _ in range(20):
        data = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255], size=rng.integers(0, 5000)).astype(np.uint8))
        assert native.escape_rbsp_native(data) == escape_rbsp(data)


@pytest.mark.parametrize("seed,density", [(0, 0.25), (1, 0.6), (2, 0.05)])
def test_pslice_native_parse_matches_python(seed, density):
    """Round-4 C++ CAVLC parser (the decode entropy hot path): symbol arrays
    recovered from a written slice must equal the Python parser's, and the
    CAVLC->CABAC transcode must be byte-equal to the Python CABAC coder."""
    R, C = 4, 5
    rng = np.random.default_rng(300 + seed)

    def sparse(shape, lo=-40, hi=40):
        a = rng.integers(lo, hi, size=shape).astype(np.int32)
        mask = rng.random(shape) < density
        return (a * mask).astype(np.int32)

    mv = rng.integers(-20, 21, (R, C, 2)).astype(np.int32)
    mv[0, : C // 2] = 0
    luma = sparse((R, C, 16, 16))
    luma[0, : C // 2] = 0
    cdc = sparse((R, C, 2, 4))
    cdc[0, : C // 2] = 0
    cac = sparse((R, C, 2, 4, 15))
    cac[0, : C // 2] = 0

    bw = BitWriter()
    slice_coder.write_pslice_mbs(bw, mv=mv, luma_levels=luma,
                                 cdc_levels=cdc, cac_levels=cac)
    bw.rbsp_trailing_bits()
    data = bw.get_bytes()

    nat = native.parse_pslice_native(data, len(data) * 8, 0, R, C, 30)
    assert nat is not None and nat["covered"] == R * C
    np.testing.assert_array_equal(nat["mv"], mv)
    np.testing.assert_array_equal(nat["luma_levels"], luma)
    np.testing.assert_array_equal(nat["cdc_levels"], cdc)
    np.testing.assert_array_equal(nat["cac_levels"], cac)

    from media_tpu.entropy.cabac_slice import write_pslice_cabac

    ref = write_pslice_cabac(mv, luma, cdc, cac, 30, cabac_init_idc=2)
    got = native.transcode_pslice_native(data, len(data) * 8, 0, R, C, 30,
                                         cabac_init_idc=2)
    assert got == ref


@pytest.mark.parametrize("idc", [0, 1, 2])
def test_cabac_pslice_native_parse_matches_python(idc):
    """C++ CABAC P-slice decoder (decode entropy hot path) must recover the
    same symbols as the Python mirror for every cabac_init_idc."""
    from media_tpu.entropy.cabac_slice import (parse_pslice_cabac,
                                               write_pslice_cabac)

    R, C = 5, 7
    rng = np.random.default_rng(40 + idc)

    def sparse(shape, density=0.2, mag=5):
        a = rng.integers(-mag, mag + 1, size=shape).astype(np.int32)
        mask = rng.random(shape) < density
        return (a * mask).astype(np.int32)

    mv = rng.integers(-22, 23, (R, C, 2)).astype(np.int32)
    mv[0, : C // 2] = 0
    luma = sparse((R, C, 16, 16))
    luma[0, : C // 2] = 0
    cdc = sparse((R, C, 2, 4))
    cdc[0, : C // 2] = 0
    cac = sparse((R, C, 2, 4, 15), density=0.05)
    cac[0, : C // 2] = 0

    payload = write_pslice_cabac(mv, luma, cdc, cac, 31, cabac_init_idc=idc)
    py = parse_pslice_cabac(payload, 0, R, C, 31, cabac_init_idc=idc)
    nat = native.cabac_parse_pslice_native(payload, 0, R, C, 31,
                                           cabac_init_idc=idc)
    assert nat is not None and nat["covered"] == py["covered"] == R * C
    for k in ("mv", "luma_levels", "cdc_levels", "cac_levels"):
        np.testing.assert_array_equal(nat[k], py[k])
