"""Transform/quant bit-exactness vs the literal scalar spec reference, and
end-to-end reconstruction error bounds for the full residual chain."""

import numpy as np
import pytest

import scalar_ref as ref
from media_tpu.ops import transform as T


def rand_residuals(n, seed=0, lo=-255, hi=255):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi + 1, size=(n, 4, 4)).astype(np.int32)


def test_forward_matches_scalar():
    blocks = rand_residuals(64)
    got = np.asarray(T.forward_4x4(blocks))
    for k in range(len(blocks)):
        np.testing.assert_array_equal(got[k], ref.forward_4x4(blocks[k]))


def test_inverse_matches_scalar():
    rng = np.random.default_rng(1)
    d = rng.integers(-60000, 60000, size=(64, 4, 4)).astype(np.int32)
    got = np.asarray(T.inverse_4x4(d))
    for k in range(len(d)):
        np.testing.assert_array_equal(got[k], ref.inverse_4x4(d[k]))


@pytest.mark.parametrize("qp", [0, 5, 12, 23, 24, 30, 35, 36, 44, 51])
@pytest.mark.parametrize("intra", [True, False])
def test_quant_dequant_match_scalar(qp, intra):
    blocks = rand_residuals(32, seed=qp)
    w = np.asarray(T.forward_4x4(blocks))
    z = np.asarray(T.quant_4x4(w, qp, intra=intra))
    d = np.asarray(T.dequant_4x4(z, qp))
    for k in range(len(blocks)):
        z_ref = ref.quant_4x4(w[k], qp, intra)
        np.testing.assert_array_equal(z[k], z_ref)
        np.testing.assert_array_equal(d[k], ref.dequant_4x4(z_ref, qp))


@pytest.mark.parametrize("qp", [0, 10, 20, 26, 30, 40, 51])
def test_residual_chain_reconstruction_error(qp):
    """fwd -> quant -> dequant -> inverse must reconstruct within ~Qstep."""
    blocks = rand_residuals(128, seed=qp)
    w = T.forward_4x4(blocks)
    z = T.quant_4x4(w, qp, intra=True)
    recon = np.asarray(T.inverse_4x4(T.dequant_4x4(z, qp)))
    qstep = 0.625 * 2 ** (qp / 6)
    err = np.abs(recon - blocks)
    # Per-coefficient quant error (intra deadzone) is up to ~2/3 Qstep and
    # combines across the 16 inverse-transform basis functions; ~1.6*Qstep
    # bounds the pixel error while still catching any gross (2x) scaling bug.
    assert err.max() <= max(qstep * 1.6 + 2, 3), (qp, err.max())


@pytest.mark.parametrize("qp", [0, 8, 16, 26, 35, 36, 40, 51])
def test_luma_dc_chain(qp):
    """Encoder DC chain (fwd hadamard + quant) against the normative decoder
    chain (scalar 8.5.10): a uniform DC field must reconstruct with the same
    gain as the AC path, within quantization error."""
    rng = np.random.default_rng(qp)
    # DC coefficients of 16 4x4 blocks, as produced by forward_4x4 (<= 255*16)
    dc = rng.integers(-4000, 4000, size=(4, 4)).astype(np.int32)
    wd = np.asarray(T.hadamard_4x4(dc[None]))[0]
    z = np.asarray(T.quant_dc_4x4(wd[None], qp))[0]
    decoded = ref.decode_luma_dc(z, qp)
    # Compare against what the AC quant-dequant chain would have produced.
    gain = (ref.MF_TABLE[qp % 6][0] * ref.V_TABLE[qp % 6][0] * 2 ** (qp // 6)) / 2 ** (15 + qp // 6)
    qstep = 0.625 * 2 ** (qp / 6)
    err = np.abs(decoded - dc * gain)
    # Least-squares slope decoded ~ slope * (dc*gain) must be ~1.0 — this is
    # the check that catches any 2x scaling bug in the DC quant chain.
    target = dc.astype(np.float64) * gain
    slope = np.sum(decoded * target) / np.sum(target * target)
    # Wide tolerance at high QP where few quant levels remain; a 2x scaling
    # bug would show slope ~0.5 or ~2.0.
    assert abs(slope - 1.0) < 0.12, (qp, slope)
    # DC quantization happens in the gain-16 Hadamard domain, so per-DC error
    # is ~10-11 Qstep (in the gain-4 output domain) by design.
    assert err.max() <= qstep * 13 + 8, (qp, err.max(), qstep)


@pytest.mark.parametrize("qp", [0, 8, 16, 26, 35, 39])
@pytest.mark.parametrize("intra", [True, False])
def test_chroma_dc_chain(qp, intra):
    rng = np.random.default_rng(qp)
    dc = rng.integers(-4000, 4000, size=(2, 2)).astype(np.int32)
    wd = np.asarray(T.hadamard_2x2(dc[None]))[0]
    z = np.asarray(T.quant_dc_2x2(wd[None], qp, intra=intra))[0]
    decoded = ref.decode_chroma_dc(z, qp)
    gain = (ref.MF_TABLE[qp % 6][0] * ref.V_TABLE[qp % 6][0] * 2 ** (qp // 6)) / 2 ** (15 + qp // 6)
    qstep = 0.625 * 2 ** (qp / 6)
    err = np.abs(decoded - dc * gain)
    target = dc.astype(np.float64) * gain
    slope = np.sum(decoded * target) / np.sum(target * target)
    assert abs(slope - 1.0) < 0.08, (qp, slope)
    # Chroma DC quantizes in the gain-4 Hadamard domain (net /2 rescale):
    # per-DC error up to ~13 Qstep by design.
    assert err.max() <= qstep * 15 + 8, (qp, err.max(), qstep)


def test_zigzag_roundtrip():
    blocks = rand_residuals(8)
    scans = np.asarray(T.zigzag(blocks))
    # First scan positions follow Table 8-13
    b = blocks[0]
    assert scans[0, 0] == b[0, 0]
    assert scans[0, 1] == b[0, 1]
    assert scans[0, 2] == b[1, 0]
    assert scans[0, 3] == b[2, 0]
    assert scans[0, 15] == b[3, 3]
    np.testing.assert_array_equal(np.asarray(T.inverse_zigzag(scans)), blocks)


def test_chroma_qp_table():
    assert T.chroma_qp(0) == 0
    assert T.chroma_qp(29) == 29
    assert T.chroma_qp(30) == 29
    assert T.chroma_qp(39) == 35
    assert T.chroma_qp(51) == 39
    assert T.chroma_qp(51, 0) == 39
    assert T.chroma_qp(26, 2) == 28


def test_hadamard_selfinverse_scale():
    x = rand_residuals(4, seed=3)
    twice = np.asarray(T.hadamard_4x4(T.hadamard_4x4(x)))
    np.testing.assert_array_equal(twice, 16 * x)
    x2 = np.random.default_rng(0).integers(-100, 100, (4, 2, 2)).astype(np.int32)
    twice2 = np.asarray(T.hadamard_2x2(T.hadamard_2x2(x2)))
    np.testing.assert_array_equal(twice2, 4 * x2)
