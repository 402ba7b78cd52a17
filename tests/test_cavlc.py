"""CAVLC round-trip tests over all nC contexts, block sizes, and level ranges,
plus spec-anchored known codewords."""

import random

import pytest

from media_tpu.core.bitstream import BitReader, BitWriter
from media_tpu.entropy import cavlc
from media_tpu.entropy import cavlc_tables as tables


def test_tables_valid():
    tables.validate_tables()


def roundtrip(coeffs, n_c):
    bw = BitWriter()
    tc_enc = cavlc.encode_block(bw, coeffs, n_c)
    bw.rbsp_trailing_bits()
    br = BitReader(bw.get_bytes())
    decoded, tc_dec = cavlc.decode_block(br, n_c, len(coeffs))
    assert decoded == list(coeffs), (coeffs, decoded, n_c)
    assert tc_enc == tc_dec
    return bw.bit_position


def test_empty_block():
    for n_c in [-1, 0, 1, 2, 3, 4, 7, 8, 16]:
        size = 4 if n_c == -1 else 16
        roundtrip([0] * size, n_c)


def test_single_trailing_one():
    roundtrip([1] + [0] * 15, 0)
    roundtrip([-1] + [0] * 15, 0)
    roundtrip([0] * 15 + [1], 0)


def test_known_codeword_simple():
    # TotalCoeff=0, nC in [0,2): coeff_token = '1'
    bw = BitWriter()
    cavlc.encode_block(bw, [0] * 16, 0)
    bw.rbsp_trailing_bits()
    assert bw.get_bytes() == b"\xc0"  # '1' (coeff_token) + '1' (rbsp stop bit)

    # Classic textbook example (Richardson): coeffs 0,3,0,1,-1,-1,0,1,0...
    # TotalCoeff=5, T1s=3, total_zeros=3
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    bw = BitWriter()
    cavlc.encode_block(bw, coeffs, 0)
    bits_used = bw.bit_position
    bw.rbsp_trailing_bits()
    # coeff_token(T1=3,TC=5) nC<2 = '0000100' (7 bits)
    got = "".join(f"{b:08b}" for b in bw.get_bytes())[:bits_used]
    assert got.startswith("0000100"), got
    # Full known encoding: 0000100 0 1 1 (signs) 1 (level=+3 ->'1') ... per
    # Richardson worked example the complete string is:
    assert got == "000010001110010111101101", got


@pytest.mark.parametrize("n_c", [-1, 0, 1, 2, 3, 4, 5, 7, 8, 12, 16])
@pytest.mark.parametrize("seed", range(4))
def test_roundtrip_random_sparse(n_c, seed):
    rng = random.Random(seed * 100 + n_c)
    size = 4 if n_c == -1 else 16
    for _ in range(200):
        coeffs = [0] * size
        n_nonzero = rng.randrange(0, size + 1)
        for pos in rng.sample(range(size), n_nonzero):
            mag = rng.choice([1, 1, 1, 2, 2, 3, 5, 9, 17, 40, 100, 500])
            coeffs[pos] = mag if rng.random() < 0.5 else -mag
        roundtrip(coeffs, n_c)


@pytest.mark.parametrize("size", [15, 16])
def test_roundtrip_ac_blocks(size):
    rng = random.Random(7)
    for _ in range(200):
        coeffs = [0] * size
        for pos in rng.sample(range(size), rng.randrange(size + 1)):
            coeffs[pos] = rng.randrange(-30, 31) or 1
        roundtrip(coeffs, rng.choice([0, 1, 2, 4, 8]))


def test_large_levels_escape_path():
    # Levels requiring escape codes and extended prefixes.
    for level in [8, 16, 100, 2048, 4000, 8000, 20000]:
        for sign in [1, -1]:
            roundtrip([sign * level] + [0] * 15, 0)
            roundtrip([sign * level, 1, -1, 1] + [0] * 12, 0)


def test_dense_all_ones():
    roundtrip([1, -1] * 8, 0)
    roundtrip([1] * 16, 4)
    roundtrip([-1] * 15, 2)
    roundtrip([1, -1, 1, -1], -1)


def test_suffix_length_adaptation():
    # Big levels early force suffix growth; interleave with small ones.
    coeffs = [900, -500, 300, -200, 100, -50, 20, -10, 5, -3, 2, -1, 1, 0, 0, 0]
    roundtrip(coeffs, 0)
    roundtrip(coeffs, 8)
    roundtrip(list(reversed(coeffs)), 3)


def test_cbp_mapping_roundtrip():
    for cbp in range(48):
        code_i = int(tables.CBP_TO_CODE_INTRA[cbp])
        code_p = int(tables.CBP_TO_CODE_INTER[cbp])
        assert tables.CBP_TABLE[code_i][0] == cbp
        assert tables.CBP_TABLE[code_p][1] == cbp
    # Known anchors: inter cbp=0 -> codeNum 0; intra cbp=47 -> codeNum 0.
    assert tables.CBP_TO_CODE_INTER[0] == 0
    assert tables.CBP_TO_CODE_INTRA[47] == 0
    assert tables.CBP_TO_CODE_INTER[16] == 1
    assert tables.CBP_TO_CODE_INTRA[31] == 1
