"""Device CAVLC packer vs the host Python packer: byte equality.

The device packer (entropy/device_cavlc.py) must produce slice_data bits
byte-identical to the host oracle (pipeline/slice_coder.py) for the same
symbol tensors, including the bitcat-tree assembly path. Runs on the CPU
backend (conftest), where jit semantics match the TPU exactly for integer
ops.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from media_tpu.core.bitstream import BitWriter
from media_tpu.entropy import device_cavlc as dc
from media_tpu.pipeline import slice_coder


def random_symbols(R, C, seed, density=6, big_levels=False):
    rng = np.random.default_rng(seed)
    hi = 2063 if big_levels else 8
    luma = (rng.integers(0, density, (R, C, 16, 16)) == 0) * rng.integers(
        -hi, hi + 1, (R, C, 16, 16))
    mv = rng.integers(-32, 33, (R, C, 2))
    # Some MBs fully zero with zero MV -> exercise skip runs.
    zero = rng.random((R, C)) < 0.3
    luma[zero] = 0
    mv[zero] = 0
    cdc = (rng.integers(0, 4, (R, C, 2, 4)) == 0) * rng.integers(
        -hi, hi + 1, (R, C, 2, 4))
    cac = (rng.integers(0, 8, (R, C, 2, 4, 15)) == 0) * rng.integers(
        -8, 9, (R, C, 2, 4, 15))
    cdc[zero] = 0
    cac[zero] = 0
    return (mv.astype(np.int32), luma.astype(np.int32), cdc.astype(np.int32),
            cac.astype(np.int32))


def host_bytes(mv, luma, cdc, cac):
    bw = BitWriter()
    slice_coder.write_pslice_mbs(
        bw, mv=mv, luma_levels=luma, cdc_levels=cdc, cac_levels=cac)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


import functools
import jax


@functools.partial(jax.jit, static_argnums=(4, 5))
def _pack_jit(mv, luma, cdc, cac, cap_words, ratio=0.25):
    return dc.pack_pslice_device(mv, luma, cdc, cac, cap_words, ratio=ratio)


def device_bytes(mv, luma, cdc, cac, cap_words, ratio=0.25):
    stream, bits = _pack_jit(
        jnp.asarray(mv), jnp.asarray(luma), jnp.asarray(cdc),
        jnp.asarray(cac), cap_words, ratio)
    bits = int(bits)
    assert bits <= cap_words * 32, "device packer overflowed the cap"
    bw = BitWriter()
    dc.merge_slice_data(bw, np.asarray(stream), bits)
    return bw.get_bytes()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shape", [(6, 8), (9, 11), (6, 1)])
def test_device_pack_matches_host(seed, shape):
    R, C = shape
    mv, luma, cdc, cac = random_symbols(R, C, seed)
    cap = max(R * C * 64, 16384 // 32)
    assert device_bytes(mv, luma, cdc, cac, cap) == host_bytes(mv, luma, cdc, cac)


def test_device_pack_dense_escape_levels():
    """Max-magnitude levels exercise the 28-bit escape codewords and the
    worst-case chunk sizes in the bitcat tree."""
    R, C = 5, 7
    mv, luma, cdc, cac = random_symbols(R, C, 3, density=2, big_levels=True)
    cap = R * C * 512  # generous: dense escapes approach 16 words per block
    assert device_bytes(mv, luma, cdc, cac, cap, ratio=1.0) == host_bytes(
        mv, luma, cdc, cac)


def test_device_pack_overflow_sentinel():
    """A cap far below the real size must flip the overflow sentinel, not
    produce a corrupt stream."""
    R, C = 6, 8
    mv, luma, cdc, cac = random_symbols(R, C, 4, density=2)
    stream, bits = _pack_jit(
        jnp.asarray(mv), jnp.asarray(luma), jnp.asarray(cdc),
        jnp.asarray(cac), 8)
    assert int(bits) > 8 * 32


def test_bitcat_reduce_matches_numpy():
    """Property test of the tree itself against a trivial bit concatenation."""
    rng = np.random.default_rng(0)
    n, W = 37, 3
    bits = rng.integers(0, W * 32 + 1, (n,)).astype(np.int32)
    words = np.zeros((n, W), np.uint32)
    ref = []
    for i in range(n):
        b = rng.integers(0, 2, (int(bits[i]),))
        ref.extend(b.tolist())
        for j, v in enumerate(b):
            if v:
                words[i, j // 32] |= np.uint32(1) << np.uint32(31 - (j % 32))
    out_w, out_b, ok = dc.bitcat_reduce(
        jnp.asarray(words), jnp.asarray(bits), out_cap=64, ratio=1.0)
    assert bool(ok)
    assert int(out_b) == len(ref)
    got = []
    ow = np.asarray(out_w)
    for j in range(len(ref)):
        got.append(int((ow[j // 32] >> np.uint32(31 - (j % 32))) & 1))
    assert got == ref
