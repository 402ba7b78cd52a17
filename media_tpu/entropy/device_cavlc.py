"""On-device (TPU) CAVLC entropy coding for P slices.

The encoder's last host-side bottleneck is shipping per-MB symbol arrays to
the host for entropy coding (~6 MB/frame at 1080p vs ~150 KB of actual
bitstream). This module packs the slice_data bits on the TPU itself:

  stage 1 (parallel): per-MB metadata — CBP, skip flags via the shared skip
      rule, skip runs via prefix max, median MV prediction, per-block nC from
      neighbor-nnz grids;
  stage 2 (parallel): per-chunk variable-length bitstrings — every residual
      block and every MB header becomes a (words[...], nbits) pair built by a
      vectorized append chain (suffix-length adaptation runs as a 16-step
      scan across all blocks at once);
  stage 3 (bitcat tree): chunks are concatenated by a pairwise reduction —
      at every level the right sibling's bit buffer is barrel-shifted by the
      left sibling's bit count (bit shift + log2(W) conditional word rolls)
      and OR'd in. No gathers, no scatters, no matmuls: TPU scatters
      serialize and batched tiny one-hot matmuls underutilize the MXU, while
      this reduction is pure fused VPU work.

The host prepends the slice header bits, applies emulation prevention and the
RBSP stop bit. Output is byte-exact with the Python/C++ packers (tests).

Levels are clamped to +-2063 by the quant stage so every level codeword fits
the 28-bit escape (prefix 15) — larger levels cannot occur below QP~6 and the
clamp is encoder-side only, hence conformant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cavlc_tables as tables
from ..pipeline.encoder import ZSCAN_TO_RASTER

MAX_LEVEL = 2063  # keeps every level codeword <= 28 bits (see module docstring)

# ---- table tensors ----------------------------------------------------------
# coeff_token: [ctx 0..2][t1 0..3][tc 0..16] -> len/code ; chroma DC separate.
_LEN_CT = np.zeros((3, 4, 17), np.int32)
_COD_CT = np.zeros((3, 4, 17), np.int32)
for _ctx in range(3):
    for (_t1, _tc), (_l, _c) in tables.COEFF_TOKEN[_ctx].items():
        _LEN_CT[_ctx, _t1, _tc] = _l
        _COD_CT[_ctx, _t1, _tc] = _c
_LEN_CDC = np.zeros((4, 5), np.int32)
_COD_CDC = np.zeros((4, 5), np.int32)
for (_t1, _tc), (_l, _c) in tables.COEFF_TOKEN_CHROMA_DC.items():
    _LEN_CDC[_t1, _tc] = _l
    _COD_CDC[_t1, _tc] = _c
_LEN_TZ = np.zeros((15, 16), np.int32)
_COD_TZ = np.zeros((15, 16), np.int32)
for _tc in range(15):
    for _tz, (_l, _c) in enumerate(tables.TOTAL_ZEROS[_tc]):
        _LEN_TZ[_tc, _tz] = _l
        _COD_TZ[_tc, _tz] = _c
_LEN_TZC = np.zeros((3, 4), np.int32)
_COD_TZC = np.zeros((3, 4), np.int32)
for _tc in range(3):
    for _tz, (_l, _c) in enumerate(tables.TOTAL_ZEROS_CHROMA_DC[_tc]):
        _LEN_TZC[_tc, _tz] = _l
        _COD_TZC[_tc, _tz] = _c
_LEN_RB = np.zeros((7, 15), np.int32)
_COD_RB = np.zeros((7, 15), np.int32)
for _zl in range(7):
    for _r, (_l, _c) in enumerate(tables.RUN_BEFORE[_zl]):
        _LEN_RB[_zl, _r] = _l
        _COD_RB[_zl, _r] = _c

BLOCK_WORDS = 16  # 512 bits; worst-case 16-coeff block is ~480 bits
HDR_WORDS = 4


# ---- bit append primitive ---------------------------------------------------


def _append(words, bitpos, val, length):
    """Append `length` bits of `val` (MSB-first) at `bitpos` into per-row word
    buffers. words: (N, W) uint32; bitpos/val/length: (N,). length==0 rows are
    no-ops. Returns (words, bitpos)."""
    length = jnp.asarray(length, jnp.int32)
    # All codewords appended here are < 32 bits (28-bit level escapes are the
    # longest); ue() symbols that can exceed 31 bits are split by the caller.
    mask = (jnp.uint32(1) << jnp.clip(length, 0, 31).astype(jnp.uint32)) - jnp.uint32(1)
    val = jnp.asarray(val, jnp.uint32) & mask
    active = length > 0
    w = (bitpos >> 5).astype(jnp.int32)
    off = (bitpos & 31).astype(jnp.int32)
    rem = 32 - off  # in [1, 32]
    spill = jnp.maximum(length - rem, 0)
    # hi: bits that land in word w ; lo: spill bits for word w+1
    sh_hi_r = jnp.clip(spill, 0, 31).astype(jnp.uint32)
    sh_hi_l = jnp.clip(rem - length, 0, 31).astype(jnp.uint32)
    hi = jnp.where(length > rem, val >> sh_hi_r, val << sh_hi_l)
    lo_mask = (jnp.uint32(1) << jnp.clip(spill, 0, 31).astype(jnp.uint32)) - jnp.uint32(1)
    lo = (val & lo_mask) << ((32 - jnp.clip(spill, 0, 31)) & 31).astype(jnp.uint32)
    hi = jnp.where(active, hi, 0)
    lo = jnp.where(active & (spill > 0), lo, 0)

    wcount = words.shape[-1]
    lanes = jnp.arange(wcount, dtype=jnp.int32)
    words = words | jnp.where(lanes[None, :] == w[:, None], hi[:, None], 0)
    words = words | jnp.where(lanes[None, :] == (w + 1)[:, None], lo[:, None], 0)
    return words, bitpos + length


def _ue_bits(x):
    """(value, length) of ue(x) for x up to 2^16-2."""
    code = jnp.asarray(x, jnp.uint32) + 1
    n = jnp.zeros_like(x)
    for k in range(1, 18):
        n = n + (code >= (1 << k)).astype(jnp.int32)
    # bit_length(code) = n + 1?: for code in [2^k, 2^{k+1}) bit_length=k+1 and
    # our count n == k. Length of ue = 2*bit_length - 1 = 2n + 1.
    return code, 2 * n + 1


def _se_bits(x):
    code = jnp.where(x > 0, 2 * x - 1, -2 * x)
    return _ue_bits(code)


# ---- per-block CAVLC bitstring ---------------------------------------------


def _bitshift_right(words, s):
    """Shift (..., W) MSB-first bit buffers right by s in [0, 31] bits.

    s broadcasts over the leading dims. Returns (..., W + 1) uint32 (one
    spill word)."""
    s = jnp.asarray(s, jnp.uint32)[..., None]
    inv = (32 - s) & 31  # safe left-shift amount when s > 0
    prev = jnp.concatenate(
        [jnp.zeros_like(words[..., :1]), words[..., :-1]], axis=-1)
    hi = jnp.where(s > 0, (words >> s) | (prev << inv), words)
    last = jnp.where(s[..., 0] > 0, words[..., -1] << inv[..., 0],
                     jnp.uint32(0))
    return jnp.concatenate([hi, last[..., None]], axis=-1)


def _wordshift_right(words, o, max_shift: int):
    """Shift (..., W) word buffers right by o words (dynamic, 0 <= o <=
    max_shift) via binary decomposition — log2 conditional static rolls
    instead of a serializing gather."""
    out = words
    W = words.shape[-1]
    for k in range(max(1, max_shift.bit_length() if max_shift else 1)):
        sh = 1 << k
        if sh > max_shift:
            break
        if sh >= W:
            rolled = jnp.zeros_like(out)
        else:
            rolled = jnp.concatenate(
                [jnp.zeros_like(out[..., :sh]), out[..., :-sh]], axis=-1)
        out = jnp.where((((o >> k) & 1) == 1)[..., None], rolled, out)
    return out


def _bitcat_caps(n: int, leaf_w: int, out_cap: int, ratio: float,
                 arity: int):
    """Static per-level capacity schedule for bitcat_reduce."""
    caps = []
    w, leaves = leaf_w, 1
    while n > 1:
        leaves *= arity
        want = int(np.ceil(ratio * leaf_w * leaves))
        w_next = max(w + 1,
                     min(arity * w + 1, max(want, 8), max(out_cap, w + 1)))
        caps.append(w_next)
        w = w_next
        n = (n + arity - 1) // arity
    return caps


def bitcat_reduce(words, bits, out_cap: int, ratio: float = 1.0,
                  arity: int = 8):
    """Concatenate (..., N, W) MSB-first bit chunks along axis -2.

    words must be zero beyond each chunk's `bits` (..., N) valid bits.
    `arity`-way tree: within each group, chunk g is barrel-shifted by the
    exclusive prefix sum of the group's bit counts and OR'd in — contiguous
    bit ranges stay disjoint, so OR is exact concatenation. All `arity`
    shifts of a level run as ONE vectorized op over the group axis; a high
    arity therefore cuts the level count (the tree is latency-bound on its
    serial level chain, not bandwidth-bound: 8-ary turns ~18 dependent
    levels at 1080p into 6). Per-level capacities grow as min(full rate,
    ratio * worst case, out_cap); content whose contiguous spans exceed a
    level cap sets ok=False (the caller falls back to host packing).

    Returns (words (..., W_top), bits (...,), ok (...,) bool).
    """
    import functools as _ft
    import operator as _op

    words = jnp.asarray(words, jnp.uint32)
    bits = jnp.asarray(bits, jnp.int32)
    caps = _bitcat_caps(words.shape[-2], words.shape[-1], out_cap, ratio,
                        arity)
    ok = jnp.ones(words.shape[:-2], bool)
    for cap in caps:
        n = words.shape[-2]
        pad_n = (-n) % arity
        if pad_n:
            words = jnp.concatenate(
                [words, jnp.zeros(words.shape[:-2] + (pad_n, words.shape[-1]),
                                  words.dtype)], axis=-2)
            bits = jnp.concatenate(
                [bits, jnp.zeros(bits.shape[:-1] + (pad_n,), bits.dtype)],
                axis=-1)
        n = words.shape[-2]
        g_w = words.reshape(words.shape[:-2] + (n // arity, arity,
                                                words.shape[-1]))
        g_b = bits.reshape(bits.shape[:-1] + (n // arity, arity))
        w_prev = g_w.shape[-1]
        # Exclusive prefix of bit counts within each group: chunk g lands at
        # bit offset prefix[g] of the concatenated group.
        prefix = jnp.cumsum(g_b, axis=-1) - g_b  # (..., n/arity, arity)
        bs = _bitshift_right(g_w, (prefix & 31).astype(jnp.uint32))
        if bs.shape[-1] < cap:
            bs = jnp.pad(bs,
                         [(0, 0)] * (bs.ndim - 1) + [(0, cap - bs.shape[-1])])
        else:
            bs = bs[..., :cap]
        bs = _wordshift_right(bs, prefix >> 5, (arity - 1) * w_prev)
        words = _ft.reduce(_op.or_,
                           [bs[..., g, :] for g in range(arity)])
        bits = jnp.sum(g_b, axis=-1)
        ok = ok & jnp.all(bits <= 32 * cap, axis=-1)
    return words[..., 0, :], bits[..., 0], ok


def _pack_codes(vals, lens, n_words: int):
    """Concatenate per-row codeword sequences into bit buffers.

    vals/lens: (N, S) — S codewords per row, each < 32 bits (lens may be 0).
    Returns (words (N, n_words) uint32, nbits (N,)). Bitcat tree over the
    slot axis; slot sequences are bounded by n_words*32 bits by construction
    (CAVLC worst case ~460 bits per 16-coeff block), so ratio=1.0 capacities
    never overflow for any input."""
    vals = jnp.asarray(vals, jnp.uint32)
    lens = jnp.asarray(lens, jnp.int32)
    mask = (jnp.uint32(1) << jnp.clip(lens, 0, 31).astype(jnp.uint32)) - jnp.uint32(1)
    vals = vals & mask
    # MSB-first leaf words: the codeword's first bit at bit 0.
    leaf = jnp.where(lens > 0,
                     vals << ((32 - jnp.clip(lens, 0, 31)) & 31).astype(jnp.uint32),
                     jnp.uint32(0))
    words, nbits, _ = bitcat_reduce(leaf[..., None], lens, n_words,
                                    ratio=1.0)
    if words.shape[-1] < n_words:
        words = jnp.pad(
            words, [(0, 0)] * (words.ndim - 1) + [(0, n_words - words.shape[-1])])
    return words[..., :n_words], nbits


def encode_block_codes(levels, n_c, *, max_coeff: int, chroma_dc: bool):
    """Per-block CAVLC codewords as (vals, lens) slot arrays (no packing).

    levels: (N, max_coeff) int32 zig-zag coefficients (|level| <= MAX_LEVEL
    except the I-frame DC path, which is packed on the host).
    Slot layout: [coeff_token, T1-signs, mc levels, total_zeros, mc-1 runs].
    """
    n = levels.shape[0]
    mc = max_coeff
    nz = (levels != 0).astype(jnp.int32)
    total_coeff = jnp.sum(nz, axis=1)
    pos = jnp.arange(mc, dtype=jnp.int32)
    last = jnp.max(jnp.where(levels != 0, pos[None, :], -1), axis=1)
    total_zeros = jnp.where(total_coeff > 0, last + 1 - total_coeff, 0)

    # k-th nonzero from the end (one-hot over positions). Level and position
    # ride in ONE packed int32 ((level + 4096) << 5 | pos: |level| <= 2063
    # fits 13 bits) so the masked reduction runs once, not twice — exactly
    # one selected term per (row, k), so unpacking is exact.
    rev_cum = jnp.cumsum(nz[:, ::-1], axis=1)[:, ::-1]
    ks = jnp.arange(mc, dtype=jnp.int32)
    sel = (rev_cum[:, None, :] == (ks[None, :, None] + 1)) & (nz[:, None, :] == 1)
    packed = ((levels + 4096) << 5) | pos[None, :]
    packed_from_end = jnp.sum(jnp.where(sel, packed[:, None, :], 0), axis=2)
    # Empty slots decode to level -4096 / pos 0 (instead of the old 0 / 0);
    # every downstream use is gated on slot < total_coeff, and -4096 never
    # looks like a trailing one.
    level_from_end = (packed_from_end >> 5) - 4096
    pos_from_end = packed_from_end & 31

    is_one = (jnp.abs(level_from_end) == 1).astype(jnp.int32)
    t1_run = jnp.cumprod(is_one, axis=1)
    trailing_ones = jnp.minimum(jnp.minimum(jnp.sum(t1_run, axis=1), 3), total_coeff)

    # slot 0: coeff_token
    if chroma_dc:
        ct_len = jnp.asarray(_LEN_CDC)[trailing_ones, total_coeff]
        ct_val = jnp.asarray(_COD_CDC)[trailing_ones, total_coeff]
    else:
        ctx = jnp.where(n_c < 2, 0, jnp.where(n_c < 4, 1, 2))
        tbl_len = jnp.asarray(_LEN_CT)[ctx, trailing_ones, total_coeff]
        tbl_val = jnp.asarray(_COD_CT)[ctx, trailing_ones, total_coeff]
        flc_val = jnp.where(total_coeff == 0, 3,
                            ((total_coeff - 1) << 2) | trailing_ones)
        ct_len = jnp.where(n_c >= 8, 6, tbl_len)
        ct_val = jnp.where(n_c >= 8, flc_val, tbl_val)

    # slot 1: trailing-one signs
    sign_bits = jnp.zeros((n,), jnp.int32)
    for k in range(3):
        bit = (level_from_end[:, k] < 0).astype(jnp.int32)
        sign_bits = jnp.where(k < trailing_ones, (sign_bits << 1) | bit, sign_bits)

    # slots 2..2+mc-1: levels, via a light scan carrying only suffix_length.
    # The k-th coded level is level_from_end[t1 + k]; t1 <= 3, so pre-shift
    # the array by the four possible t1 values (static rolls, no gather) and
    # feed the scan its level row directly.
    n_rem = total_coeff - trailing_ones
    lev_seq = jnp.where(
        (trailing_ones == 0)[:, None], level_from_end,
        jnp.where((trailing_ones == 1)[:, None], jnp.roll(level_from_end, -1, 1),
                  jnp.where((trailing_ones == 2)[:, None],
                            jnp.roll(level_from_end, -2, 1),
                            jnp.roll(level_from_end, -3, 1))))

    def level_step(suf, xs):
        lev, k = xs
        active = k < n_rem
        lc = jnp.where(lev > 0, 2 * lev - 2, -2 * lev - 1)
        lc = jnp.where((k == 0) & (trailing_ones < 3), lc - 2, lc)
        v0 = jnp.where(
            lc < 14, jnp.uint32(1),
            jnp.where(lc < 30, jnp.uint32(1 << 4) | (lc - 14).astype(jnp.uint32),
                      jnp.uint32(1 << 12) | jnp.clip(lc - 30, 0, 4095).astype(jnp.uint32)))
        l0 = jnp.where(lc < 14, lc + 1, jnp.where(lc < 30, 19, 28))
        pfx = lc >> jnp.clip(suf, 0, 15)
        sufmask = (1 << jnp.clip(suf, 0, 15)) - 1
        vs = jnp.where(
            pfx < 15,
            (jnp.uint32(1) << suf.astype(jnp.uint32)) | (lc & sufmask).astype(jnp.uint32),
            jnp.uint32(1 << 12) | jnp.clip(lc - (15 << jnp.clip(suf, 0, 15)), 0, 4095).astype(jnp.uint32))
        ls = jnp.where(pfx < 15, pfx + 1 + suf, 28)
        val = jnp.where(suf == 0, v0, vs)
        length = jnp.where(active, jnp.where(suf == 0, l0, ls), 0)
        new_suf = jnp.where(suf == 0, 1, suf)
        new_suf = jnp.where(
            (jnp.abs(lev) > (3 << jnp.clip(new_suf - 1, 0, 5))) & (new_suf < 6),
            new_suf + 1, new_suf)
        suf = jnp.where(active, new_suf, suf)
        return suf, (val, length)

    suf0 = jnp.where((total_coeff > 10) & (trailing_ones < 3), 1, 0)
    _, (lev_vals, lev_lens) = jax.lax.scan(
        level_step, suf0, (lev_seq.T, jnp.arange(mc, dtype=jnp.int32)),
        unroll=mc)
    lev_vals = lev_vals.T  # (N, mc)
    lev_lens = lev_lens.T

    # slot 2+mc: total_zeros
    tc_idx = jnp.clip(total_coeff - 1, 0, (2 if chroma_dc else 14))
    tz_idx = jnp.clip(total_zeros, 0, (3 if chroma_dc else 15))
    if chroma_dc:
        tz_len = jnp.asarray(_LEN_TZC)[tc_idx, tz_idx]
        tz_val = jnp.asarray(_COD_TZC)[tc_idx, tz_idx]
    else:
        tz_len = jnp.asarray(_LEN_TZ)[tc_idx, tz_idx]
        tz_val = jnp.asarray(_COD_TZ)[tc_idx, tz_idx]
    tz_active = (total_coeff > 0) & (total_coeff < mc)
    tz_len = jnp.where(tz_active, tz_len, 0)

    # remaining slots: run_before codes, fully vectorized. Runs past the point
    # where zeros are exhausted are genuinely 0 (gap sum == total_zeros), so a
    # plain cumsum gives the zeros_left chain.
    kk = jnp.arange(mc - 1, dtype=jnp.int32)
    nxt = jnp.clip(kk + 1, 0, mc - 1)
    runs = jnp.where(
        (kk[None, :] + 1) < total_coeff[:, None],
        pos_from_end[:, :-1] - pos_from_end[:, nxt] - 1, 0)
    runs = jnp.clip(runs, 0, 14)
    zl = total_zeros[:, None] - (jnp.cumsum(runs, axis=1) - runs)
    active = ((kk[None, :] < total_coeff[:, None] - 1) & (zl > 0))
    zl_idx = jnp.clip(jnp.minimum(zl, 7) - 1, 0, 6)
    # The zl > 6 column (zl_idx 6) is regular — run < 7: 3-bit code 7-run;
    # run >= 7: unary (run-4 zeros then 1) — so it needs no table. The
    # remaining 6x15 table rides in ONE packed int32 constant per entry
    # (len << 12 | code), looked up by a fused select-sum (compile-time
    # constants; no 105-wide one-hot materialization, no MXU round trip).
    reg_len = jnp.where(runs < 7, 3, runs - 3)
    reg_val = jnp.where(runs < 7, 7 - runs, 1)
    packed_tbl = ((_LEN_RB[:6] << 12) | _COD_RB[:6]).reshape(-1)  # (90,)
    rb_idx = zl_idx * 15 + runs
    rb_packed = jnp.zeros_like(rb_idx)
    for i, pv in enumerate(packed_tbl.tolist()):
        if pv:
            rb_packed = rb_packed + jnp.where(rb_idx == i, jnp.int32(pv), 0)
    rb_len = jnp.where(zl_idx == 6, reg_len, rb_packed >> 12)
    rb_val = jnp.where(zl_idx == 6, reg_val, rb_packed & 0xFFF)
    rb_len = jnp.where(active, rb_len, 0)

    vals = jnp.concatenate([
        ct_val[:, None].astype(jnp.uint32),
        sign_bits[:, None].astype(jnp.uint32),
        lev_vals.astype(jnp.uint32),
        tz_val[:, None].astype(jnp.uint32),
        rb_val.astype(jnp.uint32),
    ], axis=1)
    lens = jnp.concatenate([
        ct_len[:, None], trailing_ones[:, None], lev_lens,
        tz_len[:, None], rb_len,
    ], axis=1)
    return vals, lens


def encode_blocks(levels, n_c, *, max_coeff: int, chroma_dc: bool):
    """Vectorized CAVLC for a batch of residual blocks -> packed bit buffers.

    Returns (words (N, BLOCK_WORDS) uint32, nbits (N,) int32).
    """
    vals, lens = encode_block_codes(levels, n_c, max_coeff=max_coeff,
                                    chroma_dc=chroma_dc)
    return _pack_codes(vals, lens, BLOCK_WORDS)


# ---- MB headers and frame assembly ------------------------------------------


def _append_ue(words, bitpos, x, active):
    """ue(x) split into two appends so symbols > 31 bits stay correct."""
    code, length = _ue_bits(x)
    nzeros = (length - 1) >> 1
    words, bitpos = _append(words, bitpos, jnp.zeros_like(x),
                            jnp.where(active, nzeros, 0))
    words, bitpos = _append(words, bitpos, code,
                            jnp.where(active, nzeros + 1, 0))
    return words, bitpos


def _append_se(words, bitpos, x, active):
    code = jnp.where(x > 0, 2 * x - 1, -2 * x)
    return _append_ue(words, bitpos, code, active)


def _median3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def _mb_metadata(mv, luma_levels, cdc_levels, cac_levels, R, C):
    """Stage 1: CBP, skip flags/runs, MV prediction — all parallel.

    mv: (R, C, 2) quarter-pel; luma_levels: (R, C, 16, 16) zig-zag (raster blk);
    cdc: (R, C, 2, 4); cac: (R, C, 2, 4, 15). Returns dict of per-MB tensors.
    """
    qmv = mv  # already quarter-pel

    blk_nnz = jnp.sum(luma_levels != 0, axis=3)  # (R, C, 16) per raster block
    nnz_z = jnp.stack(
        [blk_nnz[:, :, int(z)] for z in ZSCAN_TO_RASTER], axis=2)  # z-scan
    g8_any = jnp.any(nnz_z.reshape(R, C, 4, 4) > 0, axis=3)  # (R, C, 4)
    cbp_luma = jnp.sum(g8_any.astype(jnp.int32) * (1 << jnp.arange(4)), axis=2)
    cac_any = jnp.any(cac_levels != 0, axis=(2, 3, 4))
    cdc_any = jnp.any(cdc_levels != 0, axis=(2, 3))
    cbp_chroma = jnp.where(cac_any, 2, jnp.where(cdc_any, 1, 0))
    cbp = cbp_luma | (cbp_chroma << 4)

    # Neighbor MVs (actual-MV maps; all MBs are inter in our P frames).
    zmv = jnp.zeros((R, C, 2), jnp.int32)
    mv_a = jnp.concatenate([zmv[:, :1], qmv[:, :-1]], axis=1)  # left
    mv_b = jnp.concatenate([zmv[:1], qmv[:-1]], axis=0)  # top
    mv_c = jnp.concatenate([qmv[:-1, 1:], zmv[:-1, :1]], axis=1)  # top-right
    mv_c = jnp.concatenate([zmv[:1], mv_c], axis=0)
    mv_d = jnp.concatenate([zmv[:, :1], qmv[:, :-1]], axis=1)  # top-left
    mv_d = jnp.concatenate([zmv[:1], mv_d[:-1]], axis=0)

    rr = jnp.arange(R)[:, None]
    cc = jnp.arange(C)[None, :]
    c_avail_direct = (rr > 0) & (cc + 1 < C)
    c_avail_sub = (rr > 0) & (cc > 0)
    mv_c_eff = jnp.where(c_avail_direct[..., None], mv_c,
                         jnp.where(c_avail_sub[..., None], mv_d, 0))
    med = _median3(mv_a, mv_b, mv_c_eff)
    only_a = (rr == 0) & (cc > 0)
    pred = jnp.where(only_a[..., None], mv_a, med)
    # 8.4.1.3.2 rule 2: exactly one available neighbor -> its MV alone. For
    # C >= 2 this is covered by only_a; for single-MB-column pictures
    # (C == 1, r > 0) only B is available and the predictor is mvB, not
    # median(0, mvB, 0). (r==0, c==0: no neighbors, pred stays 0.)
    if C == 1:
        only_b = (rr > 0) & (cc == 0)
        pred = jnp.where(only_b[..., None], mv_b, pred)

    a_zero = jnp.all(mv_a == 0, axis=2) & (cc > 0)
    b_zero = jnp.all(mv_b == 0, axis=2) & (rr > 0)
    border = (rr == 0) | (cc == 0)
    skipmv = jnp.where((border | a_zero | b_zero)[..., None], 0, pred)

    is_skip = (cbp == 0) & jnp.all(qmv == skipmv, axis=2)

    # skip runs: for each non-skip MB, #consecutive skips before it (raster).
    flat_skip = is_skip.reshape(-1)
    n = R * C
    idxs = jnp.arange(n, dtype=jnp.int32)
    prev_nonskip = jax.lax.associative_scan(
        jnp.maximum, jnp.where(~flat_skip, idxs, -1)
    )
    prev_excl = jnp.concatenate([jnp.array([-1], jnp.int32), prev_nonskip[:-1]])
    skip_run = (idxs - prev_excl - 1).reshape(R, C)
    last_nonskip = jnp.max(jnp.where(~flat_skip, idxs, -1))
    trailing_run = (n - 1 - last_nonskip).astype(jnp.int32)

    # nC grids: luma (4R, 4C) block nnz and chroma (2, 2R, 2C).
    luma_nnz_grid = (
        blk_nnz.reshape(R, C, 4, 4).transpose(0, 2, 1, 3).reshape(R * 4, C * 4)
    )
    cac_nnz = jnp.sum(cac_levels != 0, axis=4)  # (R, C, 2, 4)
    chroma_nnz_grid = (
        cac_nnz.transpose(2, 0, 1, 3).reshape(2, R, C, 2, 2)
        .transpose(0, 1, 3, 2, 4).reshape(2, R * 2, C * 2)
    )
    # Blocks in uncoded groups / skip MBs are zero already (cbp derives from
    # nnz), so the grids are decode-consistent as-is.

    return {
        "qmv": qmv,
        "cbp": cbp,
        "cbp_luma": cbp_luma,
        "cbp_chroma": cbp_chroma,
        "pred_mv": pred,
        "is_skip": is_skip,
        "skip_run": skip_run,
        "trailing_run": trailing_run,
        "luma_nnz_grid": luma_nnz_grid,
        "chroma_nnz_grid": chroma_nnz_grid,
    }


def _nc_from_grid(grid, by, bx):
    """nC per block position arrays (vectorized availability rules)."""
    h, w = grid.shape
    a_av = bx > 0
    b_av = by > 0
    na = grid[by, jnp.clip(bx - 1, 0, w - 1)]
    nb = grid[jnp.clip(by - 1, 0, h - 1), bx]
    both = (na + nb + 1) >> 1
    return jnp.where(a_av & b_av, both,
                     jnp.where(a_av, na, jnp.where(b_av, nb, 0)))


def _nc_grid_full(grid):
    """nC for EVERY block position of an nnz grid via shifts (no gathers)."""
    h, w = grid.shape
    na = jnp.concatenate([jnp.zeros((h, 1), grid.dtype), grid[:, :-1]], axis=1)
    nb = jnp.concatenate([jnp.zeros((1, w), grid.dtype), grid[:-1, :]], axis=0)
    xs = jnp.arange(w)[None, :]
    ys = jnp.arange(h)[:, None]
    a_av = xs > 0
    b_av = ys > 0
    both = (na + nb + 1) >> 1
    return jnp.where(a_av & b_av, both,
                     jnp.where(a_av, na, jnp.where(b_av, nb, 0)))


def _ue_split(x):
    """ue(x) as two slots (zeros prefix, payload) so long symbols stay < 32b."""
    code, length = _ue_bits(x)
    nzeros = (length - 1) >> 1
    return (jnp.zeros_like(code), nzeros), (code, nzeros + 1)


def _se_split(x):
    return _ue_split(jnp.where(x > 0, 2 * x - 1, -2 * x))


def _encode_headers(meta, R, C, qp_map=None, slice_qp=None):
    """Stage 2b: per-MB header codeword slots -> packed bit buffers.

    qp_map: optional (R, C) per-MB QP — mb_qp_delta is then coded on every
    cbp != 0 MB against the running QP (associative "last coded QP" scan,
    no sequential host loop)."""
    n = R * C
    active = (~meta["is_skip"].reshape(-1)).astype(jnp.int32)
    skip_run = meta["skip_run"].reshape(-1)
    qmv = meta["qmv"].reshape(n, 2)
    pred = meta["pred_mv"].reshape(n, 2)
    cbp = meta["cbp"].reshape(-1)
    cbp_code = jnp.asarray(tables.CBP_TO_CODE_INTER)[jnp.clip(cbp, 0, 47)]

    slots = []
    for (v, l) in [
        *_ue_split(skip_run),
        *_ue_split(jnp.zeros_like(skip_run)),  # mb_type = 0
        *_se_split(qmv[:, 0] - pred[:, 0]),
        *_se_split(qmv[:, 1] - pred[:, 1]),
        *_ue_split(cbp_code),
    ]:
        slots.append((v, l * active))
    delta_active = (cbp > 0).astype(jnp.int32) * active
    if qp_map is None:
        # mb_qp_delta: se(0) == single '1' bit, only when cbp != 0.
        slots.append((jnp.ones_like(skip_run), delta_active))
    else:
        qp_flat = qp_map.reshape(-1).astype(jnp.int32)
        coded = delta_active > 0
        vals_v = jnp.where(coded, qp_flat, -1)
        incl = jax.lax.associative_scan(
            lambda a, b: jnp.where(b >= 0, b, a), vals_v)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), incl[:-1]])
        prev = jnp.where(prev >= 0, prev, jnp.asarray(slice_qp, jnp.int32))
        delta = qp_flat - prev
        # mod-52 wrap into the normative [-26, 25] window
        delta = jnp.where(delta > 25, delta - 52,
                          jnp.where(delta < -26, delta + 52, delta))
        for (v, l) in _se_split(delta):
            slots.append((v, l * delta_active))

    vals = jnp.stack([v.astype(jnp.uint32) for v, _ in slots], axis=1)
    lens = jnp.stack([l for _, l in slots], axis=1)
    return _pack_codes(vals, lens, HDR_WORDS)


def pack_pslice_device(mv, luma_levels, cdc_levels, cac_levels,
                       out_words: int, qp_map=None, slice_qp=None,
                       ratio: float = 0.25, bits_only: bool = False):
    """Full on-device P-slice packer.

    Inputs are the (R, C, ...) symbol tensors. qp_map/slice_qp select per-MB
    QP coding (see _encode_headers). Returns (stream_words (out_words,)
    uint32 — slice_data bits MSB-first from bit 0 — and total_bits () int32;
    total_bits > out_words*32 signals overflow and the caller must fall back
    to host packing).

    bits_only: skip the bitcat assembly tree and return (zeros, exact
    total_bits) — the cheap mode for rate-control feedback when the CAVLC
    stream itself is not emitted (the CABAC session packs on the host).
    """
    R, C = mv.shape[:2]
    n = R * C
    meta = _mb_metadata(mv, luma_levels, cdc_levels, cac_levels, R, C)

    # --- luma blocks: encode in z-scan order with nC from the nnz grid.
    # nC over the whole grid via shifts, then static z-scan reorder (both
    # gather-free: even constant-index takes serialize per row on TPU).
    nc_full = _nc_grid_full(meta["luma_nnz_grid"])  # (4R, 4C)
    nc_raster = (
        nc_full.reshape(R, 4, C, 4).transpose(0, 2, 1, 3).reshape(n, 16)
    )
    nc_luma = jnp.stack(
        [nc_raster[:, int(z)] for z in ZSCAN_TO_RASTER], axis=1).reshape(-1)
    lv = luma_levels.reshape(n, 16, 16)
    luma_z = jnp.stack(
        [lv[:, int(z)] for z in ZSCAN_TO_RASTER], axis=1).reshape(n * 16, 16)
    lw, lb = encode_blocks(luma_z, nc_luma, max_coeff=16, chroma_dc=False)

    g8 = jnp.arange(16) // 4
    luma_inc = (
        ((meta["cbp_luma"].reshape(-1)[:, None] >> g8[None, :]) & 1) == 1
    ) & (~meta["is_skip"].reshape(-1))[:, None]
    lb = jnp.where(luma_inc.reshape(-1), lb, 0)

    # --- chroma DC blocks (u then v per MB)
    cdc_flat = cdc_levels.reshape(n * 2, 4)
    dw, db = encode_blocks(cdc_flat, jnp.zeros((n * 2,), jnp.int32),
                           max_coeff=4, chroma_dc=True)
    cdc_inc = jnp.repeat((meta["cbp_chroma"].reshape(-1) > 0)
                         & (~meta["is_skip"].reshape(-1)), 2)
    db = jnp.where(cdc_inc, db, 0)

    # --- chroma AC blocks (u: 4 raster blocks, then v)
    def nc_c_of(grid):
        full = _nc_grid_full(grid)  # (2R, 2C)
        return full.reshape(R, 2, C, 2).transpose(0, 2, 1, 3).reshape(n, 4)

    nc_u = nc_c_of(meta["chroma_nnz_grid"][0])
    nc_v = nc_c_of(meta["chroma_nnz_grid"][1])
    nc_c = jnp.stack([nc_u, nc_v], axis=1).reshape(-1)
    cac_flat = cac_levels.reshape(n * 8, 15)
    aw, ab = encode_blocks(cac_flat, nc_c, max_coeff=15, chroma_dc=False)
    cac_inc = jnp.repeat((meta["cbp_chroma"].reshape(-1) == 2)
                         & (~meta["is_skip"].reshape(-1)), 8)
    ab = jnp.where(cac_inc, ab, 0)

    # --- headers + trailing skip-run chunk
    hw, hb = _encode_headers(meta, R, C, qp_map=qp_map, slice_qp=slice_qp)
    t_active = (meta["trailing_run"] > 0).astype(jnp.int32)[None]
    (tz_v, tz_l), (tc_v, tc_l) = _ue_split(meta["trailing_run"][None])
    tw, tb = _pack_codes(
        jnp.stack([tz_v.astype(jnp.uint32), tc_v.astype(jnp.uint32)], axis=1),
        jnp.stack([tz_l * t_active, tc_l * t_active], axis=1),
        HDR_WORDS,
    )

    # --- assembly: chunk order per MB = header, 16 luma, 2 cdc, 8 cac.
    def pad_words(w, target):
        return jnp.pad(w, ((0, 0), (0, target - w.shape[1])))

    W = BLOCK_WORDS
    chunks_w = jnp.concatenate([
        pad_words(hw, W).reshape(n, 1, W),
        lw.reshape(n, 16, W),
        dw.reshape(n, 2, W),
        aw.reshape(n, 8, W),
    ], axis=1).reshape(n * 27, W)
    chunks_b = jnp.concatenate([
        hb.reshape(n, 1),
        lb.reshape(n, 16),
        db.reshape(n, 2),
        ab.reshape(n, 8),
    ], axis=1).reshape(n * 27)
    chunks_w = jnp.concatenate([chunks_w, pad_words(tw, W)], axis=0)
    chunks_b = jnp.concatenate([chunks_b, tb], axis=0)
    if bits_only:
        return (jnp.zeros((out_words,), jnp.uint32),
                jnp.sum(chunks_b).astype(jnp.int32))
    # Excluded chunks (bits forced to 0 by cbp/skip masks) still hold their
    # codeword bits; the OR-based tree needs them fully zero.
    chunks_w = jnp.where((chunks_b > 0)[:, None], chunks_w, 0)
    # Pin the per-chunk buffers: without the barrier XLA rematerializes the
    # per-block codeword stage into the reduction levels that consume it.
    chunks_w, chunks_b = jax.lax.optimization_barrier((chunks_w, chunks_b))

    # Bitcat tree: pairwise concatenation of all chunks into the stream.
    # ratio gives every level that fraction of its theoretical worst-case bit
    # rate; content that exceeds a level cap (or the stream cap) flips ok and
    # the sentinel bit count routes the caller to the host packing fallback.
    # 0.25 = ~3.5 kbit per MB-sized span — an order of magnitude above the
    # product operating envelope (<=10 Mbps CBR is ~40 bits/MB at 1080p30) —
    # while cutting the tree's plateau-level word traffic ~3.5x vs the old
    # 0.9 (the packer is HBM/dispatch-bound, not compute-bound).
    stream, total_bits, ok = bitcat_reduce(
        chunks_w, chunks_b, out_words, ratio=ratio)
    if stream.shape[-1] < out_words:
        stream = jnp.pad(stream, (0, out_words - stream.shape[-1]))
    total_bits = jnp.where(ok, total_bits, jnp.int32(out_words) * 32 + 1)
    return stream[:out_words], total_bits


# ---- host-side merge --------------------------------------------------------


def merge_slice_data(bw, stream_words, total_bits: int) -> None:
    """Append `total_bits` bits from the device stream (uint32 words,
    MSB-first from bit 0) to a BitWriter holding the slice header, then add
    the RBSP stop bit. Vectorized byte-shift merge."""
    data = np.asarray(stream_words, dtype=np.uint32).byteswap().tobytes()
    nfull = total_bits // 8
    rem = total_bits % 8
    s = bw._nbits
    if nfull:
        arr = np.frombuffer(data[:nfull], np.uint8)
        if s == 0:
            bw._buf.extend(arr.tobytes())
        else:
            a16 = arr.astype(np.uint16)
            prev = np.empty_like(a16)
            prev[0] = bw._acc
            prev[1:] = a16[:-1]
            out = (((prev << (8 - s)) & 0xFF) | (a16 >> s)).astype(np.uint8)
            bw._buf.extend(out.tobytes())
            bw._acc = int(arr[-1]) & ((1 << s) - 1)
    if rem:
        last = data[nfull]
        bw.u(rem, last >> (8 - rem))
    bw.rbsp_trailing_bits()
