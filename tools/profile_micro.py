#!/usr/bin/env python
"""Micro-profiles: pin down the slow ops inside pack and deblock at 1080p."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*args))
    print(f"{label:52s} {(time.perf_counter()-t0)/n*1000:9.1f} ms")
    return out


def main():
    R, C = 68, 120
    n = R * C
    rng = np.random.default_rng(0)

    # ---- pack internals ----
    from media_tpu.entropy import device_cavlc as dc

    # realistic-ish sparse levels
    luma = (rng.integers(0, 6, (R, C, 16, 16)) == 0) * rng.integers(-8, 9, (R, C, 16, 16))
    mv = rng.integers(-16, 17, (R, C, 2))
    cdc = (rng.integers(0, 4, (R, C, 2, 4)) == 0) * rng.integers(-8, 9, (R, C, 2, 4))
    cac = (rng.integers(0, 8, (R, C, 2, 4, 15)) == 0) * rng.integers(-4, 5, (R, C, 2, 4, 15))
    luma_j, mv_j, cdc_j, cac_j = map(jnp.asarray, (luma, mv, cdc, cac))
    cap = 1920 * 1088 // 16

    timeit("pack full", jax.jit(lambda a, b, c, d: dc.pack_pslice_device(b, a, c, d, cap)),
           luma_j, mv_j, cdc_j, cac_j)

    luma_flat = jnp.asarray(luma.reshape(n * 16, 16))
    nc = jnp.asarray(rng.integers(0, 16, (n * 16,)))
    codes = timeit("  encode_block_codes (luma 130k blocks)",
                   jax.jit(lambda l, c_: dc.encode_block_codes(l, c_, max_coeff=16, chroma_dc=False)),
                   luma_flat, nc)
    timeit("  _pack_codes (bucket_sum, 130k x 49 -> 16w)",
           jax.jit(lambda v, l: dc._pack_codes(v, l, dc.BLOCK_WORDS)),
           codes[0], codes[1])

    # final assembly alone: chunks -> stream
    nch = n * 27 + 1
    chunks_w = jnp.asarray(rng.integers(0, 2**31, (nch, 16)), jnp.uint32)
    chunks_b = jnp.asarray(rng.integers(0, 60, (nch,)), jnp.int32)

    def assembly(chunks_w, chunks_b):
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(chunks_b)[:-1]])
        off_w = offsets >> 5
        sh = (offsets & 31).astype(jnp.uint32)
        w_lo = chunks_w >> sh[:, None]
        prev = jnp.concatenate([jnp.zeros((nch, 1), jnp.uint32), chunks_w[:, :-1]], axis=1)
        carry = jnp.where((sh > 0)[:, None], prev << ((32 - sh) & 31)[:, None], 0)
        shifted = w_lo | carry
        spill = jnp.where(sh > 0, chunks_w[:, -1] << ((32 - sh) & 31), 0)
        shifted = jnp.concatenate([shifted, spill[:, None]], axis=1)
        shifted = jnp.where((chunks_b > 0)[:, None], shifted, 0)
        idx = off_w[:, None] + jnp.arange(17)[None, :]
        stream = jnp.zeros((cap,), jnp.uint32)
        return stream.at[idx.reshape(-1)].add(shifted.reshape(-1), mode="drop")

    timeit("  final assembly (scatter-add 3.7M)", jax.jit(assembly), chunks_w, chunks_b)

    def assembly_noscatter(chunks_w, chunks_b):
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(chunks_b)[:-1]])
        off_w = offsets >> 5
        sh = (offsets & 31).astype(jnp.uint32)
        w_lo = chunks_w >> sh[:, None]
        prev = jnp.concatenate([jnp.zeros((nch, 1), jnp.uint32), chunks_w[:, :-1]], axis=1)
        carry = jnp.where((sh > 0)[:, None], prev << ((32 - sh) & 31)[:, None], 0)
        shifted = w_lo | carry
        return jnp.sum(shifted, axis=0)

    timeit("  assembly minus scatter (shift+sum only)", jax.jit(assembly_noscatter),
           chunks_w, chunks_b)

    # searchsorted cost for the planned fix
    keys = jnp.sort(jnp.asarray(rng.integers(0, cap, (nch,)), jnp.int32))
    qs = jnp.arange(-17, cap, dtype=jnp.int32)
    timeit("  searchsorted(220k keys, 131k queries)",
           jax.jit(lambda k, q: jnp.searchsorted(k, q, side="right")), keys, qs)

    # ---- deblock internals ----
    from media_tpu.pipeline import deblock_apply as da
    from media_tpu.ops import deblock as db_ops

    y = jnp.asarray(rng.integers(0, 256, (R * 16, C * 16)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 256, (R * 8, C * 8)), jnp.int32)
    v = jnp.asarray(rng.integers(0, 256, (R * 8, C * 8)), jnp.int32)
    bs_v = jnp.asarray(rng.integers(0, 3, (R * 4, C * 4)), jnp.int32)
    bs_h = jnp.asarray(rng.integers(0, 3, (R * 4, C * 4)), jnp.int32)
    timeit("deblock full frame", jax.jit(
        lambda *a: da.deblock_frame(*a, R, C)), y, u, v, 30, 30, bs_v, bs_h, n=1)

    # gather/scatter cost model: one wave's gather+scatter done 255x
    rows_t, cols_t, mask_t = da._skew_waves(R, C)
    rows_j, cols_j, mask_j = map(jnp.asarray, (rows_t, cols_t, mask_t))
    span20 = jnp.arange(20)

    def scan_gather_scatter(yp):
        def step(yp, k):
            r = jax.lax.dynamic_index_in_dim(rows_j, k, keepdims=False)
            c = jax.lax.dynamic_index_in_dim(cols_j, k, keepdims=False)
            valid = jax.lax.dynamic_index_in_dim(mask_j, k, keepdims=False)
            rr = jnp.where(valid, r, R + 1)
            cc = jnp.where(valid, c, C + 1)
            py = rr[:, None] * 16 + span20[None, :]
            px = cc[:, None] * 16 + span20[None, :]
            patch = yp[py[:, :, None], px[:, None, :]]
            yp = yp.at[py[:, :, None], px[:, None, :]].set(patch + 1, mode="drop")
            return yp, None
        yp, _ = jax.lax.scan(step, yp, jnp.arange(rows_j.shape[0]))
        return yp

    yp0 = jnp.pad(y, ((4, 0), (4, 0)))
    timeit("  255-wave scan: gather+scatter only", jax.jit(scan_gather_scatter), yp0, n=1)
    os._exit(0)


if __name__ == "__main__":
    main()
