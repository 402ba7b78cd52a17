#!/usr/bin/env python
"""Break down encode_block_codes cost at 1080p luma scale (130k blocks)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from media_tpu.entropy import device_cavlc as dc


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
    n = 68 * 120 * 16
    mc = 16
    rng = np.random.default_rng(0)
    levels = jnp.asarray(
        (rng.integers(0, 6, (n, mc)) == 0) * rng.integers(-8, 9, (n, mc)), jnp.int32)
    n_c = jnp.asarray(rng.integers(0, 16, (n,)), jnp.int32)

    timeit("full encode_block_codes", jax.jit(
        lambda l, c: dc.encode_block_codes(l, c, max_coeff=16, chroma_dc=False)),
        levels, n_c)

    def stage_sel(levels):
        nz = (levels != 0).astype(jnp.int32)
        pos = jnp.arange(mc, dtype=jnp.int32)
        rev_cum = jnp.cumsum(nz[:, ::-1], axis=1)[:, ::-1]
        ks = jnp.arange(mc, dtype=jnp.int32)
        sel = (rev_cum[:, None, :] == (ks[None, :, None] + 1)) & (nz[:, None, :] == 1)
        lfe = jnp.sum(jnp.where(sel, levels[:, None, :], 0), axis=2)
        pfe = jnp.sum(jnp.where(sel, pos[None, None, :], 0), axis=2)
        return lfe, pfe

    lfe, pfe = timeit("  level/pos-from-end (one-hot sums)", jax.jit(stage_sel), levels)

    t1 = jnp.asarray(rng.integers(0, 4, (n,)), jnp.int32)
    nrem = jnp.asarray(rng.integers(0, 10, (n,)), jnp.int32)

    def scan_taa(lfe, t1, nrem):
        def step(suf, k):
            idx = jnp.clip(t1 + k, 0, mc - 1)
            lev = jnp.take_along_axis(lfe, idx[:, None], axis=1)[:, 0]
            active = k < nrem
            suf = jnp.where(active & (jnp.abs(lev) > 3), suf + 1, suf)
            return suf, (lev.astype(jnp.uint32), suf)
        _, (a, b) = jax.lax.scan(step, jnp.zeros((n,), jnp.int32),
                                 jnp.arange(mc, dtype=jnp.int32))
        return a, b

    timeit("  16-step scan w/ take_along_axis", jax.jit(scan_taa), lfe, t1, nrem)

    def scan_prerolled(lfe, t1, nrem):
        seqs = [lfe, jnp.roll(lfe, -1, 1), jnp.roll(lfe, -2, 1), jnp.roll(lfe, -3, 1)]
        seq = jnp.where((t1 == 0)[:, None], seqs[0],
              jnp.where((t1 == 1)[:, None], seqs[1],
              jnp.where((t1 == 2)[:, None], seqs[2], seqs[3])))
        def step(suf, xs):
            lev, k = xs
            active = k < nrem
            suf = jnp.where(active & (jnp.abs(lev) > 3), suf + 1, suf)
            return suf, (lev.astype(jnp.uint32), suf)
        _, (a, b) = jax.lax.scan(step, jnp.zeros((n,), jnp.int32),
                                 (seq.T, jnp.arange(mc, dtype=jnp.int32)))
        return a, b

    timeit("  16-step scan prerolled (no gather)", jax.jit(scan_prerolled), lfe, t1, nrem)

    # run_before lookups
    zl_idx = jnp.asarray(rng.integers(0, 7, (n, mc - 1)), jnp.int32)
    runs = jnp.asarray(rng.integers(0, 15, (n, mc - 1)), jnp.int32)

    def rb_gather(zl_idx, runs):
        return (jnp.asarray(dc._LEN_RB)[zl_idx, runs],
                jnp.asarray(dc._COD_RB)[zl_idx, runs])

    timeit("  run_before lookup (gather)", jax.jit(rb_gather), zl_idx, runs)

    def rb_mm(zl_idx, runs):
        flat = (zl_idx * 15 + runs).reshape(-1)
        onehot = (flat[:, None] == jnp.arange(105, dtype=jnp.int32)).astype(jnp.bfloat16)
        tbl = jnp.stack([jnp.asarray(dc._LEN_RB).reshape(-1),
                         jnp.asarray(dc._COD_RB).reshape(-1)], axis=1).astype(jnp.bfloat16)
        out = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32)
        out = out.astype(jnp.int32).reshape(n, mc - 1, 2)
        return out[..., 0], out[..., 1]

    timeit("  run_before lookup (one-hot matmul)", jax.jit(rb_mm), zl_idx, runs)
    os._exit(0)


if __name__ == "__main__":
    main()
