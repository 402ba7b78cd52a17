#!/usr/bin/env python
"""Stage-level timing of the 1080p encode pipeline on the ambient JAX backend.

Times each jitted stage separately (compile excluded) so optimization effort
goes where the wall-clock is. Prints one line per stage.

Usage: python tools/profile_stages.py [W H [K]]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from media_tpu.ops import transform as T
from media_tpu.pipeline.encoder import FrameEncoder


def sync(out):
    # block_until_ready does not actually wait on the tunneled backend;
    # force completion by downloading one element of every output leaf.
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(label, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt * 1000:9.1f} ms")
    return out


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    R, C = h // 16, w // 16
    qp = 30
    qp_c = int(T.chroma_qp(qp))
    rng = np.random.default_rng(0)

    def plane(hh, ww):
        return jnp.asarray(rng.integers(0, 256, (hh, ww)), jnp.int32)

    y, u, v = plane(h, w), plane(h // 2, w // 2), plane(h // 2, w // 2)
    ry, ru, rv = plane(h, w), plane(h // 2, w // 2), plane(h // 2, w // 2)

    print(f"backend={jax.default_backend()} {w}x{h} R={R} C={C} K={k}")

    from media_tpu.pipeline.pframe_core import (
        INTERP_HALO, local_pframe_core, unpack_symbols_device,
    )

    rs = 8
    halo_y = rs + INTERP_HALO
    halo_c = rs // 2 + 2
    ry_ext = jnp.pad(ry, ((halo_y, halo_y), (0, 0)), mode="edge")
    ru_ext = jnp.pad(ru, ((halo_c, halo_c), (0, 0)), mode="edge")
    rv_ext = jnp.pad(rv, ((halo_c, halo_c), (0, 0)), mode="edge")

    core = jax.jit(
        lambda *a: local_pframe_core(*a, rs, R, C),
    )
    out = timeit("pframe core (ME+qpel+MC+T/Q+recon)", core,
                 y, u, v, ry_ext, ru_ext, rv_ext, qp, qp_c)
    symbols = out["symbols"]

    # ME breakdown
    from media_tpu.ops import me as me_ops

    cur = y.reshape(R, 16, C, 16).transpose(0, 2, 1, 3).reshape(R * C, 16, 16)
    windows = jax.jit(
        lambda r: me_ops.gather_mb_windows(r, R, C, 16, rs)
    )(ry)
    fs = jax.jit(lambda c_, w_: me_ops.full_search(c_, w_, rs))
    mv_full, _ = timeit("  full-pel search", fs, cur, windows)

    from media_tpu.ops import interp as interp_ops
    from media_tpu.pipeline.pframe_core import refine_subpel

    pad_i = jnp.pad(ry_ext, ((0, 0), (rs + INTERP_HALO, rs + INTERP_HALO)),
                    mode="edge")

    hp = jax.jit(interp_ops.half_pel_planes)
    hp_b, hp_h, hp_j = timeit("  half-pel planes", hp, pad_i)
    rf = jax.jit(lambda *a: refine_subpel(*a, R, C, rs))
    timeit("  qpel refine (49 cand)", rf, cur, pad_i, hp_b, hp_h, hp_j, mv_full)

    # Entropy pack
    from media_tpu.entropy.device_cavlc import pack_pslice_device

    cap = max(w * h // 16, 16384)
    unpacked = jax.jit(unpack_symbols_device)(symbols)
    pk = jax.jit(lambda a, b, c_, d: pack_pslice_device(a, b, c_, d, cap))
    timeit("device CAVLC pack", pk, *unpacked)

    # Deblock
    from media_tpu.pipeline.deblock_apply import deblock_pframe_from_symbols

    db = jax.jit(
        lambda ryy, ruu, rvv, s: deblock_pframe_from_symbols(
            ryy, ruu, rvv, s, qp, qp_c, R, C)
    )
    timeit("deblock (wavefront)", db,
           out["recon_y"], out["recon_u"], out["recon_v"], symbols)

    # Full batched step
    enc = FrameEncoder(w, h)
    ys = jnp.stack([y] * k)
    us = jnp.stack([u] * k)
    vs = jnp.stack([v] * k)
    full = timeit(f"full packed batch (K={k}, deblock)",
                  enc._encode_pbatch_packed_device,
                  ys, us, vs, ry, ru, rv, jnp.int32(qp), jnp.int32(qp_c),
                  rs, True, n=1)
    per = None
    t0 = time.perf_counter()
    full = enc._encode_pbatch_packed_device(
        ys, us, vs, ry, ru, rv, jnp.int32(qp), jnp.int32(qp_c), rs, True)
    jax.block_until_ready(full)
    per = (time.perf_counter() - t0) / k
    print(f"{'  => per frame (incl host sync)':44s} {per * 1000:9.1f} ms  "
          f"({1.0 / per:.2f} fps)")
    os._exit(0)


if __name__ == "__main__":
    main()
