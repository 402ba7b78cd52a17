#!/usr/bin/env python
"""Isolate why the packed batch is 5.6s in the bench path but ~1ms in the
stage profiler: dtype of inputs, K, deblock on/off, content."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from media_tpu.ops.transform import chroma_qp
from media_tpu.pipeline.encoder import FrameEncoder


def t(label, fn, *args, n=2):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{label:46s} {(time.perf_counter()-t0)/n*1000:9.1f} ms")
    return out


def main():
    w, h, k = 1920, 1088, 4
    qp, rs = 30, 8
    qp_c = int(chroma_qp(qp))
    enc = FrameEncoder(w, h)
    rng = np.random.default_rng(0)
    y8 = rng.integers(0, 256, (k, h, w)).astype(np.uint8)
    u8 = rng.integers(0, 256, (k, h // 2, w // 2)).astype(np.uint8)
    v8 = rng.integers(0, 256, (k, h // 2, w // 2)).astype(np.uint8)
    ry8 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ru8 = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    rv8 = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)

    fn = enc._encode_pbatch_packed_device
    args_i32 = (jnp.asarray(y8, jnp.int32), jnp.asarray(u8, jnp.int32),
                jnp.asarray(v8, jnp.int32), jnp.asarray(ry8, jnp.int32),
                jnp.asarray(ru8, jnp.int32), jnp.asarray(rv8, jnp.int32))
    args_u8 = tuple(map(jnp.asarray, (y8, u8, v8, ry8, ru8, rv8)))
    jax.block_until_ready(args_i32)
    jax.block_until_ready(args_u8)
    qpj, qpcj = jnp.int32(qp), jnp.int32(qp_c)

    def run_dl(*a):
        st, bt, rc = fn(*a)
        return np.asarray(bt)  # forces real completion via download

    t("int32 inputs, K=4, deblock [dl]", lambda: run_dl(*args_i32, qpj, qpcj, rs, True))
    t("uint8 inputs, K=4, deblock [dl]", lambda: run_dl(*args_u8, qpj, qpcj, rs, True))
    t("uint8 inputs, K=4, no deblock [dl]", lambda: run_dl(*args_u8, qpj, qpcj, rs, False))
    t("uint8 K=4 no-deblock symbols path [dl]",
      lambda: np.asarray(enc._encode_pbatch_device(
          *args_u8, qpj, qpcj, rs, False)[1][0]))
    os._exit(0)


if __name__ == "__main__":
    main()
