#!/usr/bin/env python
"""Multi-chip scaling-efficiency proxy on the virtual CPU mesh.

Times the sharded P-run encode fn (halo'd ME + deblock + per-tile entropy)
at a fixed frame size across 1/2/4/8 virtual devices and reports
fps(n) / (n * fps(1)). On the CPU mesh every 'device' shares the same host
cores, so absolute efficiency is a lower bound for real ICI-connected
chips (whose per-tile compute is truly parallel and whose halo exchange
rides ICI); what this measures faithfully is the *overhead structure* —
collective count and shard-shape effects of the tile decomposition.

Writes one JSON line per device count; the driver-visible summary goes in
ARCHITECTURE.md.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    if "jax" in sys.modules:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from media_tpu.ops.transform import chroma_qp
    from media_tpu.parallel.sharding import (
        make_sharded_encode_fn, make_tile_mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w, k = 512, 768, 2
    qp = 30
    rng = np.random.default_rng(0)
    ys = rng.integers(0, 256, (k, h, w)).astype(np.uint8)
    us = rng.integers(0, 256, (k, h // 2, w // 2)).astype(np.uint8)
    vs = rng.integers(0, 256, (k, h // 2, w // 2)).astype(np.uint8)
    ry = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ru = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    rv = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)

    results = {}
    for n in (1, 2, 4, 8):
        if len(jax.devices()) < n:
            break
        mesh = make_tile_mesh(n)
        fn, _, _ = make_sharded_encode_fn(mesh, h, w)
        fspec = NamedSharding(mesh, P(None, "tile", None))
        rspec = NamedSharding(mesh, P("tile", None))
        args = (jax.device_put(ys, fspec), jax.device_put(us, fspec),
                jax.device_put(vs, fspec), jax.device_put(ry, rspec),
                jax.device_put(ru, rspec), jax.device_put(rv, rspec),
                jnp.int32(qp), jnp.int32(int(chroma_qp(qp))))
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        fps = k / dt
        results[n] = fps
        eff = fps / (n * results[1]) if 1 in results else 1.0
        print(json.dumps({"devices": n, "fps": round(fps, 2),
                          "scaling_efficiency_vs_1chip": round(eff, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
