"""Multi-chip frame encoding: MB-row tile sharding with ICI halo exchange.

The TPU-native replacement for the reference's multi-ASIC device pool
(ni_rsrc_allocate_auto, SURVEY.md §2.3): a frame's MB rows are sharded across
the devices of a 1-D mesh axis ("tile"). Motion-estimation search windows need
reference rows owned by the neighboring shards, so each device exchanges
`search_range`-row halos with its neighbors over ICI (`ppermute`) before
running the fully-local ME + transform + quant pipeline. Rate-control
statistics are reduced with `psum`.

GOP-level parallelism across hosts (embarrassingly parallel at IDR
boundaries) composes on a second mesh axis ("gop"): frames of different GOPs
are independent, so that axis needs no communication at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.pframe_core import INTERP_HALO, local_pframe_core


def make_tile_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), axis_names=("tile",))


def _halo_exchange_rows(local, halo: int, axis_name: str):
    """Exchange `halo` boundary rows with ring neighbors along `axis_name`.

    local: (rows, W). Returns (rows + 2*halo, W) where the first/last halo
    rows come from the previous/next shard (edge shards replicate their own
    border, matching the edge-padded single-chip reference behavior).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = local[:halo]  # my top rows -> needed by previous shard
    bot_rows = local[-halo:]  # my bottom rows -> needed by next shard

    # from_prev[i] = bot_rows of shard i-1 ; from_next[i] = top_rows of i+1
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # Edge shards: replicate own border rows (ring wrap would be wrong).
    edge_top = jnp.broadcast_to(local[0:1], (halo, local.shape[1]))
    edge_bot = jnp.broadcast_to(local[-1:], (halo, local.shape[1]))
    from_prev = jnp.where(idx == 0, edge_top, from_prev)
    from_next = jnp.where(idx == n - 1, edge_bot, from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=0)


def make_sharded_pframe_step(mesh: Mesh, height: int, width: int,
                             search_range: int = 8):
    """Build the jitted multi-chip P-frame encode step.

    Frames are sharded by MB-row tiles along the mesh's "tile" axis; returns
    a function (y, u, v, ref_y, ref_u, ref_v, qp, qp_c) -> symbol arrays
    (host-gathered) + recon planes (left device-sharded for the next frame)
    + the psum'd SAD statistic.
    """
    n_dev = mesh.devices.size
    n_rows = height // 16
    n_cols = width // 16
    if n_rows % n_dev:
        raise ValueError(f"MB rows {n_rows} not divisible by {n_dev} devices")
    rows_local = n_rows // n_dev
    if rows_local * 16 < search_range + INTERP_HALO:
        raise ValueError("tile shorter than the ME + interpolation halo")

    yspec = NamedSharding(mesh, P("tile", None))
    halo_y = search_range + INTERP_HALO
    halo_c = search_range // 2 + 2

    def _step(y, u, v, ref_y, ref_u, ref_v, qp, qp_c):
        def shard_fn(y_l, u_l, v_l, ry_l, ru_l, rv_l):
            ry_ext = _halo_exchange_rows(ry_l.astype(jnp.int32), halo_y, "tile")
            ru_ext = _halo_exchange_rows(ru_l.astype(jnp.int32), halo_c, "tile")
            rv_ext = _halo_exchange_rows(rv_l.astype(jnp.int32), halo_c, "tile")
            out = local_pframe_core(
                y_l.astype(jnp.int32), u_l.astype(jnp.int32), v_l.astype(jnp.int32),
                ry_ext, ru_ext, rv_ext, qp, qp_c,
                search_range, rows_local, n_cols,
            )
            out["sad_total"] = jax.lax.psum(out["sad_total"], "tile")
            return out

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("tile", None),) * 6,
            out_specs={
                "symbols": P("tile", None, None),
                "recon_y": P("tile", None),
                "recon_u": P("tile", None),
                "recon_v": P("tile", None),
                "sad_total": P(),
            },
        )(y, u, v, ref_y, ref_u, ref_v)

    step = jax.jit(_step, static_argnums=(6, 7))

    def wrapped(y, u, v, ref_y, ref_u, ref_v, qp: int, qp_c: int):
        args = [
            jax.device_put(jnp.asarray(a), yspec)
            for a in (y, u, v, ref_y, ref_u, ref_v)
        ]
        return step(*args, int(qp), int(qp_c))

    return wrapped
