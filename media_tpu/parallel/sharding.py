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

from ..ops import me as me_ops
from ..ops import transform as T
from ..pipeline.encoder import _mb_blocks, _blocks_mb, _mb_blocks8, _blocks8_mb


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


def _local_pframe_core(cur_y, cur_u, cur_v, ref_y_ext, ref_u, ref_v, qp, qp_c,
                       search_range: int, n_rows_local: int, n_cols: int):
    """Single-shard P-frame compute on an MB-row tile.

    ref_y_ext includes `search_range` halo rows above and below. Returns the
    per-MB symbol arrays and recon planes for the local tile plus the local
    SAD total (for the psum'd rate-control stat).
    """
    R, C = n_rows_local, n_cols
    n = R * C
    cur = cur_y.reshape(R, 16, C, 16).transpose(0, 2, 1, 3).reshape(n, 16, 16)
    cu = cur_u.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(n, 8, 8)
    cv = cur_v.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(n, 8, 8)

    # Window gather against the halo-extended reference: pad only left/right
    # (vertical halo already present).
    rs = search_range
    pad = jnp.pad(ref_y_ext, ((0, 0), (rs, rs)), mode="edge")
    r = jnp.arange(n, dtype=jnp.int32) // C
    c = jnp.arange(n, dtype=jnp.int32) % C
    span = jnp.arange(16 + 2 * rs, dtype=jnp.int32)
    rows = r[:, None] * 16 + span[None, :]  # halo offset cancels the -rs
    cols = c[:, None] * 16 + span[None, :]
    windows = pad[rows[:, :, None], cols[:, None, :]]

    mv, cost = me_ops.full_search(cur, windows, rs)
    pred = me_ops.mc_luma(windows, mv, rs)
    # Chroma MC against locally-extended chroma (halo rs//2+1 rows).
    pred_u = _mc_chroma_ext(ref_u, mv, R, C, rs)
    pred_v = _mc_chroma_ext(ref_v, mv, R, C, rs)

    res = _mb_blocks(cur - pred)
    z = T.quant_4x4(T.forward_4x4(res), qp, intra=False)
    recon = jnp.clip(pred + _blocks_mb(T.inverse_4x4(T.dequant_4x4(z, qp))), 0, 255)

    def chroma_code(o_c, pred_c):
        w_c = T.forward_4x4(_mb_blocks8(o_c - pred_c))
        dc2 = w_c[:, :, 0, 0].reshape(-1, 2, 2)
        z2 = T.quant_dc_2x2(T.hadamard_2x2(dc2), qp_c, intra=False)
        d2 = T.dequant_dc_2x2(T.hadamard_2x2(z2), qp_c)
        z_cac = T.quant_4x4(w_c, qp_c, intra=False).at[:, :, 0, 0].set(0)
        d_c = T.dequant_4x4(z_cac, qp_c).at[:, :, 0, 0].set(d2.reshape(-1, 4))
        recon_c = jnp.clip(pred_c + _blocks8_mb(T.inverse_4x4(d_c)), 0, 255)
        return z2.reshape(-1, 4), z_cac, recon_c

    zdc_u, zac_u, rec_u = chroma_code(cu, pred_u)
    zdc_v, zac_v, rec_v = chroma_code(cv, pred_v)

    def grid(x):
        return x.reshape(R, C, *x.shape[1:])

    return {
        "mv": grid(mv),
        "luma_levels": grid(T.zigzag(z)),
        "cdc_levels": grid(jnp.stack([zdc_u, zdc_v], axis=1)),
        "cac_levels": grid(jnp.stack([T.zigzag(zac_u)[..., 1:], T.zigzag(zac_v)[..., 1:]], axis=1)),
        "recon_y": grid(recon).transpose(0, 2, 1, 3).reshape(R * 16, C * 16),
        "recon_u": grid(rec_u).transpose(0, 2, 1, 3).reshape(R * 8, C * 8),
        "recon_v": grid(rec_v).transpose(0, 2, 1, 3).reshape(R * 8, C * 8),
        "sad_total": jnp.sum(cost),
    }


def _mc_chroma_ext(ref_c_ext, mv, R, C, rs):
    """Chroma MC against a chroma plane extended with rs//2+1 halo rows."""
    halo = rs // 2 + 1
    mv_c8 = 4 * mv
    ix = mv_c8[:, 0] >> 3
    iy = mv_c8[:, 1] >> 3
    fx = (mv_c8[:, 0] & 7)[:, None, None]
    fy = (mv_c8[:, 1] & 7)[:, None, None]
    pad = jnp.pad(ref_c_ext, ((0, 1), (halo, halo + 1)), mode="edge")
    h = ref_c_ext.shape[0]
    w = ref_c_ext.shape[1]
    n = R * C
    r = jnp.arange(n, dtype=jnp.int32) // C
    c = jnp.arange(n, dtype=jnp.int32) % C
    ys = jnp.clip(r[:, None] * 8 + halo + iy[:, None] + jnp.arange(9)[None, :], 0, h)
    xs = jnp.clip(c[:, None] * 8 + halo + ix[:, None] + jnp.arange(9)[None, :], 0, w + 2 * halo)
    patch = pad[ys[:, :, None], xs[:, None, :]]
    a = patch[:, :8, :8]
    b = patch[:, :8, 1:9]
    cc = patch[:, 1:9, :8]
    d = patch[:, 1:9, 1:9]
    return ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
            + (8 - fx) * fy * cc + fx * fy * d + 32) >> 6


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
    if rows_local * 16 < search_range:
        raise ValueError("tile shorter than the ME halo")

    yspec = NamedSharding(mesh, P("tile", None))
    halo_c = search_range // 2 + 1

    def _step(y, u, v, ref_y, ref_u, ref_v, qp, qp_c):
        def shard_fn(y_l, u_l, v_l, ry_l, ru_l, rv_l):
            ry_ext = _halo_exchange_rows(ry_l, search_range, "tile")
            ru_ext = _halo_exchange_rows(ru_l, halo_c, "tile")
            rv_ext = _halo_exchange_rows(rv_l, halo_c, "tile")
            out = _local_pframe_core(
                y_l, u_l, v_l, ry_ext, ru_ext, rv_ext, qp, qp_c,
                search_range, rows_local, n_cols,
            )
            out["sad_total"] = jax.lax.psum(out["sad_total"], "tile")
            return out

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("tile", None),) * 6,
            out_specs={
                "mv": P("tile", None, None),
                "luma_levels": P("tile", None, None, None),
                "cdc_levels": P("tile", None, None, None),
                "cac_levels": P("tile", None, None, None, None),
                "recon_y": P("tile", None),
                "recon_u": P("tile", None),
                "recon_v": P("tile", None),
                "sad_total": P(),
            },
        )(y, u, v, ref_y, ref_u, ref_v)

    step = jax.jit(_step, static_argnums=(6, 7))

    def wrapped(y, u, v, ref_y, ref_u, ref_v, qp: int, qp_c: int):
        args = [
            jax.device_put(jnp.asarray(a, jnp.int32), yspec)
            for a in (y, u, v, ref_y, ref_u, ref_v)
        ]
        return step(*args, int(qp), int(qp_c))

    return wrapped
