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


class DevicePool:
    """Load-aware session placement over the local devices — the analog of
    the reference's shared-memory device pool with least-load auto-allocation
    (ni_rsrc_allocate_auto, EN_ALLOC_LEAST_LOAD, vendor/netint/
    ni_rsrc_api.h:57-61,343-348) and its pixel-rate load model
    (`xcode_load_pixel`, ni_rsrc_api.h:106).

    Load unit: pixels/second of admitted work (width*height*fps per
    session). allocate() returns the n least-loaded devices for a new
    session; release() returns the capacity.
    """

    def __init__(self, devices=None):
        self._devices = list(devices if devices is not None else jax.devices())
        self._load = {i: 0 for i in range(len(self._devices))}
        self._sessions: dict[int, tuple] = {}
        self._next_id = 0

    def loads(self) -> list[int]:
        return [self._load[i] for i in range(len(self._devices))]

    def allocate(self, width: int, height: int, fps: int = 30,
                 n_devices: int = 1):
        """Least-load placement: returns (session_id, [devices])."""
        if n_devices > len(self._devices):
            raise ValueError("not enough devices in the pool")
        per_dev = (width * height * fps) // n_devices
        order = sorted(range(len(self._devices)), key=lambda i: self._load[i])
        chosen = sorted(order[:n_devices])  # mesh order stays stable
        for i in chosen:
            self._load[i] += per_dev
        sid = self._next_id
        self._next_id += 1
        self._sessions[sid] = (tuple(chosen), per_dev)
        return sid, [self._devices[i] for i in chosen]

    def release(self, session_id: int) -> None:
        chosen, per_dev = self._sessions.pop(session_id)
        for i in chosen:
            self._load[i] -= per_dev


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


def make_sharded_encode_fn(mesh: Mesh, height: int, width: int,
                           search_range: int = 8, deblock: bool = True):
    """Full multi-chip P-run encoder: each device owns one MB-row tile ==
    one slice, end to end — halo'd ME/MC + transform/quant + slice-local
    deblocking (disable_deblocking_filter_idc == 2 semantics) + the on-tile
    device CAVLC packer. Only the reference-frame halo crosses tiles (ICI
    ppermute); entropy and deblock are tile-local by construction, so the
    output slices are byte-identical to a single-chip multi-slice encode.

    Returns (fn, rows_local, cap_local): fn(ys, us, vs, ry, ru, rv, qp, qp_c)
    with ys (K, H, W) etc.; outputs (streams (K, n_dev, cap_local) uint32,
    bits (K, n_dev) int32, recon planes (device-sharded)).
    """
    n_dev = mesh.devices.size
    n_rows = height // 16
    n_cols = width // 16
    if n_rows % n_dev:
        raise ValueError(f"MB rows {n_rows} not divisible by {n_dev} devices")
    rows_local = n_rows // n_dev
    if rows_local * 16 < search_range + INTERP_HALO:
        raise ValueError("tile shorter than the ME + interpolation halo")
    halo_y = search_range + INTERP_HALO
    halo_c = search_range // 2 + 2
    cap_local = max(rows_local * 16 * width // 16, 16384 // n_dev)

    from ..entropy.device_cavlc import pack_pslice_device
    from ..pipeline.deblock_apply import deblock_pframe_from_symbols
    from ..pipeline.pframe_core import unpack_symbols_device

    def _fn(ys, us, vs, ry, ru, rv, qp, qp_c):
        def shard_fn(ys_l, us_l, vs_l, ry_l, ru_l, rv_l):
            def step(carry, frame):
                ry_l, ru_l, rv_l = carry
                ry_ext = _halo_exchange_rows(ry_l.astype(jnp.int32), halo_y, "tile")
                ru_ext = _halo_exchange_rows(ru_l.astype(jnp.int32), halo_c, "tile")
                rv_ext = _halo_exchange_rows(rv_l.astype(jnp.int32), halo_c, "tile")
                y, u, v = frame
                out = local_pframe_core(
                    y.astype(jnp.int32), u.astype(jnp.int32),
                    v.astype(jnp.int32), ry_ext, ru_ext, rv_ext, qp, qp_c,
                    search_range, rows_local, n_cols,
                )
                mv, luma, cdc, cac = unpack_symbols_device(out["symbols"])
                stream, bits = pack_pslice_device(mv, luma, cdc, cac, cap_local)
                r2 = (out["recon_y"], out["recon_u"], out["recon_v"])
                if deblock:
                    r2 = deblock_pframe_from_symbols(
                        *r2, out["symbols"], qp, qp_c, rows_local, n_cols)
                return r2, (stream, bits)

            (ry_l, ru_l, rv_l), (streams, bits) = jax.lax.scan(
                step, (jnp.asarray(ry_l, jnp.uint8), jnp.asarray(ru_l, jnp.uint8),
                       jnp.asarray(rv_l, jnp.uint8)), (ys_l, us_l, vs_l))
            return (streams[:, None, :], bits[:, None], ry_l, ru_l, rv_l)

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(None, "tile", None),) * 3 + (P("tile", None),) * 3,
            out_specs=(P(None, "tile", None), P(None, "tile"),
                       P("tile", None), P("tile", None), P("tile", None)),
        )(ys, us, vs, ry, ru, rv)

    return jax.jit(_fn), rows_local, cap_local


class ShardedEncoderSession:
    """Multi-chip encoder session: num_slices == n_devices row tiles, each
    encoded end to end on its own device (the ni_rsrc multi-ASIC analog,
    SURVEY.md §2.3). IDR frames run on the single-chip wavefront path with
    slice-local deblocking; P runs are sharded scans. Bitstreams are
    byte-identical to the equivalent single-chip multi-slice session
    (tests/test_sharded_session.py)."""

    def __init__(self, cfg, n_devices: int | None = None, devices=None):
        from ..pipeline.codec import EncoderSession
        import dataclasses

        self.mesh = make_tile_mesh(n_devices, devices)
        n_dev = self.mesh.devices.size
        cfg = dataclasses.replace(cfg, num_slices=n_dev,
                                  deblock_across_slices=False,
                                  entropy_mode="host")
        self.base = EncoderSession(cfg)
        if len(self.base.slice_rows) != n_dev:
            raise ValueError("frame too short for one slice per device")
        self.cfg = cfg
        self._fn, self.rows_local, self.cap_local = make_sharded_encode_fn(
            self.mesh, self.base._pad_h, self.base._pad_w,
            deblock=cfg.deblock)
        self._frame_spec = NamedSharding(self.mesh, P(None, "tile", None))
        self._ref_spec = NamedSharding(self.mesh, P("tile", None))

    def encode_frames(self, i420_frames) -> list[bytes]:
        from ..entropy.device_cavlc import merge_slice_data
        from ..utils import yuv

        cfg = self.cfg
        base = self.base
        planes = []
        for buf in i420_frames:
            y, u, v = yuv.split_i420(buf, cfg.width, cfg.height)
            planes.append((yuv.pad_to_mb_grid(y, 16), yuv.pad_to_mb_grid(u, 8),
                           yuv.pad_to_mb_grid(v, 8)))
        out: list[bytes] = []
        i = 0
        while i < len(planes):
            if base.frame_idx % cfg.gop_size == 0 or base.recon is None:
                out.append(base._encode_idr(*planes[i]))
                base.frame_idx += 1
                # Reshard the single-chip recon planes across the tile mesh.
                base.recon = tuple(
                    jax.device_put(np.asarray(p), self._ref_spec)
                    for p in base.recon)
                i += 1
                continue
            until_idr = cfg.gop_size - (base.frame_idx % cfg.gop_size)
            k = min(len(planes) - i, until_idr)
            ys = jax.device_put(
                np.stack([p[0] for p in planes[i : i + k]]), self._frame_spec)
            us = jax.device_put(
                np.stack([p[1] for p in planes[i : i + k]]), self._frame_spec)
            vs = jax.device_put(
                np.stack([p[2] for p in planes[i : i + k]]), self._frame_spec)
            qp = cfg.qp
            from ..ops.transform import chroma_qp

            streams, bits, ry, ru, rv = self._fn(
                ys, us, vs, *base.recon, jnp.int32(qp),
                jnp.int32(int(chroma_qp(qp))))
            base.recon = (ry, ru, rv)
            bits_h = np.asarray(bits)
            if bits_h.max() > self.cap_local * 32:
                raise RuntimeError("per-tile stream budget exceeded; lower "
                                   "the bitrate or raise cap_local")
            streams_h = np.asarray(streams)
            n_cols = base.sps.pic_width_in_mbs
            for j in range(k):
                au = b""
                for t, (r0, _r1) in enumerate(base.slice_rows):
                    bw = base._pslice_header_writer(
                        qp, first_mb=r0 * n_cols, frame_idx=base.frame_idx)
                    merge_slice_data(bw, streams_h[j, t], int(bits_h[j, t]))
                    from ..core.nal import H264NalType, wrap_nal

                    au += wrap_nal(H264NalType.SLICE, bw.get_bytes(),
                                   nal_ref_idc=2)
                out.append(au)
                base.frame_idx += 1
            i += k
        return out

    @property
    def recon(self):
        return self.base.recon
