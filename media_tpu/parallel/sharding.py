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


_POOL = None


def get_pool() -> "DevicePool":
    """Process-global pool over the default backend's devices — the analog
    of the reference's host-wide shared-memory resource pool
    (vendor/netint/ni_rsrc_api.h:92-96; one pool per host, sessions from
    any factory call draw from it)."""
    global _POOL
    if _POOL is None:
        _POOL = DevicePool()
    return _POOL


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


def make_sharded_iframe_fn(mesh: Mesh, height: int, width: int,
                           deblock: bool, i4x4: bool):
    """Tile-parallel intra frame: each device runs the intra wavefront on its
    own MB-row tile. With one slice per tile, intra prediction never crosses
    tile boundaries (top row unavailable at a slice start) and deblocking is
    slice-local (idc == 2), so per-tile results are identical to the
    single-chip multi-slice encode of the same geometry."""
    from ..pipeline.encoder import FrameEncoder

    n_dev = mesh.devices.size
    n_rows = height // 16
    if n_rows % n_dev:
        raise ValueError(f"MB rows {n_rows} not divisible by {n_dev} devices")
    rows_local = n_rows // n_dev
    local_enc = FrameEncoder(width, rows_local * 16)

    sym2 = P("tile", None)
    sym3 = P("tile", None, None)
    sym4 = P("tile", None, None, None)
    sym5 = P("tile", None, None, None, None)
    out_specs = {
        "mode16": sym2, "chroma_mode": sym2, "dc_levels": sym3,
        "ac_levels": sym4, "cdc_levels": sym4, "cac_levels": sym5,
        "recon_y": sym2, "recon_u": sym2, "recon_v": sym2,
    }
    if i4x4:
        out_specs.update({"is_i4": sym2, "modes4": sym3, "luma4_levels": sym4})

    def _fn(y, u, v, qp, qp_c):
        def shard_fn(y_l, u_l, v_l):
            return local_enc._encode_iframe_device(
                y_l.astype(jnp.int32), u_l.astype(jnp.int32),
                v_l.astype(jnp.int32), qp, qp_c, deblock, i4x4)

        return shard_map(
            shard_fn, mesh=mesh, in_specs=(P("tile", None),) * 3,
            out_specs=out_specs,
        )(y, u, v)

    return jax.jit(_fn)


def make_sharded_encode_cbr_fn(mesh: Mesh, height: int, width: int,
                               cap_local: int, search_range: int = 8,
                               deblock: bool = True,
                               adaptive_qp: bool = False,
                               qp_min: int = 12, qp_max: int = 44):
    """Multi-chip CBR P-run: the on-device rate-control loop of
    encoder.py:_encode_pbatch_cbr_device, tile-sharded. Per-tile EXACT bit
    counts are psum'd over ICI into the shared virtual buffer inside the
    scan, so every device tracks the identical (qp, buf, cplx) state with no
    host round trips. With adaptive_qp, the fractional-QP dither runs on
    GLOBAL MB indices (axis_index offset), and each tile codes mb_qp_delta
    against its own slice QP (QP prediction resets per slice, spec 7.4.4).

    Returns fn(ys, us, vs, ry, ru, rv, qp0, buf0, cplx0, target) ->
    (streams (K, n_dev, cap_local), bits (K, n_dev), qps (K,), recon planes,
    final (qp_f, buf, cplx))."""
    from ..entropy.device_cavlc import pack_pslice_device
    from ..pipeline.deblock_apply import deblock_pframe_from_symbols
    from ..pipeline.pframe_core import chroma_qp_device, unpack_symbols_device

    n_dev = mesh.devices.size
    n_rows = height // 16
    n_cols = width // 16
    rows_local = n_rows // n_dev
    halo_y = search_range + INTERP_HALO
    halo_c = search_range // 2 + 2
    n_mb_local = rows_local * n_cols

    def qstep(qp):
        return 0.625 * jnp.exp2(qp / 6.0)

    def _fn(ys, us, vs, ry, ru, rv, qp0, buf0, cplx0, target):
        def shard_fn(ys_l, us_l, vs_l, ry_l, ru_l, rv_l, qp0, buf0, cplx0):
            tile = jax.lax.axis_index("tile")
            mb0 = tile * n_mb_local  # global index of this tile's first MB

            def step(carry, frame):
                ry_l, ru_l, rv_l, qp_f, buf, cplx = carry
                adj_target = jnp.maximum(target - 0.35 * buf, 0.25 * target)
                want_qstep = jnp.clip(cplx / adj_target, 0.625, 1024.0)
                qp_f = jnp.clip(6.0 * jnp.log2(want_qstep / 0.625),
                                float(qp_min), float(qp_max))
                if adaptive_qp:
                    qp = jnp.floor(qp_f).astype(jnp.int32)
                    frac = qp_f - qp.astype(jnp.float32)
                    gidx = mb0 + jnp.arange(n_mb_local, dtype=jnp.int32)
                    thresh = ((gidx * 97) % 128).astype(jnp.float32) / 128.0
                    qp_map = jnp.clip(qp + (thresh < frac).astype(jnp.int32),
                                      qp_min, qp_max)
                    qp_enc = qp_map
                    qp_c_enc = chroma_qp_device(qp_map)
                    qp_c = chroma_qp_device(qp)
                else:
                    qp = jnp.clip(jnp.round(qp_f), qp_min, qp_max
                                  ).astype(jnp.int32)
                    qp_c = chroma_qp_device(qp)
                    qp_enc, qp_c_enc = qp, qp_c
                    qp_map = None

                ry_ext = _halo_exchange_rows(ry_l.astype(jnp.int32), halo_y,
                                             "tile")
                ru_ext = _halo_exchange_rows(ru_l.astype(jnp.int32), halo_c,
                                             "tile")
                rv_ext = _halo_exchange_rows(rv_l.astype(jnp.int32), halo_c,
                                             "tile")
                y, u, v = frame
                out = local_pframe_core(
                    y.astype(jnp.int32), u.astype(jnp.int32),
                    v.astype(jnp.int32), ry_ext, ru_ext, rv_ext,
                    qp_enc, qp_c_enc, search_range, rows_local, n_cols)
                mv, luma, cdc, cac = unpack_symbols_device(out["symbols"])
                stream, bits = pack_pslice_device(
                    mv, luma, cdc, cac, cap_local,
                    qp_map=(None if qp_map is None
                            else qp_map.reshape(rows_local, n_cols)),
                    slice_qp=qp)
                r2 = (out["recon_y"], out["recon_u"], out["recon_v"])
                if deblock:
                    eff_map = None
                    if adaptive_qp:
                        coded = (jnp.any(luma != 0, axis=(2, 3))
                                 | jnp.any(cdc != 0, axis=(2, 3))
                                 | jnp.any(cac != 0, axis=(2, 3, 4)))
                        vals = jnp.where(coded.reshape(-1), qp_map, -1)
                        incl = jax.lax.associative_scan(
                            lambda a, b: jnp.where(b >= 0, b, a), vals)
                        eff_map = jnp.where(incl >= 0, incl, qp).reshape(
                            rows_local, n_cols)
                    r2 = deblock_pframe_from_symbols(
                        *r2, out["symbols"], qp, qp_c, rows_local, n_cols,
                        qp_map=eff_map)
                # Shared virtual buffer: integrate the FRAME's exact bits.
                bits_tot = jax.lax.psum(bits, "tile").astype(jnp.float32)
                cplx = 0.75 * cplx + 0.25 * bits_tot * qstep(qp_f)
                buf = buf + bits_tot - target
                return (r2 + (qp_f, buf, cplx)), (stream, bits, qp)

            init = (jnp.asarray(ry_l, jnp.uint8),
                    jnp.asarray(ru_l, jnp.uint8),
                    jnp.asarray(rv_l, jnp.uint8), qp0, buf0, cplx0)
            carry, (streams, bits, qps) = jax.lax.scan(
                step, init, (ys_l, us_l, vs_l))
            ry_l, ru_l, rv_l, qp_f, buf, cplx = carry
            return (streams[:, None, :], bits[:, None], qps, ry_l, ru_l,
                    rv_l, qp_f[None], buf[None], cplx[None])

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(None, "tile", None),) * 3 + (P("tile", None),) * 3
            + (P(), P(), P()),
            out_specs=(P(None, "tile", None), P(None, "tile"), P(),
                       P("tile", None), P("tile", None), P("tile", None),
                       P(), P(), P()),
        )(ys, us, vs, ry, ru, rv, qp0, buf0, cplx0)

    return jax.jit(_fn, static_argnums=(9,))


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
        self._cbr_fns: dict = {}  # cap_local -> compiled CBR fn
        self._ifn = None
        self._frame_spec = NamedSharding(self.mesh, P(None, "tile", None))
        self._ref_spec = NamedSharding(self.mesh, P("tile", None))

    def force_keyframe(self) -> None:
        self.base.force_keyframe()

    def _encode_idr_sharded(self, y, u, v) -> bytes:
        """IDR on the mesh: tile-parallel intra wavefront, then the base
        session's slice/NAL assembly from the gathered symbols."""
        from ..ops.transform import chroma_qp
        from ..pipeline.encoder import IFrameResult

        base = self.base
        cfg = self.cfg
        if self._ifn is None:
            self._ifn = make_sharded_iframe_fn(
                self.mesh, base._pad_h, base._pad_w,
                deblock=cfg.deblock, i4x4=cfg.i4x4)
        qp_i = base._idr_qp()
        y_d = jax.device_put(y, self._ref_spec)
        u_d = jax.device_put(u, self._ref_spec)
        v_d = jax.device_put(v, self._ref_spec)
        out = self._ifn(y_d, u_d, v_d, jnp.int32(qp_i),
                        jnp.int32(int(chroma_qp(qp_i))))
        result = IFrameResult(
            mode16=np.asarray(out["mode16"]),
            chroma_mode=np.asarray(out["chroma_mode"]),
            dc_levels=np.asarray(out["dc_levels"]),
            ac_levels=np.asarray(out["ac_levels"]),
            cdc_levels=np.asarray(out["cdc_levels"]),
            cac_levels=np.asarray(out["cac_levels"]),
            recon_y=out["recon_y"],  # stays tile-sharded on the mesh
            recon_u=out["recon_u"],
            recon_v=out["recon_v"],
            is_i4=np.asarray(out["is_i4"]) if cfg.i4x4 else None,
            modes4=np.asarray(out["modes4"]) if cfg.i4x4 else None,
            luma4_levels=(np.asarray(out["luma4_levels"])
                          if cfg.i4x4 else None),
        )
        return base._idr_au_from_result(result, qp_i)

    def _cbr_fn(self, cap_local: int):
        if cap_local not in self._cbr_fns:
            self._cbr_fns[cap_local] = make_sharded_encode_cbr_fn(
                self.mesh, self.base._pad_h, self.base._pad_w, cap_local,
                deblock=self.cfg.deblock, adaptive_qp=self.cfg.adaptive_qp)
        return self._cbr_fns[cap_local]

    def _pslice_aus_from_streams(self, streams_h, bits_h, k, qps=None):
        from ..core.nal import H264NalType, wrap_nal
        from ..entropy.device_cavlc import merge_slice_data

        base = self.base
        n_cols = base.sps.pic_width_in_mbs
        out = []
        for j in range(k):
            qp = self.cfg.qp if qps is None else int(qps[j])
            au = b""
            for t, (r0, _r1) in enumerate(base.slice_rows):
                bw = base._pslice_header_writer(
                    qp, first_mb=r0 * n_cols, frame_idx=base.frame_idx)
                merge_slice_data(bw, streams_h[j, t], int(bits_h[j, t]))
                au += wrap_nal(H264NalType.SLICE, bw.get_bytes(),
                               nal_ref_idc=2)
            out.append(au)
            base.frame_idx += 1
        return out

    def encode_frames(self, i420_frames) -> list[bytes]:
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
            idr_due = (base.frame_idx % cfg.gop_size == 0
                       or base.recon is None or base._force_idr)
            if idr_due:
                base._force_idr = False
                out.append(self._encode_idr_sharded(*planes[i]))
                base.frame_idx += 1
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
            prev_recon = base.recon
            if cfg.rc_mode == "cbr":
                out.extend(self._encode_p_run_cbr_sharded(ys, us, vs, k,
                                                          prev_recon))
                i += k
                continue
            qp = cfg.qp
            from ..ops.transform import chroma_qp

            streams, bits, ry, ru, rv = self._fn(
                ys, us, vs, *prev_recon, jnp.int32(qp),
                jnp.int32(int(chroma_qp(qp))))
            base.recon = (ry, ru, rv)
            bits_h = np.asarray(bits)
            if bits_h.max() > self.cap_local * 32:
                # Per-tile budget exceeded: fall back (don't raise) to the
                # single-chip multi-slice host path for this chunk — the
                # compute math is identical, so recon/bitstream agree.
                base.recon = tuple(
                    jax.device_put(np.asarray(p), self._ref_spec)
                    for p in prev_recon)
                ys_h = np.stack([p[0] for p in planes[i : i + k]])
                us_h = np.stack([p[1] for p in planes[i : i + k]])
                vs_h = np.stack([p[2] for p in planes[i : i + k]])
                symbols, recon = base._frame_encoder.encode_pframes_batch(
                    ys_h, us_h, vs_h, *base.recon, qp, deblock=cfg.deblock)
                base.recon = tuple(
                    jax.device_put(np.asarray(p), self._ref_spec)
                    for p in recon)
                from ..pipeline.pframe_core import unpack_symbols

                for j in range(k):
                    out.append(base._pslice_au(unpack_symbols(symbols[j])))
                    base.frame_idx += 1
                i += k
                continue
            streams_h = np.asarray(streams)
            out.extend(self._pslice_aus_from_streams(streams_h, bits_h, k))
            i += k
        return out

    def _encode_p_run_cbr_sharded(self, ys, us, vs, k, prev_recon):
        """CBR P run on the mesh: exact per-frame bits psum'd into the
        shared virtual buffer inside the device scan. On per-tile cap
        overflow, retries the run at a doubled cap (same initial state =>
        identical output)."""
        base = self.base
        st = base.rc_state
        cap = self.cap_local
        while True:
            fn = self._cbr_fn(cap)
            (streams, bits, qps, ry, ru, rv, qp_f, buf, cplx) = fn(
                ys, us, vs, *prev_recon,
                jnp.float32(st["qp"]), jnp.float32(st["buf"]),
                jnp.float32(st["cplx"]), float(base._rc_target))
            bits_h = np.asarray(bits)
            if bits_h.max() <= cap * 32:
                break
            cap *= 2
            if cap > base._pad_w * base._pad_h:  # hard stop: ~21 bpp
                raise RuntimeError("CBR tile stream exceeded any budget")
        base.recon = (ry, ru, rv)
        base.rc_state = {"qp": float(np.asarray(qp_f)[0]),
                         "buf": float(np.asarray(buf)[0]),
                         "cplx": float(np.asarray(cplx)[0])}
        qps_h = np.asarray(qps)
        return self._pslice_aus_from_streams(np.asarray(streams), bits_h, k,
                                             qps=qps_h)

    @property
    def recon(self):
        return self.base.recon
