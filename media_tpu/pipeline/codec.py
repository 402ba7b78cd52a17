"""Top-level encoder session: frames in, Annex-B H.264 bitstream out.

Glues the TPU frame encoder (pipeline/encoder.py), the slice-layer entropy
stage (pipeline/slice_coder.py) and the syntax layer (core/) into the
per-frame encode contract the reference exposes via EncodeOneFrame
(VideoCodecApi.h:54; VideoEncoderOpenH264.cpp:304).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from ..core.bitstream import BitWriter
from ..core.nal import H264NalType, wrap_nal
from ..core.syntax import PPS, SPS, SliceHeader
from ..utils import yuv
from . import slice_coder
from .encoder import FrameEncoder


@dataclass
class EncoderConfig:
    width: int = 1280
    height: int = 720
    qp: int = 28
    gop_size: int = 30
    level_idc: int = 40
    profile: str = "baseline"
    # Where P-slice entropy packing runs: "device" keeps it on the TPU
    # (downloads only the real bitstream — right when host<->device bandwidth
    # is the wall), "host" downloads symbols for the native C++ packer (right
    # on CPU backends), "auto" picks by backend.
    entropy_mode: str = "auto"
    # Rate control: "cq" = constant QP (cfg.qp); "cbr" = on-device CBR loop
    # targeting cfg.bitrate at cfg.framerate (RC_BITRATE_MODE semantics,
    # reference codec_app_def.h:268-275).
    rc_mode: str = "cq"
    bitrate: int = 5_000_000
    framerate: int = 30
    # In-loop deblocking (spec 8.7). Encoder and decoder implement matching
    # filters; disable to get the deblock-free conformance point.
    deblock: bool = True
    # Slices per frame (SM_FIXEDSLCNUM analog): contiguous MB-row bands with
    # independent entropy state; the multi-chip tile unit.
    num_slices: int = 1
    # False selects disable_deblocking_filter_idc == 2: deblocking stays on
    # but never crosses slice boundaries, making each slice's reconstruction
    # fully local — the property the multi-chip tile path relies on (each
    # device owns one slice end to end, only the ME halo crosses tiles).
    deblock_across_slices: bool = True
    # Carry the frame rate in-band as SPS VUI timing info (E.2.1), so players
    # recover fps without out-of-band config (the reference only passes fps to
    # the vendor encoder, VideoEncoderOpenH264.cpp:237).
    signal_timing: bool = True
    # Emit an access_unit_delimiter NAL before each AU (7.3.2.4).
    insert_aud: bool = False
    # Emit recovery_point + user_data_unregistered SEI on each IDR (D.1.7-8).
    insert_sei: bool = False
    # CABAC entropy coding (spec 9.3; the reference's actual operating point:
    # VideoEncoderOpenH264.cpp:291 sets iEntropyCodingModeFlag = 1). Forces
    # main profile; composes with rc_mode="cbr" (device CAVLC rate loop +
    # C++ CAVLC->CABAC transcode) and adaptive_qp (per-MB mb_qp_delta rides
    # through the transcode); see entropy/cabac_*.py.
    cabac: bool = False
    # I_4x4 intra prediction (9 directional modes, per-MB I4x4/I16 decision)
    # in I frames — the biggest intra quality lever below 16x16 granularity.
    i4x4: bool = False
    # P-slice CABAC context-init set (slice header cabac_init_idc, spec
    # 9.3.1.1): selects one of three fitted (m, n) tables; see
    # entropy/cabac_init_tables.py for provenance.
    cabac_init_idc: int = 0
    # Per-MB QP modulation (mb_qp_delta) under CBR: realizes fractional QP,
    # tightening rate granularity from one QP step (~12% bits) to ~1%.
    # Composes with deblock (spec 8.7.2 per-edge qPav thresholds).
    adaptive_qp: bool = False
    # B frames between P anchors (IBPBP display order; coding order
    # reorders each B after its future reference). 0 or 1 supported: 1
    # inserts one non-reference B_Bi_16x16 picture between consecutive
    # anchors, with POC type 0 carrying display order. CAVLC + CQ today.
    b_frames: int = 0
    # Mathematically lossless encode: every frame is an IDR whose
    # macroblocks are all I_PCM (spec 7.3.5, mb_type 25) — raw 8-bit
    # samples in the bitstream, so any conformant decoder reproduces the
    # input bit-exactly (the BASELINE.json "bit-exact lossless" clause;
    # the reference's SW encoder exposes no lossless mode of its own).
    # Forces CAVLC headers and disables deblocking (I_PCM MBs carry QP 0,
    # which makes the filter a no-op anyway).
    lossless: bool = False


class EncoderSession:
    """Stateful H.264 encoder: IDR + P-frame GOP structure, fixed QP (v1)."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        if cfg.lossless:
            cfg.deblock = False
            cfg.cabac = False
            cfg.rc_mode = "cq"
        if cfg.b_frames:
            if cfg.cabac or cfg.rc_mode != "cq" or cfg.num_slices != 1:
                raise ValueError(
                    "b_frames requires CAVLC, rc_mode='cq', single slice")
            # Display order != coding order: POC type 2 is forbidden with
            # reordering (spec 8.2.1); carry display order as POC type 0.
            self.sps = SPS.for_size(cfg.width, cfg.height,
                                    level_idc=cfg.level_idc,
                                    pic_order_cnt_type=0,
                                    log2_max_pic_order_cnt_lsb=16,
                                    max_num_ref_frames=2)
        else:
            self.sps = SPS.for_size(cfg.width, cfg.height,
                                    level_idc=cfg.level_idc)
        if cfg.signal_timing and cfg.framerate > 0:
            self.sps.vui_timing = (1, 2 * cfg.framerate)
        self.pps = PPS(pic_init_qp=cfg.qp, deblocking_filter_control_present=True)
        if cfg.cabac:
            # CABAC needs >= main profile; the baseline constraint flag off.
            from ..core.syntax import PROFILE_BY_NAME

            self.sps.profile_idc = max(self.sps.profile_idc,
                                       PROFILE_BY_NAME["main"])
            self.pps.entropy_coding_mode = 1
        pad_w = self.sps.pic_width_in_mbs * 16
        pad_h = self.sps.pic_height_in_mbs * 16
        n_rows = self.sps.pic_height_in_mbs
        ns = max(1, min(cfg.num_slices, n_rows))
        bounds = [round(i * n_rows / ns) for i in range(ns + 1)]
        self.slice_rows = [
            (bounds[i], bounds[i + 1]) for i in range(ns) if bounds[i] < bounds[i + 1]
        ]
        self._frame_encoder = FrameEncoder(
            pad_w, pad_h, slice_rows=tuple(r0 for r0, _ in self.slice_rows[1:])
        )
        if not cfg.deblock_across_slices and len(self.slice_rows) > 1:
            self._frame_encoder.deblock_slice_starts = tuple(
                r0 for r0, _ in self.slice_rows[1:])
        self._deblock_idc = (
            0 if cfg.deblock_across_slices or len(self.slice_rows) == 1 else 2
        ) if cfg.deblock else 1
        self._pad_w, self._pad_h = pad_w, pad_h
        self.frame_idx = 0
        self.idr_pic_id = 0
        self._force_idr = False
        self.recon = None  # (y, u, v) reference planes
        # High-water-mark of per-frame slice_data bits, for right-sizing the
        # device stream buffer (the buffer is downloaded every frame).
        self._bits_hwm: int | None = None
        # CBR state: virtual buffer + complexity model (bits*qstep EWMA).
        target = cfg.bitrate / max(cfg.framerate, 1)
        self._rc_target = target
        self.rc_state = {
            "qp": float(cfg.qp),
            "buf": 0.0,
            "cplx": target * 0.625 * 2 ** (cfg.qp / 6.0),
        }
        # CABAC-CBR batch state: the device rate loop runs on CAVLC bit
        # counts scaled by the running CABAC/CAVLC ratio; the host corrects
        # the virtual buffer with exact AU sizes one chunk later.
        self._rc_dev = None   # (qp_f, buf, cplx) device scalars
        self._rc_corr = 0.0   # pending actual-minus-estimated bits
        self._cabac_scale = 0.92
        # B-GOP state: display index since the IDR and the next reference
        # picture's frame_num (B pictures are non-reference; their
        # frame_num is PrevRefFrameNum + 1, spec 7.4.3).
        self._display_since_idr: int | None = None
        self._ref_frame_num = 1
        # Pristine RC state for deterministic per-GOP resets (GOP-parallel
        # dispatch re-budgets each GOP independently — the reference's
        # sessions are independent per stream too).
        self._rc_init = dict(self.rc_state)

    def reset_gop_state(self, idr_pic_id: int = 0) -> None:
        """Reset to a pristine GOP boundary: the next frame is an IDR and
        every piece of adaptive state (reference planes, rate control,
        stream-cap high-water-mark) returns to its initial value, so a GOP
        encoded after this call is byte-identical no matter what preceded
        it. Used by the GOP-parallel dispatchers (thread + process) and by
        per-worker warmup."""
        self.recon = None
        self.frame_idx = 0
        self.idr_pic_id = idr_pic_id & 0xFFFF
        self._force_idr = False
        self._bits_hwm = None
        self.rc_state = dict(self._rc_init)
        self._rc_dev = None
        self._rc_corr = 0.0
        self._cabac_scale = 0.92
        self._display_since_idr = None
        self._ref_frame_num = 1

    def force_keyframe(self) -> None:
        """Analog of the reference's keyframe poll + ForceIntraFrame
        (VideoEncoderOpenH264.cpp:333-341,406-410)."""
        self._force_idr = True

    def _device_cap(self) -> int:
        """Static word size for the per-frame device stream buffer.

        Bucketed power of two at >= 4x the recent high-water-mark of frame
        bits (min 64 KiB): the buffer is downloaded per frame, so it is
        sized near the real bitrate rather than the worst-case budget.
        Overflow retries the chunk at the full budget (still on device);
        power-of-two bucketing bounds recompiles to a handful per session.
        """
        full = self._frame_encoder.cap_words
        if self._bits_hwm is None:
            return full
        want = (self._bits_hwm * 4) // 32
        cap = 16384
        while cap < want:
            cap *= 2
        return min(cap, full)

    def _note_bits(self, max_bits: int) -> None:
        """Track the per-frame bits high-water-mark (slow 10% decay so the
        cap can shrink after a transient)."""
        hwm = self._bits_hwm
        self._bits_hwm = (max_bits if hwm is None
                          else max(max_bits, int(hwm * 0.9)))

    @staticmethod
    def _prefix_words(max_bits: int, cap: int) -> int:
        from .encoder import stream_prefix_words

        return stream_prefix_words(max_bits, cap)

    def encode_frame(self, i420: bytes | np.ndarray) -> bytes:
        """Encode one I420 frame; returns the Annex-B bytes for this AU."""
        cfg = self.cfg
        y, u, v = yuv.split_i420(i420, cfg.width, cfg.height)
        y = yuv.pad_to_mb_grid(y, 16)
        u = yuv.pad_to_mb_grid(u, 8)
        v = yuv.pad_to_mb_grid(v, 8)

        if cfg.lossless:
            data = self._encode_ipcm(y, u, v)
            self.frame_idx += 1
            return data
        if cfg.b_frames:
            # Single-frame call in B mode: encode as an anchor (no B can be
            # inserted without lookahead); counters stay consistent.
            return self._encode_frames_bgop([(y, u, v)])[0]
        is_idr = (
            self.frame_idx % cfg.gop_size == 0
            or self._force_idr
            or self.recon is None
        )
        self._force_idr = False
        if is_idr:
            data = self._encode_idr(y, u, v)
        else:
            data = self._encode_p(y, u, v)
        self.frame_idx += 1
        return data

    # P-run pipeline chunk size: small enough that upload(i+1), compute(i)
    # and download(i-1) overlap (transfers are DMA-concurrent with compute),
    # large enough to amortize per-dispatch latency.
    PIPELINE_CHUNK = 4

    def upload_frames(self, i420_frames) -> list:
        """Pre-stage a run of P frames in device HBM.

        Splits/pads the frames exactly like encode_frames, uploads them as
        PIPELINE_CHUNK-sized device batches and blocks until the copies land,
        so a subsequent encode_frames_staged call measures pure encoder
        throughput with input already resident (the operating point of a
        production pipeline whose frame source — decoder, display surface,
        DMA — is co-located with the chip; reference analog: NETINT hwframes,
        VideoDecoderNetint.cpp hwupload path). Returns an opaque chunk list.
        """
        cfg = self.cfg
        planes = []
        for buf in i420_frames:
            y, u, v = yuv.split_i420(buf, cfg.width, cfg.height)
            planes.append((
                yuv.pad_to_mb_grid(y, 16),
                yuv.pad_to_mb_grid(u, 8),
                yuv.pad_to_mb_grid(v, 8),
            ))
        chunks = []
        i = 0
        while i < len(planes):
            k = min(len(planes) - i, self.PIPELINE_CHUNK)
            ys = np.stack([p[0] for p in planes[i : i + k]])
            us = np.stack([p[1] for p in planes[i : i + k]])
            vs = np.stack([p[2] for p in planes[i : i + k]])
            chunks.append((jax.device_put(ys), jax.device_put(us),
                           jax.device_put(vs), ys, us, vs, k))
            i += k
        for ch in chunks:
            jax.block_until_ready(ch[0:3])
        return chunks

    def encode_frames_staged(self, chunks) -> list[bytes]:
        """Encode P-frame chunks pre-staged by upload_frames. Bitstream is
        identical to encode_frames on the same frames. The session must be
        mid-GOP (a reference frame exists and no IDR falls inside the run)."""
        cfg = self.cfg
        if self.recon is None:
            raise RuntimeError("encode_frames_staged needs a reference frame "
                               "(encode an IDR first)")
        n_frames = sum(ch[6] for ch in chunks)
        until_idr = cfg.gop_size - (self.frame_idx % cfg.gop_size)
        if self._force_idr or n_frames > until_idr:
            raise RuntimeError("IDR due inside a staged run; use encode_frames")
        enc = self._frame_encoder
        cbr_cabac = cfg.cabac and cfg.rc_mode == "cbr"
        if not (len(self.slice_rows) == 1
                and ((not cfg.cabac and cfg.rc_mode == "cq") or cbr_cabac)):
            raise RuntimeError(
                "staged path requires single-slice CAVLC-CQ or CABAC-CBR")
        out: list[bytes] = []
        pending: list = []

        def drain(n: int) -> None:
            while len(pending) > n:
                out.extend(pending.pop(0)())

        if cbr_cabac:
            for ys_d, us_d, vs_d, _ys, _us, _vs, k in chunks:
                pending.append(self._dispatch_cbr_cabac_chunk(
                    ys_d, us_d, vs_d, k))
                drain(1)
            drain(0)
            return out

        for ys_d, us_d, vs_d, ys, us, vs, k in chunks:
            prev_recon = self.recon
            cap = self._device_cap()
            streams_d, bits_d, recon = enc.encode_pframes_packed_dev(
                ys_d, us_d, vs_d, prev_recon, cfg.qp, deblock=cfg.deblock,
                cap=cap,
            )
            self.recon = tuple(recon)
            frame_base = self.frame_idx
            self.frame_idx += k

            def finish(streams_d=streams_d, bits_d=bits_d, k=k, cap=cap,
                       prev_recon=prev_recon, ys=ys, us=us, vs=vs,
                       frame_base=frame_base) -> list[bytes]:
                bits = np.asarray(bits_d)
                if int(bits.max()) > cap * 32 and cap < enc.cap_words:
                    # Adaptive cap overflowed: retry on device at full budget
                    # (bitstream is identical; only the buffer size differs).
                    streams, bits, _recon = enc.encode_pframes_packed(
                        ys, us, vs, *prev_recon, cfg.qp, deblock=cfg.deblock,
                        cap=enc.cap_words)
                    streams_np, cap_eff = streams, enc.cap_words
                else:
                    streams_np, cap_eff = None, cap
                self._note_bits(int(bits.max()))
                if int(bits.max()) <= cap_eff * 32:
                    if streams_np is None:
                        nw = self._prefix_words(int(bits.max()), cap_eff)
                        streams_np = np.asarray(streams_d[:, :nw])
                    streams = streams_np
                    return [
                        self._pslice_au_packed(
                            streams[j], int(bits[j]), frame_idx=frame_base + j)
                        for j in range(k)
                    ]
                symbols, _recon = enc.encode_pframes_batch(
                    ys, us, vs, *prev_recon, cfg.qp, deblock=cfg.deblock
                )
                from .pframe_core import unpack_symbols

                return [
                    self._pslice_au(unpack_symbols(symbols[j]),
                                    frame_idx=frame_base + j)
                    for j in range(k)
                ]

            pending.append(finish)
            drain(1)
        drain(0)
        return out

    def encode_frames(self, i420_frames) -> list[bytes]:
        """Encode a sequence of frames, batching runs of P frames into
        chunked device dispatches arranged as a software pipeline: while
        chunk i computes on device, chunk i+1's planes upload and chunk i-1's
        packed bitstreams download (host<->device DMA overlaps device
        compute). Same bitstream as repeated encode_frame calls. Returns one
        Annex-B AU per input frame."""
        cfg = self.cfg
        if cfg.lossless:
            return [self.encode_frame(b) for b in i420_frames]
        if cfg.b_frames:
            bplanes = []
            for buf in i420_frames:
                y, u, v = yuv.split_i420(buf, cfg.width, cfg.height)
                bplanes.append((
                    yuv.pad_to_mb_grid(y, 16),
                    yuv.pad_to_mb_grid(u, 8),
                    yuv.pad_to_mb_grid(v, 8),
                ))
            return self._encode_frames_bgop(bplanes)
        planes = []
        for buf in i420_frames:
            y, u, v = yuv.split_i420(buf, cfg.width, cfg.height)
            planes.append((
                yuv.pad_to_mb_grid(y, 16),
                yuv.pad_to_mb_grid(u, 8),
                yuv.pad_to_mb_grid(v, 8),
            ))
        out: list[bytes] = []
        pending: list = []  # deferred AU builders, in output order

        def drain(n: int) -> None:
            while len(pending) > n:
                out.extend(pending.pop(0)())

        i = 0
        while i < len(planes):
            idr_due = (
                self.frame_idx % cfg.gop_size == 0
                or self._force_idr
                or self.recon is None
            )
            if idr_due:
                drain(0)  # preserve AU order around the IDR
                self._force_idr = False
                out.append(self._encode_idr(*planes[i]))
                self.frame_idx += 1
                i += 1
                continue
            until_idr = cfg.gop_size - (self.frame_idx % cfg.gop_size)
            k = min(len(planes) - i, until_idr)
            enc = self._frame_encoder
            if cfg.rc_mode == "cbr" and cfg.cabac:
                if len(self.slice_rows) != 1:
                    # Multi-slice CABAC CBR: per-frame exact host loop.
                    drain(0)
                    for j in range(k):
                        out.append(self._encode_p_cbr_cabac(*planes[i + j]))
                        self.frame_idx += 1
                    i += k
                    continue
                # CABAC CBR, pipelined: the device scan runs rate control on
                # its own CAVLC pack's bit counts x the running CABAC/CAVLC
                # ratio (no host round trip per frame) and only the packed
                # CAVLC streams (~the real bitrate) are downloaded; the C++
                # CAVLC->CABAC transcoder re-emits each slice as CABAC on
                # the host, overlapped with the next chunk's device compute.
                # Exact AU sizes correct the virtual buffer one chunk later.
                k = min(k, self.PIPELINE_CHUNK)
                ys = np.stack([p[0] for p in planes[i : i + k]])
                us = np.stack([p[1] for p in planes[i : i + k]])
                vs = np.stack([p[2] for p in planes[i : i + k]])
                ys_d, us_d, vs_d = map(jax.device_put, (ys, us, vs))
                pending.append(self._dispatch_cbr_cabac_chunk(
                    ys_d, us_d, vs_d, k))
                drain(1)
                i += k
                continue
            if cfg.rc_mode == "cbr":
                drain(0)
                ys = np.stack([p[0] for p in planes[i : i + k]])
                us = np.stack([p[1] for p in planes[i : i + k]])
                vs = np.stack([p[2] for p in planes[i : i + k]])
                out.extend(self._encode_p_run_cbr(ys, us, vs, k))
                i += k
                continue
            use_device = (
                cfg.entropy_mode == "device"
                or (cfg.entropy_mode == "auto" and jax.default_backend() != "cpu")
            ) and len(self.slice_rows) == 1 and not cfg.cabac
            # (device packer is per-frame CAVLC today)
            if not use_device:
                drain(0)
                ys = np.stack([p[0] for p in planes[i : i + k]])
                us = np.stack([p[1] for p in planes[i : i + k]])
                vs = np.stack([p[2] for p in planes[i : i + k]])
                symbols, recon = enc.encode_pframes_batch(
                    ys, us, vs, *self.recon, cfg.qp, deblock=cfg.deblock
                )
                self.recon = recon
                from .pframe_core import unpack_symbols

                for j in range(k):
                    fields = unpack_symbols(symbols[j])
                    out.append(self._pslice_au(fields))
                    self.frame_idx += 1
                i += k
                continue

            k = min(k, self.PIPELINE_CHUNK)
            ys = np.stack([p[0] for p in planes[i : i + k]])
            us = np.stack([p[1] for p in planes[i : i + k]])
            vs = np.stack([p[2] for p in planes[i : i + k]])
            ys_d, us_d, vs_d = map(jax.device_put, (ys, us, vs))
            prev_recon = self.recon
            cap = self._device_cap()
            streams_d, bits_d, recon = enc.encode_pframes_packed_dev(
                ys_d, us_d, vs_d, prev_recon, cfg.qp, deblock=cfg.deblock,
                cap=cap,
            )
            self.recon = tuple(recon)
            frame_base = self.frame_idx
            self.frame_idx += k

            def finish(streams_d=streams_d, bits_d=bits_d, k=k, cap=cap,
                       prev_recon=prev_recon, ys=ys, us=us, vs=vs,
                       frame_base=frame_base) -> list[bytes]:
                bits = np.asarray(bits_d)
                if int(bits.max()) > cap * 32 and cap < enc.cap_words:
                    # Adaptive cap overflowed: retry on device at full budget.
                    streams, bits, _recon = enc.encode_pframes_packed(
                        ys, us, vs, *prev_recon, cfg.qp, deblock=cfg.deblock,
                        cap=enc.cap_words)
                    streams_np, cap_eff = streams, enc.cap_words
                else:
                    streams_np, cap_eff = None, cap
                self._note_bits(int(bits.max()))
                if int(bits.max()) <= cap_eff * 32:
                    if streams_np is None:
                        nw = self._prefix_words(int(bits.max()), cap_eff)
                        streams_np = np.asarray(streams_d[:, :nw])
                    streams = streams_np
                    return [
                        self._pslice_au_packed(
                            streams[j], int(bits[j]), frame_idx=frame_base + j)
                        for j in range(k)
                    ]
                # Rare overflow (bits above the device stream budget): re-run
                # for symbols and pack on the host. Recon is unaffected — the
                # compute path is identical, only the entropy stage differs.
                symbols, _recon = enc.encode_pframes_batch(
                    ys, us, vs, *prev_recon, cfg.qp, deblock=cfg.deblock
                )
                from .pframe_core import unpack_symbols

                return [
                    self._pslice_au(unpack_symbols(symbols[j]),
                                    frame_idx=frame_base + j)
                    for j in range(k)
                ]

            pending.append(finish)
            drain(1)  # depth-2 pipeline: keep one chunk in flight
            i += k
        drain(0)
        return out

    def _dispatch_cbr_cabac_chunk(self, ys_d, us_d, vs_d, k: int):
        """Dispatch one CBR+CABAC P chunk; returns the deferred finisher.

        Device: CBR scan + CAVLC pack (rate feedback = CAVLC bits x the
        running CABAC/CAVLC ratio). Host (in the finisher, overlapped with
        the next chunk): download packed streams, C++ CAVLC->CABAC
        transcode per slice, exact-bits virtual-buffer correction."""
        cfg = self.cfg
        enc = self._frame_encoder
        prev_recon = self.recon
        if self._rc_dev is not None:
            rc_in = {"qp": self._rc_dev[0],
                     "buf": self._rc_dev[1] + self._rc_corr,
                     "cplx": self._rc_dev[2]}
            self._rc_corr = 0.0
        else:
            rc_in = self.rc_state
        scale_used = self._cabac_scale
        cap = self._device_cap()
        streams_d, bits_d, qps_d, recon, new_rc = enc.encode_pframes_cbr_dev(
            ys_d, us_d, vs_d, prev_recon, rc_in, int(self._rc_target),
            bits_scale=scale_used, deblock=cfg.deblock,
            adaptive_qp=cfg.adaptive_qp, cap=cap)
        self.recon = tuple(recon)
        self._rc_dev = new_rc
        frame_base = self.frame_idx
        self.frame_idx += k

        def finish(streams_d=streams_d, bits_d=bits_d, qps_d=qps_d,
                   new_rc=new_rc, k=k, cap=cap, prev_recon=prev_recon,
                   ys_d=ys_d, us_d=us_d, vs_d=vs_d,
                   frame_base=frame_base, scale_used=scale_used,
                   rc_in=rc_in) -> list[bytes]:
            bits = np.asarray(bits_d)
            qps = np.asarray(qps_d)
            if int(bits.max()) > cap * 32 and cap < enc.cap_words:
                # Adaptive stream cap overflowed: retry at the full budget
                # (same rc inputs => identical QPs and streams).
                streams_d2, bits_d2, qps_d2, recon2, new_rc2 = (
                    enc.encode_pframes_cbr_dev(
                        ys_d, us_d, vs_d, prev_recon, rc_in,
                        int(self._rc_target), bits_scale=scale_used,
                        deblock=cfg.deblock, adaptive_qp=cfg.adaptive_qp,
                        cap=enc.cap_words))
                self.recon = tuple(recon2)
                self._rc_dev = new_rc2
                streams_d, bits_d, qps_d, new_rc = (
                    streams_d2, bits_d2, qps_d2, new_rc2)
                bits = np.asarray(bits_d)
                qps = np.asarray(qps_d)
                cap_eff = enc.cap_words
            else:
                cap_eff = cap
            self._note_bits(int(bits.max()))
            nw = self._prefix_words(int(bits.max()), cap_eff)
            streams = np.asarray(streams_d[:, :nw])
            from .. import native

            aus = []
            ratios = []
            for j in range(k):
                au = self._cabac_au_from_cavlc_stream(
                    streams[j], int(bits[j]), int(qps[j]), frame_base + j)
                actual = len(au) * 8
                est = float(bits[j]) * scale_used
                self._rc_corr += actual - est
                if bits[j] > 0:
                    ratios.append(actual / float(bits[j]))
                aus.append(au)
            if ratios:
                r = float(np.mean(ratios))
                self._cabac_scale = min(max(
                    0.7 * self._cabac_scale + 0.3 * r, 0.6), 1.3)
            # Refresh the host-visible rc mirror (IDR budgeting and the
            # single-frame path read it).
            self.rc_state = {
                "qp": float(new_rc[0]),
                "buf": float(new_rc[1]) + self._rc_corr,
                "cplx": float(new_rc[2]),
            }
            return aus

        return finish

    def _cabac_au_from_cavlc_stream(self, stream_words, total_bits: int,
                                    qp: int, frame_idx: int) -> bytes:
        """One CABAC P-slice AU from a device CAVLC pack: C++ transcode with
        a Python parse+recode fallback."""
        from .. import native

        data = np.asarray(stream_words, dtype=np.uint32).byteswap().tobytes()
        R = self.slice_rows[0][1] - self.slice_rows[0][0]
        C = self.sps.pic_width_in_mbs
        payload = native.transcode_pslice_native(
            data, total_bits, 0, R, C, qp,
            cabac_init_idc=self.cfg.cabac_init_idc)
        if payload is None:
            from ..core.bitstream import BitReader
            from ..entropy.cabac_slice import write_pslice_cabac
            from .decoder_tpu import parse_pslice_symbols

            sym = parse_pslice_symbols(BitReader(data), R, C, slice_qp=qp)
            payload = write_pslice_cabac(
                sym["mv"], sym["luma_levels"], sym["cdc_levels"],
                sym["cac_levels"], qp,
                cabac_init_idc=self.cfg.cabac_init_idc,
                qp_map=sym["qp_map"])
        bw = self._pslice_header_writer(qp, frame_idx=frame_idx)
        while not bw.byte_aligned():
            bw.u(1, 1)  # cabac_alignment_one_bit (7.3.4)
        return self._aud(primary_pic_type=1) + wrap_nal(
            H264NalType.SLICE, bw.get_bytes() + payload, nal_ref_idc=2)

    def _encode_p_run_cbr(self, ys, us, vs, k: int) -> list[bytes]:
        """CBR path: on-device rate-controlled batch; per-frame QP in headers."""
        cfg = self.cfg
        self._rc_dev = None
        self._rc_corr = 0.0
        enc = self._frame_encoder
        cap = self._device_cap()
        streams, bits, qps, recon, new_state = enc.encode_pframes_cbr(
            ys, us, vs, *self.recon, self.rc_state, int(self._rc_target),
            deblock=cfg.deblock, adaptive_qp=cfg.adaptive_qp, cap=cap,
        )
        if int(bits.max()) > cap * 32 and cap < enc.cap_words:
            # Adaptive stream cap overflowed: retry at the full budget
            # (identical result; only the buffer size differs).
            streams, bits, qps, recon, new_state = enc.encode_pframes_cbr(
                ys, us, vs, *self.recon, self.rc_state, int(self._rc_target),
                deblock=cfg.deblock, adaptive_qp=cfg.adaptive_qp,
                cap=enc.cap_words,
            )
        self._note_bits(int(bits.max()))
        out = []
        if len(self.slice_rows) == 1 and int(bits.max()) <= enc.cap_words * 32:
            self.recon = recon
            self.rc_state = new_state
            for j in range(k):
                out.append(
                    self._pslice_au_packed(streams[j], int(bits[j]), qp=int(qps[j]))
                )
                self.frame_idx += 1
        else:
            # Device bit budget exceeded: host entropy at the mean chosen QP.
            qp = int(np.round(qps.mean()))
            symbols, recon = enc.encode_pframes_batch(
                ys, us, vs, *self.recon, qp, deblock=cfg.deblock)
            self.recon = recon
            self.rc_state["qp"] = float(qp)
            from .pframe_core import unpack_symbols

            for j in range(k):
                fields = unpack_symbols(symbols[j])
                au = self._pslice_au(fields, qp=qp)
                self.rc_state["buf"] += len(au) * 8 - self._rc_target
                out.append(au)
                self.frame_idx += 1
        return out

    def _pslice_au_packed(self, stream_words, total_bits: int,
                          qp: int | None = None,
                          frame_idx: int | None = None) -> bytes:
        from ..entropy.device_cavlc import merge_slice_data

        bw = self._pslice_header_writer(qp, frame_idx=frame_idx)
        merge_slice_data(bw, stream_words, total_bits)
        return self._aud(primary_pic_type=1) + wrap_nal(
            H264NalType.SLICE, bw.get_bytes(), nal_ref_idc=2
        )

    def _aud(self, primary_pic_type: int) -> bytes:
        if not self.cfg.insert_aud:
            return b""
        from ..core.syntax import write_aud_rbsp

        return wrap_nal(H264NalType.AUD, write_aud_rbsp(primary_pic_type),
                        nal_ref_idc=0)

    def _idr_sei(self) -> bytes:
        if not self.cfg.insert_sei:
            return b""
        from ..core.syntax import (
            sei_recovery_point, sei_user_data, write_sei_rbsp,
        )

        rbsp = write_sei_rbsp([
            sei_recovery_point(0),
            sei_user_data(b"media_tpu H.264 TPU-native encoder"),
        ])
        return wrap_nal(H264NalType.SEI, rbsp, nal_ref_idc=0)

    def _pslice_header_writer(self, qp: int | None = None,
                              first_mb: int = 0,
                              frame_idx: int | None = None,
                              frame_num: int | None = None,
                              poc: int | None = None) -> BitWriter:
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        if frame_idx is None:
            frame_idx = self.frame_idx
        bw = BitWriter()
        if frame_num is None:
            frame_num = (frame_idx - self.frame_idx_of_idr) % (
                1 << self.sps.log2_max_frame_num
            )
        hdr = SliceHeader(
            slice_type=5,
            idr=False,
            frame_num=frame_num,
            pic_order_cnt_lsb=(poc or 0) % (
                1 << self.sps.log2_max_pic_order_cnt_lsb),
            first_mb_in_slice=first_mb,
            slice_qp_delta=qp - self.pps.pic_init_qp,
            disable_deblocking_filter_idc=self._deblock_idc,
            cabac_init_idc=self.cfg.cabac_init_idc,
        )
        hdr.write(bw, self.sps, self.pps)
        return bw

    # ------------------------------------------------------------- B frames

    def _encode_frames_bgop(self, planes: list) -> list[bytes]:
        """IBPBP GOP driver: every pair (f[i], f[i+1]) encodes as the anchor
        P (display i+1) followed by the non-reference B (display i) —
        coding order, which is also the returned AU order. One AU per
        input frame."""
        cfg = self.cfg
        fnmask = (1 << self.sps.log2_max_frame_num) - 1
        out: list[bytes] = []
        i = 0
        n = len(planes)
        while i < n:
            idr_due = (self._display_since_idr is None
                       or self._display_since_idr >= cfg.gop_size
                       or self._force_idr or self.recon is None)
            if idr_due:
                self._force_idr = False
                out.append(self._encode_idr(*planes[i]))
                self._display_since_idr = 1
                self._ref_frame_num = 1
                self.frame_idx += 1
                i += 1
                continue
            d = self._display_since_idr
            until_idr = cfg.gop_size - d
            if i + 1 < n and until_idr >= 2:
                prev_recon = self.recon
                p_fn = self._ref_frame_num & fnmask
                p_au = self._encode_p_anchor(planes[i + 1], frame_num=p_fn,
                                             poc=2 * (d + 1))
                b_au = self._encode_b(planes[i], prev_recon, self.recon,
                                      frame_num=(p_fn + 1) & fnmask,
                                      poc=2 * d)
                self._ref_frame_num += 1
                out.extend([p_au, b_au])
                self._display_since_idr += 2
                self.frame_idx += 2
                i += 2
            else:
                out.append(self._encode_p_anchor(
                    planes[i], frame_num=self._ref_frame_num & fnmask,
                    poc=2 * d))
                self._ref_frame_num += 1
                self._display_since_idr += 1
                self.frame_idx += 1
                i += 1
        return out

    def _encode_p_anchor(self, plane, frame_num: int, poc: int) -> bytes:
        """One P anchor with explicit frame_num/POC (B-GOP coding order)."""
        cfg = self.cfg
        y, u, v = plane
        result = self._frame_encoder.encode_pframe(
            y, u, v, *self.recon, cfg.qp, deblock=cfg.deblock)
        self.recon = (result.recon_y, result.recon_u, result.recon_v)
        fields = {
            "mv": result.mv, "luma_levels": result.luma_levels,
            "cdc_levels": result.cdc_levels, "cac_levels": result.cac_levels,
        }
        bw = self._pslice_header_writer(frame_num=frame_num, poc=poc)
        slice_coder.write_pslice_mbs(
            bw, mv=fields["mv"], luma_levels=fields["luma_levels"],
            cdc_levels=fields["cdc_levels"], cac_levels=fields["cac_levels"])
        bw.rbsp_trailing_bits()
        return self._aud(primary_pic_type=1) + wrap_nal(
            H264NalType.SLICE, bw.get_bytes(), nal_ref_idc=2)

    def _encode_b(self, plane, ref0, ref1, frame_num: int, poc: int) -> bytes:
        """One non-reference B picture (B_Bi_16x16): ME against both
        anchors on device, host CAVLC B-slice entropy. Deblocking is
        disabled per-slice (idc 1) — a per-slice choice the spec allows,
        and B recon never feeds prediction."""
        cfg = self.cfg
        y, u, v = plane
        qp_b = min(cfg.qp + 2, 51)  # standard B-picture QP offset
        fields = self._frame_encoder.encode_bframe(y, u, v, ref0, ref1, qp_b)
        bw = BitWriter()
        hdr = SliceHeader(
            slice_type=6,  # B (all slices in picture are B)
            idr=False,
            frame_num=frame_num,
            pic_order_cnt_lsb=poc % (
                1 << self.sps.log2_max_pic_order_cnt_lsb),
            slice_qp_delta=qp_b - self.pps.pic_init_qp,
            disable_deblocking_filter_idc=1,
            nal_ref_idc=0,
        )
        hdr.write(bw, self.sps, self.pps)
        slice_coder.write_bslice_mbs(
            bw, mv0=fields["mv0"], mv1=fields["mv1"],
            luma_levels=fields["luma_levels"],
            cdc_levels=fields["cdc_levels"],
            cac_levels=fields["cac_levels"])
        bw.rbsp_trailing_bits()
        return self._aud(primary_pic_type=2) + wrap_nal(
            H264NalType.SLICE, bw.get_bytes(), nal_ref_idc=0)

    def _pslice_au(self, fields: dict, qp: int | None = None,
                   frame_idx: int | None = None) -> bytes:
        from .. import native

        n_cols = self.sps.pic_width_in_mbs
        au = b""
        for r0, r1 in self.slice_rows:
            bw = self._pslice_header_writer(qp, first_mb=r0 * n_cols,
                                            frame_idx=frame_idx)
            if self.cfg.cabac:
                from .. import native

                while not bw.byte_aligned():
                    bw.u(1, 1)  # cabac_alignment_one_bit (7.3.4)
                qp_eff = self.cfg.qp if qp is None else qp
                payload = native.cabac_write_pslice_native(
                    fields["mv"][r0:r1], fields["luma_levels"][r0:r1],
                    fields["cdc_levels"][r0:r1], fields["cac_levels"][r0:r1],
                    qp_eff, cabac_init_idc=self.cfg.cabac_init_idc)
                if payload is None:
                    from ..entropy.cabac_slice import write_pslice_cabac

                    payload = write_pslice_cabac(
                        fields["mv"][r0:r1], fields["luma_levels"][r0:r1],
                        fields["cdc_levels"][r0:r1],
                        fields["cac_levels"][r0:r1], qp_eff,
                        cabac_init_idc=self.cfg.cabac_init_idc)
                au += wrap_nal(H264NalType.SLICE, bw.get_bytes() + payload,
                               nal_ref_idc=2)
                continue
            if not native.write_pslice_native(
                bw, fields["mv"][r0:r1], fields["luma_levels"][r0:r1],
                fields["cdc_levels"][r0:r1], fields["cac_levels"][r0:r1],
            ):
                slice_coder.write_pslice_mbs(
                    bw,
                    mv=fields["mv"][r0:r1],
                    luma_levels=fields["luma_levels"][r0:r1],
                    cdc_levels=fields["cdc_levels"][r0:r1],
                    cac_levels=fields["cac_levels"][r0:r1],
                )
                bw.rbsp_trailing_bits()
            au += wrap_nal(H264NalType.SLICE, bw.get_bytes(), nal_ref_idc=2)
        return self._aud(primary_pic_type=1) + au

    # ------------------------------------------------------------------- IDR

    def _idr_qp(self) -> int:
        if self.cfg.rc_mode == "cbr":
            # I frames: slightly below the running P QP, budgeted separately.
            return int(np.clip(round(self.rc_state["qp"]) - 2, 10, 46))
        return self.cfg.qp

    def _encode_idr(self, y, u, v) -> bytes:
        cfg = self.cfg
        # Callers drain pending P chunks before an IDR, so the float rc
        # mirror is current; the device-side carry is superseded.
        self._rc_dev = None
        self._rc_corr = 0.0
        qp_i = self._idr_qp()
        result = self._frame_encoder.encode_iframe(y, u, v, qp_i,
                                                   deblock=cfg.deblock,
                                                   i4x4=cfg.i4x4)
        return self._idr_au_from_result(result, qp_i)

    def _idr_au_from_result(self, result, qp_i: int) -> bytes:
        """Assemble the IDR AU (SPS+PPS+slice NALs) from an IFrameResult —
        shared by the single-chip path and the sharded session (which
        computes the same result tile-parallel)."""
        cfg = self.cfg
        self.recon = (result.recon_y, result.recon_u, result.recon_v)
        self.frame_idx_of_idr = self.frame_idx

        from .. import native

        n_cols = self.sps.pic_width_in_mbs
        slice_nals = b""
        for r0, r1 in self.slice_rows:
            bw = BitWriter()
            hdr = SliceHeader(
                slice_type=7,  # I (all slices in picture are I)
                idr=True,
                idr_pic_id=self.idr_pic_id,
                frame_num=0,
                first_mb_in_slice=r0 * n_cols,
                slice_qp_delta=qp_i - self.pps.pic_init_qp,
                disable_deblocking_filter_idc=self._deblock_idc,
            )
            hdr.write(bw, self.sps, self.pps)
            if cfg.cabac:
                while not bw.byte_aligned():
                    bw.u(1, 1)  # cabac_alignment_one_bit
                i4_kw = {}
                if result.is_i4 is not None:
                    i4_kw = dict(is_i4=result.is_i4[r0:r1],
                                 modes4=result.modes4[r0:r1],
                                 luma4_levels=result.luma4_levels[r0:r1])
                payload = native.cabac_write_islice_native(
                    result.mode16[r0:r1], result.chroma_mode[r0:r1],
                    result.dc_levels[r0:r1], result.ac_levels[r0:r1],
                    result.cdc_levels[r0:r1], result.cac_levels[r0:r1], qp_i,
                    **i4_kw)
                if payload is None:
                    from ..entropy.cabac_slice import write_islice_cabac

                    payload = write_islice_cabac(
                        result.mode16[r0:r1], result.chroma_mode[r0:r1],
                        result.dc_levels[r0:r1], result.ac_levels[r0:r1],
                        result.cdc_levels[r0:r1], result.cac_levels[r0:r1],
                        qp_i, **i4_kw)
                slice_nals += wrap_nal(H264NalType.IDR_SLICE,
                                       bw.get_bytes() + payload,
                                       nal_ref_idc=3)
                continue
            use_native = result.is_i4 is None and native.write_islice_native(
                bw, result.mode16[r0:r1], result.chroma_mode[r0:r1],
                result.dc_levels[r0:r1], result.ac_levels[r0:r1],
                result.cdc_levels[r0:r1], result.cac_levels[r0:r1],
            )
            if not use_native:
                slice_coder.write_islice_mbs(
                    bw,
                    mode16=result.mode16[r0:r1],
                    chroma_mode=result.chroma_mode[r0:r1],
                    dc_levels=result.dc_levels[r0:r1],
                    ac_levels=result.ac_levels[r0:r1],
                    cdc_levels=result.cdc_levels[r0:r1],
                    cac_levels=result.cac_levels[r0:r1],
                    is_i4=None if result.is_i4 is None else result.is_i4[r0:r1],
                    modes4=None if result.modes4 is None else result.modes4[r0:r1],
                    luma4_levels=(None if result.luma4_levels is None
                                  else result.luma4_levels[r0:r1]),
                )
                bw.rbsp_trailing_bits()
            slice_nals += wrap_nal(H264NalType.IDR_SLICE, bw.get_bytes(), nal_ref_idc=3)
        self.idr_pic_id = (self.idr_pic_id + 1) & 0xFFFF
        self._frame_num = 1  # next frame

        sps_w = BitWriter()
        self.sps.write(sps_w)
        sps_w.rbsp_trailing_bits()
        pps_w = BitWriter()
        self.pps.write(pps_w)
        pps_w.rbsp_trailing_bits()
        au = (
            self._aud(primary_pic_type=0)
            + wrap_nal(H264NalType.SPS, sps_w.get_bytes())
            + wrap_nal(H264NalType.PPS, pps_w.get_bytes())
            + self._idr_sei()
            + slice_nals
        )
        if cfg.rc_mode == "cbr":
            # Charge the I frame against the buffer at an allowance of 4x the
            # per-frame target (typical I/P size ratio at equal quality).
            self.rc_state["buf"] += len(au) * 8 - 4 * self._rc_target
        # Seed the stream-buffer high-water-mark (conservative: I frames are
        # typically ~4x the following P frames).
        self._note_bits(len(au) * 8)
        return au

    # -------------------------------------------------------------- lossless

    def _encode_ipcm(self, y, u, v) -> bytes:
        """One all-I_PCM IDR AU: raw 8-bit samples, mathematically lossless
        (spec 7.3.5 pcm_sample_luma/chroma; mb_type 25 in I slices).

        Every MB is byte-aligned after its type code, so the whole slice
        body is assembled as one numpy byte layout: a 2-byte prefix per MB
        (ue(25) = 9 bits '000011010' + 7 pcm_alignment_zero_bits) followed
        by 256 luma + 64 Cb + 64 Cr samples."""
        n_cols = self.sps.pic_width_in_mbs
        R = self.sps.pic_height_in_mbs
        self.recon = (y, u, v)  # recon == source by construction
        self.frame_idx_of_idr = self.frame_idx
        yb = (y.reshape(R, 16, n_cols, 16).transpose(0, 2, 1, 3)
              .reshape(R, n_cols, 256))
        ub = (u.reshape(R, 8, n_cols, 8).transpose(0, 2, 1, 3)
              .reshape(R, n_cols, 64))
        vb = (v.reshape(R, 8, n_cols, 8).transpose(0, 2, 1, 3)
              .reshape(R, n_cols, 64))
        pre = np.zeros((R, n_cols, 2), np.uint8)
        pre[..., 0] = 0x0D
        mbs = np.concatenate(
            [pre, yb.astype(np.uint8), ub.astype(np.uint8),
             vb.astype(np.uint8)], axis=2)
        slice_nals = b""
        for r0, r1 in self.slice_rows:
            bw = BitWriter()
            hdr = SliceHeader(
                slice_type=7,
                idr=True,
                idr_pic_id=self.idr_pic_id,
                frame_num=0,
                first_mb_in_slice=r0 * n_cols,
                slice_qp_delta=0,
                disable_deblocking_filter_idc=self._deblock_idc,
            )
            hdr.write(bw, self.sps, self.pps)
            bw.ue(25)  # mb_type I_PCM (first MB; header end is unaligned)
            while not bw.byte_aligned():
                bw.u(1, 0)  # pcm_alignment_zero_bit
            band = mbs[r0:r1].tobytes()
            bw.put_bytes(band[2:])  # first MB's 2-byte prefix written above
            bw.rbsp_trailing_bits()
            slice_nals += wrap_nal(H264NalType.IDR_SLICE, bw.get_bytes(),
                                   nal_ref_idc=3)
        self.idr_pic_id = (self.idr_pic_id + 1) & 0xFFFF
        sps_w = BitWriter()
        self.sps.write(sps_w)
        sps_w.rbsp_trailing_bits()
        pps_w = BitWriter()
        self.pps.write(pps_w)
        pps_w.rbsp_trailing_bits()
        return (
            self._aud(primary_pic_type=0)
            + wrap_nal(H264NalType.SPS, sps_w.get_bytes())
            + wrap_nal(H264NalType.PPS, pps_w.get_bytes())
            + self._idr_sei()
            + slice_nals
        )

    # --------------------------------------------------------------------- P

    def _encode_p_cbr_cabac(self, y, u, v, qp_min: int = 12,
                            qp_max: int = 44) -> bytes:
        """One CBR P frame with CABAC entropy: the same virtual-buffer /
        complexity model as the device loop (encoder.py
        _encode_pbatch_cbr_device), but integrating the EXACT CABAC AU size
        on the host. Per-frame QP rides in the slice header."""
        import math

        cfg = self.cfg
        # Host-exact path: the float mirror is current (callers drain the
        # batch pipeline first); drop any device-side rc carry.
        self._rc_dev = None
        self._rc_corr = 0.0
        st = self.rc_state
        target = self._rc_target
        adj_target = max(target - 0.35 * st["buf"], 0.25 * target)
        want_qstep = min(max(st["cplx"] / adj_target, 0.625), 1024.0)
        qp_f = min(max(6.0 * math.log2(want_qstep / 0.625), qp_min), qp_max)
        qp = int(round(qp_f))
        ref_y, ref_u, ref_v = self.recon
        result = self._frame_encoder.encode_pframe(
            y, u, v, ref_y, ref_u, ref_v, qp, deblock=cfg.deblock)
        self.recon = (result.recon_y, result.recon_u, result.recon_v)
        fields = {
            "mv": result.mv,
            "luma_levels": result.luma_levels,
            "cdc_levels": result.cdc_levels,
            "cac_levels": result.cac_levels,
        }
        au = self._pslice_au(fields, qp=qp)
        bits = len(au) * 8
        st["cplx"] = 0.75 * st["cplx"] + 0.25 * bits * (
            0.625 * 2.0 ** (qp_f / 6.0))
        st["buf"] += bits - target
        st["qp"] = qp_f
        return au

    def _encode_p(self, y, u, v) -> bytes:
        cfg = self.cfg
        if cfg.rc_mode == "cbr" and cfg.cabac:
            return self._encode_p_cbr_cabac(y, u, v)
        if cfg.rc_mode == "cbr":
            aus = self._encode_p_run_cbr(y[None], u[None], v[None], 1)
            self.frame_idx -= 1  # the run helper incremented; encode_frame will too
            return aus[0]
        ref_y, ref_u, ref_v = self.recon
        result = self._frame_encoder.encode_pframe(
            y, u, v, ref_y, ref_u, ref_v, cfg.qp, deblock=cfg.deblock
        )
        self.recon = (result.recon_y, result.recon_u, result.recon_v)
        fields = {
            "mv": result.mv,
            "luma_levels": result.luma_levels,
            "cdc_levels": result.cdc_levels,
            "cac_levels": result.cac_levels,
        }
        return self._pslice_au(fields)
