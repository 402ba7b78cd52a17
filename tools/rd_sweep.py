#!/usr/bin/env python
"""Rate/distortion sweep: multi-clip, multi-QP, CAVLC vs CABAC, and the
fitted-vs-uniform CABAC init-table delta.

Writes RD.json with one curve per (clip, entropy) pair — all-frame average
PSNR at each QP — plus the measured CABAC saving over CAVLC and the
first-slice bit cost of uniform context init relative to the fitted tables
(the quantified deviation cost VERDICT round-2 item 3 asked for).

Runs on CPU (the math is platform-identical); sizes are kept small enough
for a CI-grade runtime. Usage: python tools/rd_sweep.py [W H N]
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/media_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

QPS = [26, 32, 38]


def clips(w, h, n):
    """Three content classes (the init-fit classes; distinct statistics)."""
    out = {}
    for name, passes, step in (("static", 4, 1), ("pan", 3, 7),
                               ("texture", 1, 3)):
        rng = np.random.default_rng(hash(name) % 2**31)
        big = rng.integers(0, 256, (h + 96, w + 96)).astype(np.float64)
        for _ in range(passes):
            big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
                   + np.roll(big, 2, 0) + np.roll(big, 2, 1)) / 5
        big = (big - big.min()) / (big.max() - big.min() + 1e-9) * 220 + 16
        frames = []
        for t in range(n):
            dx, dy = (step * t) % 80, (step * t // 2) % 80
            y = big[dy : dy + h, dx : dx + w].round().clip(0, 255).astype(np.uint8)
            u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
            v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
            frames.append((y, u, v))
        out[name] = frames
    return out


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main():
    from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
    from media_tpu.utils import yuv

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    data = clips(w, h, n)
    curves = {}
    for clip, frames in data.items():
        bufs = [yuv.pack_i420(*f) for f in frames]
        for entropy in ("cavlc", "cabac"):
            pts = []
            for qp in QPS:
                cfg = EncoderConfig(width=w, height=h, qp=qp, gop_size=1000,
                                    deblock=True, i4x4=True,
                                    cabac=(entropy == "cabac"))
                s = EncoderSession(cfg)
                aus = s.encode_frames(bufs)
                bits = sum(len(a) * 8 for a in aus)
                ps = psnr(np.asarray(s.recon[0])[:h, :w], frames[-1][0])
                pts.append({"qp": qp, "kbit_per_frame": bits / n / 1000,
                            "y_psnr_last": round(float(ps), 3)})
            curves[f"{clip}_{entropy}"] = pts
            print(clip, entropy, [p["kbit_per_frame"] for p in pts],
                  flush=True)
            # Hundreds of in-process XLA compiles exhaust LLVM's JIT section
            # memory; drop executables between curves (the persistent
            # compilation cache keeps recompiles cheap).
            jax.clear_caches()

    # CABAC saving at matched QP (same recon => same PSNR; pure rate delta).
    savings = []
    for clip in data:
        for i, qp in enumerate(QPS):
            r_cavlc = curves[f"{clip}_cavlc"][i]["kbit_per_frame"]
            r_cabac = curves[f"{clip}_cabac"][i]["kbit_per_frame"]
            savings.append(1 - r_cabac / r_cavlc)
    cabac_saving = float(np.mean(savings))

    # Init-table benefit: first P slice coded with fitted vs uniform tables
    # (adaptation amortizes the rest of the slice; the delta is the ramp).
    from media_tpu.entropy import cabac_init_tables as cit
    from media_tpu.entropy import cabac_slice
    from media_tpu.pipeline.encoder import FrameEncoder

    frames = data["pan"]
    enc = FrameEncoder(w, h)
    deltas = []
    uniform = np.zeros((cit.NUM_CTX, 2), np.int32)
    uniform[:, 1] = 64
    for qp in (26, 32):
        ir = enc.encode_iframe(*[f.astype(np.int32) for f in frames[0]], qp)
        recon = (ir.recon_y, ir.recon_u, ir.recon_v)
        pr = enc.encode_pframe(*[f.astype(np.int32) for f in frames[1]],
                               *recon, qp)
        fitted = len(cabac_slice.write_pslice_cabac(
            pr.mv, pr.luma_levels, pr.cdc_levels, pr.cac_levels, qp,
            cabac_init_idc=1))
        saved_i, saved_p = cit.INIT_MN_I.copy(), cit.INIT_MN_P.copy()
        try:
            cit.INIT_MN_I[:] = uniform
            cit.INIT_MN_P[:] = uniform[None]
            uni = len(cabac_slice.write_pslice_cabac(
                pr.mv, pr.luma_levels, pr.cdc_levels, pr.cac_levels, qp,
                cabac_init_idc=1))
        finally:
            cit.INIT_MN_I[:] = saved_i
            cit.INIT_MN_P[:] = saved_p
        deltas.append((uni - fitted) / max(uni, 1))
    init_benefit = float(np.mean(deltas))

    # ---- Third-party anchors (the BASELINE "PSNR >= OpenH264 at equal
    # bitrate" clause, measured against libx264 via the in-repo libavcodec
    # shim): encode each clip with x264 at the same QPs, decode BOTH
    # bitstreams with ffmpeg, and score all-frame-average Y PSNR against the
    # source — one decoder, one metric, both encoders. Two anchor presets:
    #   matched = x264 restricted to this encoder's current toolset
    #             (1 ref, no B, 16x16 partitions only, no 8x8 DCT)
    #   full    = x264 defaults minus B frames (its full P toolset)
    anchors = {}
    bd = {}
    try:
        from media_tpu.testing import avref

        if not avref.available():
            raise RuntimeError("libavcodec shim unavailable")

        def avg_psnr_curve(stream, frames):
            dec = avref.decode(stream)
            k = min(len(dec), len(frames))
            return float(np.mean([psnr(dec[i][0], frames[i][0])
                                  for i in range(k)]))

        X264_COMMON = ("bframes=0:keyint=1000:min-keyint=1000:"
                       "scenecut=0:rc-lookahead=0:threads=1")
        PRESETS = {
            "matched": X264_COMMON + ":ref=1:partitions=none:8x8dct=0:"
                       "me=dia:subme=2:trellis=0:weightp=0",
            "full": X264_COMMON,
        }
        for clip, frames in data.items():
            bufs = [yuv.pack_i420(*f) for f in frames]
            # Our CABAC curve, rescored by ffmpeg-decoded all-frame PSNR.
            ours = []
            for qp in QPS:
                s = EncoderSession(EncoderConfig(
                    width=w, height=h, qp=qp, gop_size=1000, deblock=True,
                    i4x4=True, cabac=True))
                aus = s.encode_frames(bufs)
                ours.append({
                    "qp": qp,
                    "kbit_per_frame": sum(len(a) * 8 for a in aus) / n / 1000,
                    "y_psnr_avg": round(avg_psnr_curve(b"".join(aus),
                                                       frames), 3),
                })
                jax.clear_caches()
            anchors[f"{clip}_ours_cabac"] = ours
            for preset, params in PRESETS.items():
                pts = []
                for qp in QPS:
                    stream = avref.encode_h264(frames, qp=qp, gop=1000,
                                               x264_params=params)
                    pts.append({
                        "qp": qp,
                        "kbit_per_frame": len(stream) * 8 / n / 1000,
                        "y_psnr_avg": round(avg_psnr_curve(stream, frames),
                                            3),
                    })
                anchors[f"{clip}_x264_{preset}"] = pts

            def bd_psnr(test, anchor):
                """Bjontegaard delta PSNR (positive = test better) over the
                overlapping rate range, cubic unless short curves."""
                lr_t = np.log10([p["kbit_per_frame"] for p in test])
                ps_t = [p["y_psnr_avg"] for p in test]
                lr_a = np.log10([p["kbit_per_frame"] for p in anchor])
                ps_a = [p["y_psnr_avg"] for p in anchor]
                deg = min(3, len(lr_t) - 1)
                pt = np.polyfit(lr_t, ps_t, deg)
                pa = np.polyfit(lr_a, ps_a, deg)
                lo = max(min(lr_t), min(lr_a))
                hi = min(max(lr_t), max(lr_a))
                if hi <= lo:
                    return None
                xs = np.linspace(lo, hi, 64)
                return float(np.mean(np.polyval(pt, xs)
                                     - np.polyval(pa, xs)))

            for preset in PRESETS:
                d = bd_psnr(ours, anchors[f"{clip}_x264_{preset}"])
                if d is not None:
                    bd[f"{clip}_vs_x264_{preset}_bd_psnr_db"] = round(d, 3)
    except Exception as e:
        anchors = {"error": str(e)}

    out = {
        "clips": f"3 synthetic classes {w}x{h}, {n} frames, IPPP gop",
        "config": "deblock=True i4x4=True (CAVLC/CABAC toggled)",
        "curves": curves,
        "cabac_saving_vs_cavlc": round(cabac_saving, 4),
        "init_table_saving_first_slice": round(init_benefit, 4),
        "anchor_x264": anchors,
        "bd_psnr_vs_anchors": bd,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RD.json")
    # Read-merge-write: bench.py owns other keys of the same artifact
    # (its bench_1080p curve) — don't drop them.
    doc = {}
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        pass
    doc.update(out)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"cabac saving {cabac_saving:.3%}, "
          f"init-table first-slice saving {init_benefit:.3%}")
    print("wrote", path)


if __name__ == "__main__":
    main()
