"""Whole-frame deblocking wavefront as ONE Pallas kernel (flag-gated).

The XLA wave-major scan (pipeline/deblock_apply.py) is latency-bound: 2R+C
(~255 at 1080p) dependent scan steps, each a bundle of small vector ops, cost
~43 us/wave in dispatch/serialization — ~11 ms/frame against ~1 ms of actual
filter math. This kernel runs the ENTIRE skewed wavefront inside a single
launch: planes stay in HBM (aliased in/out), each wave's lane band is DMA'd
into VMEM patches, the normative edge-filter sequence runs on the VPU, and
the modified own/left/top blocks are DMA'd back before the next wave reads
them. All control flow is a `lax.fori_loop` over waves — no per-wave XLA
dispatch at all.

MEASURED OUTCOME (v5e, 1080p): ~247 ms/frame vs the XLA scan's ~14 — the
19 small DMAs per wave target (maxw, 16, 16) VMEM staging whose padded
minor dim fragments each transfer into hundreds of 64-byte descriptors,
and the wavefront's ~70-lane width cannot amortize that. The honest
conclusion, recorded here so the next round doesn't re-learn it: this
wavefront is latency-inherent at every level (XLA dispatch, DMA issue,
loop overhead); beating ~11 ms/frame needs an ALGORITHMIC change (wider
waves across independent pictures — impossible in-loop for an IPPP chain)
rather than a lowering change. The kernel stays as a bit-exact,
flag-gated alternative (MEDIA_TPU_DEBLOCK_KERNEL=wavepallas) and as the
repo's reference for the manual-DMA Pallas pattern.

Data layout is the wave-major shear of deblock_apply._wave_layout: slot
(k + 2, 1 + lane) holds MB (r, c) with k = 2r + c; the left neighbor of every
lane in wave k sits at a lane offset s_left[k] in wave k-1, the top neighbor
at s_top[k] in wave k-2 — so every access is a contiguous lane band.

Meta layout per slot (int32, MW_PALLAS columns): the 96 bs/tc columns of the
XLA path, then 24 per-edge alpha/beta columns (uniform-QP frames broadcast
the scalars into them so the kernel has ONE shape), then a validity flag.
Invalid (padding) lanes write their loaded values back unchanged, mirroring
the XLA path's masked updates.

Bit-exact vs the XLA wave-major scan (tests/test_deblock.py); selected via
MEDIA_TPU_DEBLOCK_KERNEL=wavepallas (default on the TPU backend once
validated — see deblock_apply.deblock_frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deblock import filter_chroma_taps, filter_luma_taps

MW_PALLAS = 121  # 96 bs/tc + 16 luma ab + 8 chroma ab + 1 valid flag


def _wave_body(yw, uw, vw, mw, s_l, s_t, k, maxw,
               own_y, left_y, top_y, own_u, left_u, top_u,
               own_v, left_v, top_v, meta, patch, upatch, vpatch, sems):
    """One wave: DMA in, assemble patches, filter, DMA back."""
    K = k + 2

    def load(dst, src, slot):
        dma = pltpu.make_async_copy(src, dst, sems.at[slot])
        dma.start()
        return dma

    d = [
        load(own_y, yw.at[K, pl.ds(1, maxw)], 0),
        load(left_y, yw.at[K - 1, pl.ds(1 + s_l, maxw)], 1),
        load(top_y, yw.at[K - 2, pl.ds(1 + s_t, maxw)], 2),
        load(own_u, uw.at[K, pl.ds(1, maxw)], 3),
        load(left_u, uw.at[K - 1, pl.ds(1 + s_l, maxw)], 4),
        load(top_u, uw.at[K - 2, pl.ds(1 + s_t, maxw)], 5),
        load(own_v, vw.at[K, pl.ds(1, maxw)], 6),
        load(left_v, vw.at[K - 1, pl.ds(1 + s_l, maxw)], 7),
        load(top_v, vw.at[K - 2, pl.ds(1 + s_t, maxw)], 8),
        load(meta, mw.at[K, pl.ds(1, maxw)], 9),
    ]
    for dma in d:
        dma.wait()

    m = meta[...]
    vmask = m[:, 120] > 0

    # Mosaic cannot split the minor axis with reshapes; expand per-block
    # meta columns into per-pixel vectors via broadcast + concat instead.
    def rep4(base, e):  # 4 block cols -> (maxw, 16) pixel values
        return jnp.concatenate(
            [jnp.broadcast_to(m[:, base + 4 * e + b][:, None], (maxw, 4))
             for b in range(4)], axis=1)

    def rep2(base, e):  # 4 chroma block cols -> (maxw, 8)
        return jnp.concatenate(
            [jnp.broadcast_to(m[:, base + 4 * e + b][:, None], (maxw, 2))
             for b in range(4)], axis=1)

    own = own_y[...]
    left = left_y[...]
    top = top_y[...]
    patch[:, 0:4, 0:4] = jnp.zeros((maxw, 4, 4), jnp.int32)
    patch[:, 0:4, 4:20] = top[:, 12:16, :]
    patch[:, 4:20, 0:4] = left[:, :, 12:16]
    patch[:, 4:20, 4:20] = own
    ownu = own_u[...]
    leftu = left_u[...]
    topu = top_u[...]
    upatch[:, 0:4, 0:4] = jnp.zeros((maxw, 4, 4), jnp.int32)
    upatch[:, 0:4, 4:12] = topu[:, 4:8, :]
    upatch[:, 4:12, 0:4] = leftu[:, :, 4:8]
    upatch[:, 4:12, 4:12] = ownu
    ownv = own_v[...]
    leftv = left_v[...]
    topv = top_v[...]
    vpatch[:, 0:4, 0:4] = jnp.zeros((maxw, 4, 4), jnp.int32)
    vpatch[:, 0:4, 4:12] = topv[:, 4:8, :]
    vpatch[:, 4:12, 0:4] = leftv[:, :, 4:8]
    vpatch[:, 4:12, 4:12] = ownv

    # ---- 4 vertical then 4 horizontal luma edges (normative order) ----
    for e in range(4):
        x = 4 + 4 * e
        bs = rep4(0, e)[:, :, None]                  # (maxw, 16, 1)
        tc0 = rep4(32, e)[:, :, None]
        alpha = m[:, 96 + 2 * e][:, None, None]
        beta = m[:, 97 + 2 * e][:, None, None]
        taps = [patch[:, 4:20, x - 4 + t : x - 3 + t] for t in range(8)]
        out = filter_luma_taps(*taps, bs, alpha, beta, tc0)
        for t, val in enumerate(out):
            patch[:, 4:20, x - 3 + t : x - 2 + t] = val
    for e in range(4):
        yy = 4 + 4 * e
        bs = rep4(16, e)[:, None, :]                 # (maxw, 1, 16)
        tc0 = rep4(48, e)[:, None, :]
        alpha = m[:, 96 + 2 * (4 + e)][:, None, None]
        beta = m[:, 97 + 2 * (4 + e)][:, None, None]
        taps = [patch[:, yy - 4 + t : yy - 3 + t, 4:20] for t in range(8)]
        out = filter_luma_taps(*taps, bs, alpha, beta, tc0)
        for t, val in enumerate(out):
            patch[:, yy - 3 + t : yy - 2 + t, 4:20] = val

    def chroma(cp):
        for e in range(2):
            x = 4 + 4 * e
            bs = rep2(64, e)[:, :, None]             # (maxw, 8, 1)
            tc0 = rep2(80, e)[:, :, None]
            alpha = m[:, 112 + 2 * e][:, None, None]
            beta = m[:, 113 + 2 * e][:, None, None]
            p1 = cp[:, 4:12, x - 2 : x - 1]
            p0 = cp[:, 4:12, x - 1 : x]
            q0 = cp[:, 4:12, x : x + 1]
            q1 = cp[:, 4:12, x + 1 : x + 2]
            p0n, q0n = filter_chroma_taps(p1, p0, q0, q1, bs, alpha, beta,
                                          tc0)
            cp[:, 4:12, x - 1 : x] = p0n
            cp[:, 4:12, x : x + 1] = q0n
        for e in range(2):
            yy = 4 + 4 * e
            bs = rep2(72, e)[:, None, :]
            tc0 = rep2(88, e)[:, None, :]
            alpha = m[:, 112 + 2 * (2 + e)][:, None, None]
            beta = m[:, 113 + 2 * (2 + e)][:, None, None]
            p1 = cp[:, yy - 2 : yy - 1, 4:12]
            p0 = cp[:, yy - 1 : yy, 4:12]
            q0 = cp[:, yy : yy + 1, 4:12]
            q1 = cp[:, yy + 1 : yy + 2, 4:12]
            p0n, q0n = filter_chroma_taps(p1, p0, q0, q1, bs, alpha, beta,
                                          tc0)
            cp[:, yy - 1 : yy, 4:12] = p0n
            cp[:, yy : yy + 1, 4:12] = q0n

    chroma(upatch)
    chroma(vpatch)

    # Masked writeback through the staging buffers (invalid lanes restore
    # their loaded values), then DMA the whole blocks home.
    m3 = vmask[:, None, None]
    own_y[...] = jnp.where(m3, patch[:, 4:20, 4:20], own)
    left_y[:, :, 12:16] = jnp.where(m3, patch[:, 4:20, 0:4],
                                    left[:, :, 12:16])
    top_y[:, 12:16, :] = jnp.where(m3, patch[:, 0:4, 4:20],
                                   top[:, 12:16, :])
    own_u[...] = jnp.where(m3, upatch[:, 4:12, 4:12], ownu)
    left_u[:, :, 4:8] = jnp.where(m3, upatch[:, 4:12, 0:4],
                                  leftu[:, :, 4:8])
    top_u[:, 4:8, :] = jnp.where(m3, upatch[:, 0:4, 4:12],
                                 topu[:, 4:8, :])
    own_v[...] = jnp.where(m3, vpatch[:, 4:12, 4:12], ownv)
    left_v[:, :, 4:8] = jnp.where(m3, vpatch[:, 4:12, 0:4],
                                  leftv[:, :, 4:8])
    top_v[:, 4:8, :] = jnp.where(m3, vpatch[:, 0:4, 4:12],
                                 topv[:, 4:8, :])

    def store(src, dst, slot):
        dma = pltpu.make_async_copy(src, dst, sems.at[slot])
        dma.start()
        return dma

    d = [
        store(own_y, yw.at[K, pl.ds(1, maxw)], 0),
        store(left_y, yw.at[K - 1, pl.ds(1 + s_l, maxw)], 1),
        store(top_y, yw.at[K - 2, pl.ds(1 + s_t, maxw)], 2),
        store(own_u, uw.at[K, pl.ds(1, maxw)], 3),
        store(left_u, uw.at[K - 1, pl.ds(1 + s_l, maxw)], 4),
        store(top_u, uw.at[K - 2, pl.ds(1 + s_t, maxw)], 5),
        store(own_v, vw.at[K, pl.ds(1, maxw)], 6),
        store(left_v, vw.at[K - 1, pl.ds(1 + s_l, maxw)], 7),
        store(top_v, vw.at[K - 2, pl.ds(1 + s_t, maxw)], 8),
    ]
    for dma in d:
        dma.wait()


def _kernel(s_left_ref, s_top_ref,  # SMEM
            yw_in, uw_in, vw_in, mw,  # ANY (hbm); planes aliased to outputs
            yw, uw, vw,  # outputs (aliased)
            own_y, left_y, top_y, own_u, left_u, top_u,
            own_v, left_v, top_v, meta, patch, upatch, vpatch, sems):
    n_waves = s_left_ref.shape[0]
    maxw = own_y.shape[0]

    def body(k, _):
        _wave_body(yw, uw, vw, mw, s_left_ref[k], s_top_ref[k], k, maxw,
                   own_y, left_y, top_y, own_u, left_u, top_u,
                   own_v, left_v, top_v, meta, patch, upatch, vpatch, sems)
        return 0

    jax.lax.fori_loop(0, n_waves, body, 0)


@functools.partial(jax.jit, static_argnums=(6,))
def deblock_wavemajor_pallas(Yw, Uw, Vw, Mw, s_left, s_top,
                             interpret: bool = False):
    """Run the whole deblocking wavefront in one Pallas launch.

    Yw: (n_waves+2, LW, 16, 16) int32; Uw/Vw: (..., 8, 8); Mw:
    (n_waves+2, LW, MW_PALLAS) int32 (bs/tc + per-edge alpha/beta + valid);
    s_left/s_top: (n_waves,) int32 lane shifts. Returns filtered
    (Yw, Uw, Vw); the inputs are donated (aliased in place).
    """
    n_slots, LW = Yw.shape[:2]
    maxw = LW - 2
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct(Yw.shape, jnp.int32),
            jax.ShapeDtypeStruct(Uw.shape, jnp.int32),
            jax.ShapeDtypeStruct(Vw.shape, jnp.int32),
        ),
        in_specs=[smem, smem, any_spec, any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec, any_spec),
        input_output_aliases={2: 0, 3: 1, 4: 2},
        scratch_shapes=[
            pltpu.VMEM((maxw, 16, 16), jnp.int32),  # own_y
            pltpu.VMEM((maxw, 16, 16), jnp.int32),  # left_y
            pltpu.VMEM((maxw, 16, 16), jnp.int32),  # top_y
            pltpu.VMEM((maxw, 8, 8), jnp.int32),
            pltpu.VMEM((maxw, 8, 8), jnp.int32),
            pltpu.VMEM((maxw, 8, 8), jnp.int32),
            pltpu.VMEM((maxw, 8, 8), jnp.int32),
            pltpu.VMEM((maxw, 8, 8), jnp.int32),
            pltpu.VMEM((maxw, 8, 8), jnp.int32),
            pltpu.VMEM((maxw, MW_PALLAS), jnp.int32),  # meta
            pltpu.VMEM((maxw, 20, 20), jnp.int32),  # patch
            pltpu.VMEM((maxw, 12, 12), jnp.int32),  # upatch
            pltpu.VMEM((maxw, 12, 12), jnp.int32),  # vpatch
            pltpu.SemaphoreType.DMA((10,)),
        ],
        interpret=interpret,
    )(s_left, s_top, Yw, Uw, Vw, Mw)
