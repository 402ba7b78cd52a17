"""Pallas TPU kernel for one deblocking wavefront step.

The XLA formulation of a wave (pipeline/deblock_apply.py) executes ~240 small
vector ops per wave — at 255 waves/frame (1080p) per-op dispatch dominates
(~1.2 ms/wave). This kernel runs the entire per-wave edge-filter sequence
(4 vertical + 4 horizontal luma edges, 2+2 per chroma plane, in the normative
per-MB order) as ONE kernel launch on VMEM-resident patches.

Mosaic layout constraints shape the interface: per-edge strengths and tc0
values are precomputed OUTSIDE (XLA) and passed with the edge index on the
LEADING axis, and all tap loads/stores are rank-preserving slices
((N,16,1) columns for vertical edges, (N,1,16) rows for horizontal ones).
`interpret=True` runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deblock import filter_chroma_taps, filter_luma_taps


def _wave_kernel(params_ref,
                 bsv_ref, tcv_ref, bsh_ref, tch_ref,
                 bscv_ref, tccv_ref, bsch_ref, tcch_ref,
                 yp_ref, up_ref, vp_ref,
                 yo_ref, uo_ref, vo_ref):
    """params: (4,) int32 [alpha, beta, alpha_c, beta_c].
    bsv/tcv: (4, N, 16, 1); bsh/tch: (4, N, 1, 16);
    bscv/tccv: (2, N, 8, 1); bsch/tcch: (2, N, 1, 8).
    yp: (N, 20, 20); up/vp: (N, 12, 12)."""
    alpha = params_ref[0]
    beta = params_ref[1]
    alpha_c = params_ref[2]
    beta_c = params_ref[3]

    yo_ref[:] = yp_ref[:]
    uo_ref[:] = up_ref[:]
    vo_ref[:] = vp_ref[:]

    # 4 vertical luma edges, left to right (normative MB order collapses to
    # this on single-MB patches whose neighbor strips are already final).
    for e in range(4):
        x = 4 + 4 * e
        bs = bsv_ref[e]
        tc0 = tcv_ref[e]
        taps = [yo_ref[:, 4:20, x - 4 + k : x - 3 + k] for k in range(8)]
        out = filter_luma_taps(*taps, bs, alpha, beta, tc0)
        for k, val in enumerate(out):
            yo_ref[:, 4:20, x - 3 + k : x - 2 + k] = val

    # 4 horizontal luma edges, top to bottom.
    for e in range(4):
        y = 4 + 4 * e
        bs = bsh_ref[e]
        tc0 = tch_ref[e]
        taps = [yo_ref[:, y - 4 + k : y - 3 + k, 4:20] for k in range(8)]
        out = filter_luma_taps(*taps, bs, alpha, beta, tc0)
        for k, val in enumerate(out):
            yo_ref[:, y - 3 + k : y - 2 + k, 4:20] = val

    def chroma(ref):
        for e in range(2):
            x = 4 + 4 * e
            bs = bscv_ref[e]
            tc0 = tccv_ref[e]
            p1 = ref[:, 4:12, x - 2 : x - 1]
            p0 = ref[:, 4:12, x - 1 : x]
            q0 = ref[:, 4:12, x : x + 1]
            q1 = ref[:, 4:12, x + 1 : x + 2]
            p0n, q0n = filter_chroma_taps(p1, p0, q0, q1, bs, alpha_c, beta_c, tc0)
            ref[:, 4:12, x - 1 : x] = p0n
            ref[:, 4:12, x : x + 1] = q0n
        for e in range(2):
            y = 4 + 4 * e
            bs = bsch_ref[e]
            tc0 = tcch_ref[e]
            p1 = ref[:, y - 2 : y - 1, 4:12]
            p0 = ref[:, y - 1 : y, 4:12]
            q0 = ref[:, y : y + 1, 4:12]
            q1 = ref[:, y + 1 : y + 2, 4:12]
            p0n, q0n = filter_chroma_taps(p1, p0, q0, q1, bs, alpha_c, beta_c, tc0)
            ref[:, y - 1 : y, 4:12] = p0n
            ref[:, y : y + 1, 4:12] = q0n

    chroma(uo_ref)
    chroma(vo_ref)


@functools.partial(jax.jit, static_argnums=(12,))
def deblock_wave_pallas(params, bsv, tcv, bsh, tch, bscv, tccv, bsch, tcch,
                        yp, up, vp, interpret: bool = False):
    """One wavefront step -> filtered (yp, up, vp). See _wave_kernel shapes."""
    n = yp.shape[0]
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _wave_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 20, 20), jnp.int32),
            jax.ShapeDtypeStruct((n, 12, 12), jnp.int32),
            jax.ShapeDtypeStruct((n, 12, 12), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vm] * 11,
        out_specs=(vm, vm, vm),
        interpret=interpret,
    )(params, bsv, tcv, bsh, tch, bscv, tccv, bsch, tcch, yp, up, vp)
