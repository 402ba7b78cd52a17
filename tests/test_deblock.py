"""Deblocking filter: the JAX wavefront and the numpy raster implementation
must agree bit-exactly on random planes/strengths (they implement the same
normative ordering via different schedules)."""

import os

import numpy as np
import pytest

from media_tpu.pipeline.deblock_apply import deblock_frame
from media_tpu.ref.deblock import (
    deblock_frame_np,
    inter_bs_grids_np,
    intra_bs_grids_np,
)


def planes(R, C, seed=0, smooth=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (R * 16, C * 16)).astype(np.int32)
    u = rng.integers(0, 256, (R * 8, C * 8)).astype(np.int32)
    v = rng.integers(0, 256, (R * 8, C * 8)).astype(np.int32)
    if smooth:  # smooth content so |p0-q0| < alpha triggers filtering
        y = (y // 8 + 100).astype(np.int32)
        u = (u // 8 + 80).astype(np.int32)
        v = (v // 8 + 80).astype(np.int32)
    return y, u, v


@pytest.mark.parametrize("kernel", ["wavemajor", "xla", "pallas"])
@pytest.mark.parametrize("qp", [22, 30])
@pytest.mark.parametrize("smooth", [False, True])
def test_intra_deblock_jax_matches_numpy(qp, smooth, kernel, monkeypatch):
    monkeypatch.setenv("MEDIA_TPU_DEBLOCK_KERNEL", kernel)
    R, C = 4, 5
    y, u, v = planes(R, C, seed=qp, smooth=smooth)
    bs_v, bs_h = intra_bs_grids_np(R, C)
    qp_c = min(qp, 39)
    ry, ru, rv = map(np.asarray, deblock_frame(y, u, v, qp, qp_c, bs_v, bs_h, R, C))
    ny, nu, nv = deblock_frame_np(y, u, v, qp, qp_c, bs_v, bs_h)
    np.testing.assert_array_equal(ry.astype(np.uint8), ny)
    np.testing.assert_array_equal(ru.astype(np.uint8), nu)
    np.testing.assert_array_equal(rv.astype(np.uint8), nv)


@pytest.mark.parametrize("kernel", ["wavemajor", "xla", "pallas"])
@pytest.mark.parametrize("seed", range(2))
def test_inter_deblock_jax_matches_numpy(seed, kernel, monkeypatch):
    monkeypatch.setenv("MEDIA_TPU_DEBLOCK_KERNEL", kernel)
    R, C = 3, 6
    y, u, v = planes(R, C, seed=seed, smooth=True)
    rng = np.random.default_rng(100 + seed)
    nnz = (rng.random((R * 4, C * 4)) < 0.4).astype(np.int32)
    mv = rng.integers(-20, 21, (R, C, 2)).astype(np.int32)
    bs_v, bs_h = inter_bs_grids_np(nnz, mv)
    qp, qp_c = 32, 32
    ry, ru, rv = map(np.asarray, deblock_frame(y, u, v, qp, qp_c, bs_v, bs_h, R, C))
    ny, nu, nv = deblock_frame_np(y, u, v, qp, qp_c, bs_v, bs_h)
    np.testing.assert_array_equal(ry.astype(np.uint8), ny)
    np.testing.assert_array_equal(ru.astype(np.uint8), nu)
    np.testing.assert_array_equal(rv.astype(np.uint8), nv)


def test_bs_grids_jax_matches_numpy():
    import jax.numpy as jnp

    from media_tpu.ops.deblock import inter_bs_grids, intra_bs_grids

    rng = np.random.default_rng(0)
    R, C = 3, 4
    nnz = (rng.random((R * 4, C * 4)) < 0.3).astype(np.int32)
    mv = rng.integers(-10, 11, (R, C, 2)).astype(np.int32)
    jv, jh = inter_bs_grids(jnp.asarray(nnz), jnp.asarray(mv), R, C)
    nv_, nh = inter_bs_grids_np(nnz, mv)
    np.testing.assert_array_equal(np.asarray(jv), nv_)
    np.testing.assert_array_equal(np.asarray(jh), nh)
    jv, jh = intra_bs_grids(R, C)
    nv_, nh = intra_bs_grids_np(R, C)
    np.testing.assert_array_equal(np.asarray(jv), nv_)
    np.testing.assert_array_equal(np.asarray(jh), nh)


def test_filtering_actually_changes_smooth_edges():
    R, C = 2, 2
    y = np.zeros((32, 32), np.int32)
    y[:, :16] = 100
    y[:, 16:] = 120  # step at the MB edge
    u = np.full((16, 16), 100, np.int32)
    v = u.copy()
    bs_v, bs_h = intra_bs_grids_np(R, C)
    ry, _, _ = deblock_frame_np(y, u, v, 30, 30, bs_v, bs_h)
    assert not np.array_equal(ry, y.astype(np.uint8))  # the step was smoothed
    assert abs(int(ry[5, 15]) - int(ry[5, 16])) < 20


def test_wavepallas_kernel_bit_exact():
    """Single-launch Pallas wavefront (ops/deblock_wave_pallas.py) vs the
    XLA wave-major scan: bit-exact in both QP modes (interpret on CPU)."""
    import os

    import numpy as np

    from media_tpu.pipeline import deblock_apply as da

    rng = np.random.default_rng(3)
    R, C = 5, 7
    y = rng.integers(0, 256, (R * 16, C * 16)).astype(np.int32)
    u = rng.integers(0, 256, (R * 8, C * 8)).astype(np.int32)
    v = rng.integers(0, 256, (R * 8, C * 8)).astype(np.int32)
    bs_v = rng.integers(0, 4, (R * 4, C * 4)).astype(np.int32)
    bs_v[:, 0] = 0
    bs_h = rng.integers(0, 4, (R * 4, C * 4)).astype(np.int32)
    bs_h[0, :] = 0
    qp_map = np.clip(30 + rng.integers(-4, 5, (R, C)), 0, 51).astype(np.int32)
    for qmap in (None, qp_map):
        ref = [np.asarray(x) for x in da._deblock_frame_wavemajor(
            y, u, v, 30, 30, bs_v, bs_h, R, C, qp_map=qmap)]
        os.environ["MEDIA_TPU_DEBLOCK_KERNEL"] = "wavepallas"
        try:
            got = [np.asarray(x) for x in da._deblock_frame_wavemajor(
                y, u, v, 30, 30, bs_v, bs_h, R, C, qp_map=qmap)]
        finally:
            del os.environ["MEDIA_TPU_DEBLOCK_KERNEL"]
        for a, b, name in zip(ref, got, "yuv"):
            np.testing.assert_array_equal(a, b, err_msg=name)
