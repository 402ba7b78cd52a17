"""Multi-chip tile sharding: the sharded P-frame step (halo exchange over the
virtual 8-device CPU mesh) must produce bit-identical symbol arrays and
reconstruction to the single-chip path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from media_tpu.ops.transform import chroma_qp
from media_tpu.parallel.sharding import make_sharded_pframe_step, make_tile_mesh
from media_tpu.pipeline.encoder import FrameEncoder


def frames(w, h, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 32, w + 32)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    ref_y = big[:h, :w]
    cur_y = big[3 : h + 3, 5 : w + 5]  # global translation (-5, -3)
    ref_u = big[: h // 2, : w // 2] // 2 + 60
    ref_v = big[: h // 2, : w // 2] // 3 + 80
    cur_u = ref_u.copy()
    cur_v = ref_v.copy()
    return cur_y, cur_u, cur_v, ref_y, ref_u, ref_v


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_single_chip(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    w, h = 64, 16 * 2 * n_dev  # 2 MB rows per device
    cur_y, cur_u, cur_v, ref_y, ref_u, ref_v = frames(w, h)
    qp = 28
    qp_c = int(chroma_qp(qp))

    mesh = make_tile_mesh(n_dev)
    step = make_sharded_pframe_step(mesh, h, w, search_range=8)
    sharded = step(cur_y, cur_u, cur_v, ref_y, ref_u, ref_v, qp, qp_c)

    enc = FrameEncoder(w, h)
    single = enc.encode_pframe(cur_y, cur_u, cur_v, ref_y, ref_u, ref_v, qp)

    from media_tpu.pipeline.pframe_core import unpack_symbols

    fields = unpack_symbols(sharded["symbols"])
    np.testing.assert_array_equal(fields["mv"], single.mv)
    np.testing.assert_array_equal(fields["luma_levels"], single.luma_levels)
    np.testing.assert_array_equal(fields["cdc_levels"], single.cdc_levels)
    np.testing.assert_array_equal(fields["cac_levels"], single.cac_levels)
    np.testing.assert_array_equal(np.asarray(sharded["recon_y"]), np.asarray(single.recon_y))
    np.testing.assert_array_equal(np.asarray(sharded["recon_u"]), np.asarray(single.recon_u))
    np.testing.assert_array_equal(np.asarray(sharded["recon_v"]), np.asarray(single.recon_v))


def test_dryrun_entrypoints():
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)
