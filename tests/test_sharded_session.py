"""Integrated multi-chip encoder session: byte-identical AUs vs the
single-chip multi-slice session, and a decodable stream (runs on the
virtual 8-device CPU mesh, conftest)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from media_tpu.parallel.sharding import ShardedEncoderSession
from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv
from tests.test_roundtrip_pframe import moving_scene


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_session_matches_single_chip(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    w, h = 128, 128
    frames = [yuv.pack_i420(*moving_scene(w, h, t, seed=7)) for t in range(5)]

    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=16,
                        num_slices=n_dev, deblock_across_slices=False,
                        entropy_mode="host")
    single = EncoderSession(cfg)
    aus_single = single.encode_frames(frames)

    sharded = ShardedEncoderSession(
        EncoderConfig(width=w, height=h, qp=30, gop_size=16), n_devices=n_dev)
    aus_sharded = sharded.encode_frames(frames)

    assert len(aus_single) == len(aus_sharded) == 5
    for t, (a, b) in enumerate(zip(aus_single, aus_sharded)):
        assert a == b, f"AU {t} differs: {len(a)} vs {len(b)} bytes"

    # The stream decodes, honoring slice-local deblocking (idc == 2).
    dec = ReferenceDecoder()
    for t, au in enumerate(aus_sharded):
        f = dec.decode_annexb(au)[0]
        np.testing.assert_array_equal(
            f.y, np.asarray(sharded.recon[0]) if t == 4 else f.y)
    np.testing.assert_array_equal(f.y, np.asarray(sharded.recon[0]))
    np.testing.assert_array_equal(f.u, np.asarray(sharded.recon[1]))
    np.testing.assert_array_equal(f.v, np.asarray(sharded.recon[2]))


def test_sharded_session_spans_idr():
    """GOP boundary inside the run: IDR re-encode + resharding of refs."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual device mesh")
    w, h = 64, 64
    frames = [yuv.pack_i420(*moving_scene(w, h, t)) for t in range(6)]
    sharded = ShardedEncoderSession(
        EncoderConfig(width=w, height=h, qp=32, gop_size=3), n_devices=2)
    aus = sharded.encode_frames(frames)
    assert len(aus) == 6
    dec = ReferenceDecoder()
    n = 0
    for au in aus:
        n += len(dec.decode_annexb(au))
    assert n == 6
