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


def test_sharded_idr_force_keyframe_byte_identical():
    """Round-3 parity: IDR frames run tile-parallel ON the mesh (not single
    chip + reshard), and force_keyframe() is honored mid-stream; AUs stay
    byte-identical to the single-chip multi-slice session."""
    import dataclasses

    w, h = 64, 128  # 8 MB rows / 4 devices
    frames = [yuv.pack_i420(*moving_scene(w, h, t, seed=3))
              for t in range(5)]
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=100, deblock=True)
    ss = ShardedEncoderSession(cfg, n_devices=4)
    aus = ss.encode_frames(frames[:3])
    ss.force_keyframe()
    aus += ss.encode_frames(frames[3:])

    cfg1 = dataclasses.replace(cfg, num_slices=4,
                               deblock_across_slices=False,
                               entropy_mode="host")
    sc = EncoderSession(cfg1)
    ref = sc.encode_frames(frames[:3])
    sc.force_keyframe()
    ref += sc.encode_frames(frames[3:])
    assert aus == ref


def test_sharded_cbr_adaptive_deblock_roundtrip():
    """CBR + adaptive QP + deblock on the mesh: exact per-tile bits are
    psum'd into the shared virtual buffer inside the device scan; the
    stream decodes bit-exact against the mesh reconstruction."""
    from media_tpu.ref.decoder import ReferenceDecoder

    w, h = 64, 128
    frames = [yuv.pack_i420(*moving_scene(w, h, t, seed=4))
              for t in range(6)]
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1000,
                        rc_mode="cbr", bitrate=500_000, framerate=30,
                        deblock=True, adaptive_qp=True)
    ss = ShardedEncoderSession(cfg, n_devices=4)
    aus = ss.encode_frames(frames)
    dec = ReferenceDecoder()
    decoded = dec.decode_annexb(b"".join(aus))
    assert len(decoded) == len(frames)
    np.testing.assert_array_equal(decoded[-1].y, np.asarray(ss.recon[0]))
    np.testing.assert_array_equal(decoded[-1].u, np.asarray(ss.recon[1]))
    np.testing.assert_array_equal(decoded[-1].v, np.asarray(ss.recon[2]))
    # The controller actually adapts (sizes not all equal).
    sizes = [len(a) for a in aus[1:]]
    assert len(set(sizes)) > 1
