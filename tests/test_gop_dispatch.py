"""GOP-parallel dispatcher: byte-identity with a sequential session (CQ),
in-order stitching, DevicePool accounting, and the scaling report."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from media_tpu.parallel.gop_dispatch import GopDispatcher
from media_tpu.parallel.sharding import DevicePool
from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def make_frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    out = []
    for t in range(n):
        y = big[(2 * t) % 60 : (2 * t) % 60 + h,
                (3 * t) % 60 : (3 * t) % 60 + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[::2, ::2] // 3 + 70).astype(np.uint8)
        out.append(yuv.pack_i420(y, u, v))
    return out


def test_dispatch_matches_sequential_session():
    """2 workers over 4 GOPs == one sequential session, byte for byte (CQ:
    per-GOP state is the only state; idr_pic_id follows the GOP index)."""
    w, h, gop = 96, 80, 4
    frames = make_frames(w, h, 4 * gop)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=gop)

    d = GopDispatcher(cfg, n_workers=2)
    aus = d.encode(frames)
    d.close()

    seq = EncoderSession(cfg).encode_frames(frames)
    assert len(aus) == len(seq) == len(frames)
    for i, (a, b) in enumerate(zip(aus, seq)):
        assert a == b, (i, len(a), len(b))

    rep = d.report
    assert rep is not None and len(rep.gops) == 4
    assert rep.bytes_out == sum(len(a) for a in aus)
    assert {g.worker for g in rep.gops} <= {0, 1}
    assert 0.0 <= rep.dispatch_overhead < 1.0


def test_dispatch_stream_decodes():
    w, h, gop = 96, 80, 3
    frames = make_frames(w, h, 3 * gop, seed=2)
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=gop)
    d = GopDispatcher(cfg, n_workers=3)
    aus = d.encode(frames)
    d.close()
    dec = ReferenceDecoder()
    decoded = dec.decode_annexb(b"".join(aus))
    assert len(decoded) == len(frames)


def test_pool_accounting():
    pool = DevicePool(devices=["d0", "d1"])
    cfg = EncoderConfig(width=96, height=80, qp=30, gop_size=4)
    d = GopDispatcher(cfg, n_workers=2, pool=pool)
    assert all(x > 0 for x in pool.loads())
    d.close()
    assert pool.loads() == [0, 0]
