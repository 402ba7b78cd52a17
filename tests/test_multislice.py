"""Multi-slice encoding (SM_FIXEDSLCNUM analog): each frame is emitted as
several row-band slices with independent entropy/prediction state. Round
trips must stay bit-exact through the reference decoder."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from media_tpu.core.nal import H264NalType, iter_nal_units
from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def scene(w, h, t, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    y = big[2 * t : 2 * t + h, 3 * t : 3 * t + w].astype(np.uint8)
    u = ((big[: h // 2, : w // 2] // 2) + 60).astype(np.uint8)
    v = ((big[: h // 2, : w // 2] // 3) + 90).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("num_slices", [2, 4])
def test_multislice_ippp_roundtrip(num_slices):
    w, h = 128, 128  # 8 MB rows
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28, gop_size=6,
                                        num_slices=num_slices))
    dec = ReferenceDecoder()
    for t in range(4):
        y, u, v = scene(w, h, t)
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        vcl = [n for n in iter_nal_units(au)
               if n.nal_type in (H264NalType.SLICE, H264NalType.IDR_SLICE)]
        assert len(vcl) == num_slices, (t, len(vcl))
        frames = dec.decode_annexb(au)
        assert len(frames) == 1
        f = frames[0]
        np.testing.assert_array_equal(f.y, np.asarray(sess.recon[0]), err_msg=f"t={t}")
        np.testing.assert_array_equal(f.u, np.asarray(sess.recon[1]))
        np.testing.assert_array_equal(f.v, np.asarray(sess.recon[2]))
        assert yuv.psnr(f.y, y) > 30


def test_multislice_quality_close_to_single():
    w, h = 128, 128
    bufs = [yuv.pack_i420(*scene(w, h, t, seed=2)) for t in range(3)]
    sizes = {}
    for ns in (1, 4):
        sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28,
                                            gop_size=10, num_slices=ns))
        aus = [sess.encode_frame(b) for b in bufs]
        sizes[ns] = sum(len(a) for a in aus)
    # Slice independence costs a little rate but must stay in the same ballpark.
    assert sizes[4] < sizes[1] * 1.25, sizes


def test_slice_feed_split_mid_frame():
    """Feeding slice NALs of one frame across separate decode calls must
    produce the frame only once completed."""
    w, h = 64, 64
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30, gop_size=5,
                                        num_slices=2))
    au = sess.encode_frame(yuv.pack_i420(*scene(w, h, 0, seed=5)))
    nals = list(iter_nal_units(au))
    dec = ReferenceDecoder()
    from media_tpu.core.nal import wrap_nal

    out = []
    for n in nals:
        out += dec.decode_annexb(wrap_nal(n.nal_type, n.rbsp, nal_ref_idc=n.nal_ref_idc))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0].y, np.asarray(sess.recon[0]))
