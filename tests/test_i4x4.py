"""I_4x4 intra: predictor cross-check (JAX vs independent scalar), session
round trips with per-MB I4x4/I16 decision, and the quality gain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from media_tpu.ops import intra as intra_ops
from media_tpu.pipeline.codec import EncoderConfig, EncoderSession
from media_tpu.ref.decoder import ReferenceDecoder
from media_tpu.utils import yuv


def test_pred4x4_jax_matches_scalar():
    rng = np.random.default_rng(0)
    n = 256
    t8 = rng.integers(0, 256, (n, 8)).astype(np.int32)
    l4 = rng.integers(0, 256, (n, 4)).astype(np.int32)
    q = rng.integers(0, 256, (n,)).astype(np.int32)
    at = rng.random(n) < 0.8
    al = rng.random(n) < 0.8
    atr = rng.random(n) < 0.5
    # substitution contract: the caller folds unavailable TR into t8
    t8_sub = t8.copy()
    t8_sub[~atr, 4:8] = t8_sub[~atr, 3:4]

    preds, ok = jax.jit(intra_ops.pred_4x4_all)(
        jnp.asarray(t8_sub), jnp.asarray(l4), jnp.asarray(q),
        jnp.asarray(at), jnp.asarray(al), jnp.asarray(atr))
    preds = np.asarray(preds)
    ok = np.asarray(ok)

    for i in range(n):
        for mode in range(9):
            if not ok[i, mode]:
                continue
            want = ReferenceDecoder._pred4x4(
                mode, t8_sub[i].astype(np.int64), l4[i].astype(np.int64),
                int(q[i]), bool(at[i]), bool(al[i]))
            np.testing.assert_array_equal(
                preds[i, mode], want, err_msg=f"mode {mode} sample {i}")


def structured_scene(w, h, seed=1):
    """Strong directional edges: the content class where I_4x4 wins."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(xx / 3.0) * (yy % 17 < 9)
         + 50 * ((xx + 2 * yy) % 23 < 7)).clip(0, 255).astype(np.uint8)
    y += rng.integers(0, 6, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 90, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    return y, u, v


@pytest.mark.parametrize("deblock", [False, True])
def test_i4x4_session_roundtrip(deblock):
    w, h = 128, 96
    y, u, v = structured_scene(w, h)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28,
                                        gop_size=8, i4x4=True,
                                        deblock=deblock))
    au = sess.encode_frame(yuv.pack_i420(y, u, v))
    dec = ReferenceDecoder()
    f = dec.decode_annexb(au)[0]
    np.testing.assert_array_equal(f.y, np.asarray(sess.recon[0]))
    np.testing.assert_array_equal(f.u, np.asarray(sess.recon[1]))
    np.testing.assert_array_equal(f.v, np.asarray(sess.recon[2]))
    # P frame on top of the I4x4 IDR still round-trips.
    au2 = sess.encode_frame(yuv.pack_i420(y, u, v))
    f2 = dec.decode_annexb(au2)[0]
    np.testing.assert_array_equal(f2.y, np.asarray(sess.recon[0]))


def test_i4x4_improves_intra_quality():
    """On directional content, enabling I_4x4 must improve the intra
    rate-distortion point (better PSNR at no more bits, or fewer bits at no
    less PSNR)."""
    w, h = 192, 160
    y, u, v = structured_scene(w, h, seed=3)
    out = {}
    for flag in (False, True):
        sess = EncoderSession(EncoderConfig(width=w, height=h, qp=30,
                                            gop_size=8, i4x4=flag))
        au = sess.encode_frame(yuv.pack_i420(y, u, v))
        psnr = yuv.psnr(np.asarray(sess.recon[0])[:h, :w], y)
        out[flag] = (len(au), psnr)
        if flag:
            # the decision must actually pick I_4x4 somewhere on this content
            res = sess._frame_encoder.encode_iframe(
                yuv.pad_to_mb_grid(y, 16), yuv.pad_to_mb_grid(u, 8),
                yuv.pad_to_mb_grid(v, 8), 30, i4x4=True)
            assert res.is_i4.sum() > 0
    bits16, psnr16 = out[False]
    bits4, psnr4 = out[True]
    # BD-style criterion: the rate saving must exceed the rate-equivalent of
    # any PSNR drop (~25% bits per dB around these operating points).
    saving_pct = 100.0 * (1 - bits4 / bits16)
    drop_db = max(0.0, psnr16 - psnr4)
    assert drop_db < 0.5, (out,)
    assert saving_pct > 25.0 * drop_db, (out, saving_pct, drop_db)


def test_tpu_decoder_falls_back_on_i4x4():
    from media_tpu.pipeline.decoder_tpu import TpuDecoder, UnsupportedStream

    w, h = 64, 64
    y, u, v = structured_scene(w, h)
    sess = EncoderSession(EncoderConfig(width=w, height=h, qp=28, i4x4=True))
    au = sess.encode_frame(yuv.pack_i420(y, u, v))
    dec = TpuDecoder()
    try:
        frames = dec.decode_annexb(au)
        # If the stream happened to pick I16 everywhere, decode must match.
        np.testing.assert_array_equal(frames[0].y, np.asarray(sess.recon[0]))
    except UnsupportedStream:
        pass  # expected when I_4x4 MBs are present
