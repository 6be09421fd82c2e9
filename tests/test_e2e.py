"""End-to-end bitstream tests: encode -> real bytes -> decode, bit-exact.

This is the test the reference only performs as a runtime self-check
(encoder/decoder md5 comparison, reference: src/real_life/decode.py:304-326):
the decoder, given ONLY the bitstream, must reproduce the encoder's
decoded frames exactly, for AI, LDP and RA coding structures.
"""

import numpy as np
import pytest

from aivc_tpu.config import CodingConfig
from aivc_tpu.models.zoo import TINY, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import decode_video, encode_video, evaluate_frames

H, W = 64, 48
N_FRAMES = 5


def _synthetic_frames(n=N_FRAMES, h=H, w=W, seed=0):
    """Smooth moving-gradient frames: compressible, nontrivial motion."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h * 2, w * 2), dtype=np.uint8)
    # Smooth it to make it codable
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view

    sm = sliding_window_view(base.astype(np.float64), (5, 5)).mean(axis=(2, 3))
    frames = []
    for t in range(n):
        y = sm[t * 2: t * 2 + h, t: t + w]
        frame = {
            "y": y.astype(np.uint8),
            "u": (y[::2, ::2] * 0.5 + 64).astype(np.uint8)[: (h + 1) // 2, : (w + 1) // 2],
            "v": (y[::2, ::2] * 0.25 + 96).astype(np.uint8)[: (h + 1) // 2, : (w + 1) // 2],
        }
        frames.append(frame)
    return frames


@pytest.fixture(scope="module")
def codec():
    _, params = init_fullnet(TINY, spatial=64)
    return FrameCodec(TINY, params, H, W)


def _assert_bit_exact(enc_result, decoded):
    assert set(decoded) == set(enc_result.decoded_frames)
    for idx in decoded:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                decoded[idx][k], enc_result.decoded_frames[idx][k],
                err_msg=f"frame {idx} plane {k} drifted")


def test_all_intra_roundtrip(codec):
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="AI")
    res = encode_video(codec, frames, cfg)
    assert res.total_bytes > 0
    decoded = decode_video(codec, res.bitstream)
    assert len(decoded) == 3
    _assert_bit_exact(res, decoded)
    # Shapes match the source
    assert decoded[0]["y"].shape == (H, W)
    assert decoded[0]["u"].shape == ((H + 1) // 2, (W + 1) // 2)


def test_ldp_roundtrip(codec):
    frames = _synthetic_frames(5)
    cfg = CodingConfig(coding_config="LDP", intra_period=4)
    res = encode_video(codec, frames, cfg)
    decoded = decode_video(codec, res.bitstream)
    assert len(decoded) == 5
    _assert_bit_exact(res, decoded)


def test_ra_roundtrip_with_padding(codec):
    frames = _synthetic_frames(5)  # gop of 5 frames (1_GOP_4), one padded GOP
    cfg = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)
    res = encode_video(codec, frames, cfg)
    decoded = decode_video(codec, res.bitstream)
    # Padded frames are dropped on decode (reference: decode.py:157-190)
    assert len(decoded) == 5
    _assert_bit_exact(res, decoded)


def test_rate_index_changes_rate(codec):
    frames = _synthetic_frames(1)
    lo = encode_video(codec, frames, CodingConfig(coding_config="AI", idx_rate=0.0))
    hi = encode_video(codec, frames, CodingConfig(coding_config="AI", idx_rate=2.0))
    #

    # Rates differ (gains untrained, so only require the plumbing to work:
    # both decode bit-exactly)
    d_lo = decode_video(codec, lo.bitstream)
    d_hi = decode_video(codec, hi.bitstream)
    _assert_bit_exact(lo, d_lo)
    _assert_bit_exact(hi, d_hi)


def test_fractional_idx_rate_survives_header(codec):
    # idx_rate is stored as round(r * 16)/16 in the GOP header
    frames = _synthetic_frames(1)
    res = encode_video(
        codec, frames, CodingConfig(coding_config="AI", idx_rate=1.5))
    decoded = decode_video(codec, res.bitstream)
    _assert_bit_exact(res, decoded)


def test_evaluate_reports_sane_metrics(codec):
    frames = _synthetic_frames(2)
    res = encode_video(codec, frames, CodingConfig(coding_config="AI"))
    m = evaluate_frames(frames, res.decoded_frames)
    assert np.isfinite(m["psnr"])
    assert 0.0 <= m["ms_ssim"] <= 1.0


def test_truncated_bitstream_raises(codec):
    frames = _synthetic_frames(1)
    res = encode_video(codec, frames, CodingConfig(coding_config="AI"))
    with pytest.raises(Exception):
        decode_video(codec, res.bitstream[: len(res.bitstream) // 2])


@pytest.mark.slow
def test_odd_dimensions_roundtrip():
    """Odd H/W (odd UV sizes, reference: decode.py:556-571,
    header.py:119-124): pad-to-64 + header-carried true size must
    roundtrip bit-exactly through the real bitstream."""
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec

    h, w = 37, 51
    rng = np.random.default_rng(3)
    frames = []
    for t in range(3):
        y = rng.integers(0, 255, (h, w), dtype=np.uint8)
        frames.append({
            "y": y,
            "u": y[: (h + 1) // 2 * 2: 2, : (w + 1) // 2 * 2: 2],
            "v": 255 - y[: (h + 1) // 2 * 2: 2, : (w + 1) // 2 * 2: 2],
        })
    assert frames[0]["u"].shape == ((h + 1) // 2, (w + 1) // 2)
    _, params = init_fullnet(TINY, spatial=64)
    c = FrameCodec(TINY, params, h, w)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)
    res = encode_video(c, frames, cfg)
    dec = decode_video(c, res.bitstream)
    _assert_bit_exact(res, dec)
    assert dec[0]["y"].shape == (h, w)
    assert dec[0]["u"].shape == ((h + 1) // 2, (w + 1) // 2)


@pytest.mark.slow
def test_rate_priority_policy_and_roundtrip(codec):
    """Rate-priority K policy: smaller stream counts (smaller state
    flush) than the default, same bit-exact closed loop — the decoder
    reads K from the chunk header, so any codec decodes the stream."""
    from aivc_tpu.gop import FRAME_I
    from aivc_tpu.models.zoo import init_fullnet as _init

    _, params = _init(TINY, spatial=64)
    rp = FrameCodec(TINY, params, 1088, 1920, rate_priority=True)
    default = FrameCodec(TINY, params, 1088, 1920)
    # First frame (no payload hint yet): rate-priority starts at the
    # scan-depth floor instead of the throughput-sized pick_k.
    assert rp._pick_k(FRAME_I) < default._pick_k(FRAME_I)
    # Low-rate hint (2 KB/frame payload at 1080p): the default policy is
    # pinned at its 2048-step floor; rate-priority drops well below it.
    rp._update_k_hint(FRAME_I, 2048)
    default._update_k_hint(FRAME_I, 2048)
    k_rp, k_def = rp._pick_k(FRAME_I), default._pick_k(FRAME_I)
    assert k_rp < k_def
    assert k_rp * 4 <= 64  # flush <= 64 B against a 2 KB payload

    # Closed loop at test size: rate-priority encode, default decode.
    rp_small = FrameCodec(TINY, params, H, W, rate_priority=True)
    frames = _synthetic_frames(5)
    cfg = CodingConfig(coding_config="RA", gop_size=4, intra_period=4,
                       idx_rate=6.0)
    res = encode_video(rp_small, frames, cfg)
    decoded = decode_video(codec, res.bitstream)
    _assert_bit_exact(res, decoded)
