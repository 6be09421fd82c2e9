"""Cross-backend entropy coding: the video header's backend flag makes
any codec decode any bitstream, and both backends are closed-loop exact."""

import numpy as np
import pytest

from aivc_tpu.coding import bitstream as bs
from aivc_tpu.config import CodingConfig
from aivc_tpu.models.zoo import TINY, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import decode_video, encode_video

from tests.test_e2e import H, W, _assert_bit_exact, _synthetic_frames


@pytest.fixture(scope="module")
def params():
    _, p = init_fullnet(TINY, spatial=64)
    return p


@pytest.fixture(scope="module")
def codec_dev(params):
    return FrameCodec(TINY, params, H, W, entropy_backend="device")


@pytest.fixture(scope="module")
def codec_host(params):
    return FrameCodec(TINY, params, H, W, entropy_backend="host")


def test_header_records_backend(codec_dev, codec_host):
    assert codec_dev.video_header(1, 0, 0).backend == bs.BACKEND_DEVICE
    assert codec_host.video_header(1, 0, 0).backend == bs.BACKEND_HOST
    hdr = codec_dev.video_header(3, 0, 8)
    assert bs.VideoHeader.unpack(hdr.pack()) == hdr


def test_device_bitstream_decoded_by_host_codec(codec_dev, codec_host):
    frames = _synthetic_frames(5)
    cfg = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)
    res = encode_video(codec_dev, frames, cfg)
    # A codec configured for host *encoding* still decodes device chunks:
    # the format flag travels in the video header.
    dec = decode_video(codec_host, res.bitstream)
    _assert_bit_exact(res, dec)


def test_host_bitstream_decoded_by_device_codec(codec_dev, codec_host):
    frames = _synthetic_frames(5)
    cfg = CodingConfig(coding_config="LDP", intra_period=4)
    res = encode_video(codec_host, frames, cfg)
    dec = decode_video(codec_dev, res.bitstream)
    _assert_bit_exact(res, dec)


def test_backends_reconstruct_identically(codec_dev, codec_host):
    """Entropy coding is lossless, so the decoded pixels must be
    IDENTICAL between backends (only the chunk bytes differ)."""
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)
    res_d = encode_video(codec_dev, frames, cfg)
    res_h = encode_video(codec_host, frames, cfg)
    assert set(res_d.decoded_frames) == set(res_h.decoded_frames)
    for idx in res_d.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                res_d.decoded_frames[idx][k], res_h.decoded_frames[idx][k])
    # Same number of frames/GOPs, different chunk encodings.
    assert len(res_d.frame_results) == len(res_h.frame_results)


def test_device_backend_debug_selfcheck(params):
    """Debug mode roundtrips every device-coded chunk and raises on any
    mismatch (reference: bitstream.py:332-350 'Ok!/Ko!' self-check)."""
    codec = FrameCodec(TINY, params, H, W, debug=True,
                       entropy_backend="device")
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)
    res = encode_video(codec, frames, cfg)
    dec = decode_video(codec, res.bitstream)
    _assert_bit_exact(res, dec)


def test_wave_batched_device_backend(codec_dev):
    frames = _synthetic_frames(9)
    cfg = CodingConfig(coding_config="RA", gop_size=8, intra_period=8)
    res = encode_video(codec_dev, frames, cfg, wave_batch=4)
    dec = decode_video(codec_dev, res.bitstream, wave_batch=4)
    _assert_bit_exact(res, dec)


@pytest.mark.slow
def test_pallas_encode_path_bitstream_identical(params, monkeypatch):
    """The Pallas fused-encode route (interpret mode on CPU) must produce a
    byte-identical video bitstream to the XLA scan route, through the full
    pipeline (launch/finish, suffix pull, segment stats)."""
    frames = _synthetic_frames(5)
    coding = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)

    monkeypatch.setenv("AIVC_VRANS_K", "1024")
    monkeypatch.setenv("AIVC_VRANS_ENC", "xla")
    codec_a = FrameCodec(TINY, params, H, W, entropy_backend="device")
    res_a = encode_video(codec_a, frames, coding, wave_batch=2)

    monkeypatch.setenv("AIVC_VRANS_ENC", "interpret")
    codec_b = FrameCodec(TINY, params, H, W, entropy_backend="device")
    res_b = encode_video(codec_b, frames, coding, wave_batch=2)

    assert res_a.bitstream == res_b.bitstream
    for fa, fb in zip(res_a.frame_results, res_b.frame_results):
        assert (fa.bytes, fa.mode_bytes, fa.codec_bytes) == \
            (fb.bytes, fb.mode_bytes, fb.codec_bytes)

    dec = decode_video(codec_a, res_b.bitstream, wave_batch=2)
    _assert_bit_exact(res_a, dec)


@pytest.mark.slow
def test_elided_v2_stream_smaller_and_bit_exact(monkeypatch, tmp_path):
    """The v2 fused format (zero feature maps elided on device) must (a)
    decode bit-exactly, (b) shrink the bitstream on a trained model whose
    latents are channel-sparse, and (c) stay decodable by a codec whose
    own encoding mode is dense (the format is per-chunk, not per-codec)."""
    import jax
    import numpy as np

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video
    from aivc_tpu.utils.checkpoint import load_checkpoint

    cfg, params = load_checkpoint("models_ckpt/tiny-toy")
    h, w = 96, 112
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(5):
        y = np.clip(128 + 70 * np.sin(xx / 21.0 + 0.15 * t)
                    + 40 * np.cos(yy / 13.0), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin((xx + yy) / 37.0), 0,
                    255).astype(np.uint8)[::2, ::2]
        frames.append({"y": y, "u": u, "v": 255 - u})
    coding = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)

    monkeypatch.setenv("AIVC_VRANS_ELIDE", "0")
    codec_dense = FrameCodec(cfg, params, h, w)
    assert not codec_dense.elide
    res_dense = encode_video(codec_dense, frames, coding)

    monkeypatch.setenv("AIVC_VRANS_ELIDE", "1")
    codec_el = FrameCodec(cfg, params, h, w)
    assert codec_el.elide
    res_el = encode_video(codec_el, frames, coding)

    # (b) the elided stream codes strictly fewer rANS words (zero
    # channels dropped); at this toy latent size (42-pixel grids) the
    # per-frame bitmap overhead can outweigh the ~0.01-bit/symbol zero
    # cost, so assert words (the elision effect) and a bounded total.
    from aivc_tpu.coding import bitstream as bs_mod
    from aivc_tpu.coding import vrans

    def frame_words(bitstream):
        _, gops = bs_mod.unpack_video(bitstream)
        counts = []
        for g in gops:
            _, frames_b = bs_mod.unpack_gop(g)
            for fb in frames_b:
                payload = bs_mod.unpack_frame(fb)["codecnet_z"]
                w, _, _, _ = vrans.parse_chunk_v2(payload)
                counts.append(w.size)
        return counts

    w_el = frame_words(res_el.bitstream)
    w_dense = frame_words(res_dense.bitstream)
    assert sum(w_el) < sum(w_dense)
    assert res_el.total_bytes <= res_dense.total_bytes + 12 * len(frames)

    # (a) closed loop for the elided stream
    dec = decode_video(codec_el, res_el.bitstream)
    for i in dec:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(dec[i][k],
                                          res_el.decoded_frames[i][k])

    # (c) cross: dense codec decodes the elided stream and vice versa
    dec_x = decode_video(codec_dense, res_el.bitstream)
    dec_y = decode_video(codec_el, res_dense.bitstream)
    for i in dec_x:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(dec_x[i][k],
                                          res_el.decoded_frames[i][k])
            np.testing.assert_array_equal(dec_y[i][k],
                                          res_dense.decoded_frames[i][k])


@pytest.mark.slow
def test_elided_bucket_zero_black_clip():
    """Fully-zero y latents (flat black input on a trained model) take
    the bucket-0 path: NO y segments in the stream, decoder reconstructs
    zero latents, roundtrip stays bit-exact."""
    import numpy as np

    from aivc_tpu.coding import bitstream as bs
    from aivc_tpu.coding import vrans
    from aivc_tpu.config import CodingConfig
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video
    from aivc_tpu.utils.checkpoint import load_checkpoint

    cfg, params = load_checkpoint("models_ckpt/tiny-toy")
    h, w = 64, 64
    black = [{"y": np.full((h, w), 16, np.uint8),
              "u": np.full((h // 2, w // 2), 128, np.uint8),
              "v": np.full((h // 2, w // 2), 128, np.uint8)}
             for _ in range(3)]
    codec = FrameCodec(cfg, params, h, w)
    coding = CodingConfig(coding_config="RA", gop_size=2, intra_period=2)
    res = encode_video(codec, black, coding)
    dec = decode_video(codec, res.bitstream)
    for i in dec:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(dec[i][k],
                                          res.decoded_frames[i][k])
    # every frame's bitmaps must be empty (bucket 0 on both nets)
    _, gops = bs.unpack_video(res.bitstream)
    for g in gops:
        _, fbs = bs.unpack_gop(g)
        for fb in fbs:
            _, _, _, bms = vrans.parse_chunk_v2(
                bs.unpack_frame(fb)["codecnet_z"])
            assert all(
                vrans.bitmap_channels(bm, cfg.codecnet.nb_ft_y).size == 0
                for bm in bms)
