"""Wave-batched coding + IO/debug tooling tests."""

import numpy as np
import pytest

from aivc_tpu.config import FRAME_B, FRAME_I, FRAME_P, CodingConfig
from aivc_tpu.gop import generate_gop_struct
from aivc_tpu.models.zoo import TINY, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import decode_video, encode_video, wave_groups

from tests.test_e2e import H, W, _synthetic_frames


@pytest.fixture(scope="module")
def codec():
    _, params = init_fullnet(TINY, spatial=64)
    return FrameCodec(TINY, params, H, W)


def test_wave_groups_cover_all_frames_once():
    gop = generate_gop_struct("1_GOP_16")
    groups = wave_groups(gop, max_batch=4)
    seen = []
    for ftype, specs in groups:
        for s in specs:
            assert s.frame_type == ftype
            seen.append(s.idx)
        assert len(specs) <= 4
    assert sorted(seen) == sorted(f.idx for f in gop.frames)
    # GOP16 waves [1(I),1(P),1,2,4,8] with cap 4 -> group sizes
    assert [len(s) for _, s in groups] == [1, 1, 1, 2, 4, 4, 4]


@pytest.mark.slow
def test_wave_batched_roundtrip_bit_exact(codec):
    frames = _synthetic_frames(9)
    cfg = CodingConfig(coding_config="RA", gop_size=8, intra_period=8)
    res = encode_video(codec, frames, cfg, wave_batch=4)
    decoded = decode_video(codec, res.bitstream, wave_batch=4)
    assert len(decoded) == 9
    for idx in decoded:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                decoded[idx][k], res.decoded_frames[idx][k],
                err_msg=f"wave-batched drift at frame {idx} plane {k}")


@pytest.mark.slow
def test_wave_batch_rides_in_the_header(codec):
    """decode_video needs only the bitstream: the encoder's wave_batch is
    recorded in the video header and honoured by a FRESH codec with no
    out-of-band arguments (closed-loop property, reference:
    src/real_life/decode.py:44-155)."""
    frames = _synthetic_frames(9)
    cfg = CodingConfig(coding_config="RA", gop_size=8, intra_period=8)
    res = encode_video(codec, frames, cfg, wave_batch=8)

    _, params = init_fullnet(TINY, spatial=64)
    fresh = FrameCodec(TINY, params, H, W)
    decoded = decode_video(fresh, res.bitstream)  # no wave_batch given
    for idx in decoded:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                decoded[idx][k], res.decoded_frames[idx][k],
                err_msg=f"header-wave_batch drift at frame {idx} plane {k}")

    # A mismatched explicit wave_batch must refuse, not silently drift.
    with pytest.raises(ValueError, match="wave_batch"):
        decode_video(fresh, res.bitstream, wave_batch=2)


@pytest.mark.slow
def test_debug_mode_self_checks(capsys):
    _, params = init_fullnet(TINY, spatial=64)
    codec = FrameCodec(TINY, params, H, W, debug=True)
    frames = _synthetic_frames(2)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)
    res = encode_video(codec, frames, cfg)
    out = capsys.readouterr().out
    assert "lossless Ok!" in out
    assert "analytic" in out


def test_md5_manifest_roundtrip(tmp_path, codec):
    from aivc_tpu.utils.debug import check_md5_manifest, write_md5_manifest

    frames = _synthetic_frames(2)
    res = encode_video(codec, frames, CodingConfig(coding_config="AI"))
    manifest = tmp_path / "m.json"
    write_md5_manifest(res.decoded_frames, manifest)
    decoded = decode_video(codec, res.bitstream)
    assert check_md5_manifest(decoded, manifest, verbose=False)
    # Tamper: flip a pixel
    bad = dict(decoded)
    planes = {k: v.copy() for k, v in bad[0].planes.items()}
    planes["y"][0, 0] ^= 1
    from aivc_tpu.pipeline.codec import DecodedFrame

    bad[0] = DecodedFrame.from_host(planes, bad[0].ref)
    assert not check_md5_manifest(bad, manifest, verbose=False)


def test_yuv_png_roundtrip(tmp_path):
    from aivc_tpu.io.convert import png_to_yuv, yuv_to_png
    from aivc_tpu.io.yuv import YuvReader

    rng = np.random.default_rng(0)
    src = tmp_path / "t_32x16_30_420.yuv"
    data = rng.integers(0, 256, size=3 * (32 * 16 + 2 * 16 * 8) // 2 * 2,
                        dtype=np.uint8)
    # 3 frames of 32x16
    src.write_bytes(data[: 3 * (32 * 16 + 2 * 16 * 8)].tobytes())
    n = yuv_to_png(src, tmp_path / "pngs", check_lossless=True)
    assert n == 3
    png_to_yuv(tmp_path / "pngs", tmp_path / "back.yuv", n)
    a = YuvReader(src, 32, 16)
    b = YuvReader(tmp_path / "back.yuv", 32, 16)
    for i in range(3):
        fa, fb = a.read_frame(i), b.read_frame(i)
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(fa[k], fb[k])


def test_all_intra_cross_gop_batching(codec):
    """AI frames batch across GOP boundaries; roundtrip stays bit-exact."""
    frames = _synthetic_frames(7)
    cfg = CodingConfig(coding_config="AI")
    seq = encode_video(codec, frames, cfg)                 # sequential
    bat = encode_video(codec, frames, cfg, wave_batch=4)   # batched
    dec = decode_video(codec, bat.bitstream, wave_batch=4)
    assert len(dec) == 7
    for idx in dec:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                dec[idx][k], bat.decoded_frames[idx][k],
                err_msg=f"AI batched drift frame {idx} {k}")
    # Batched and sequential bitstreams have equal total size structure
    assert abs(bat.total_bytes - seq.total_bytes) < 64
