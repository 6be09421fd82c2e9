"""Crash-salvageable per-GOP encodes + the analytic-rate audit."""

import numpy as np
import pytest

from aivc_tpu.config import CodingConfig
from aivc_tpu.models.zoo import TINY, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
import aivc_tpu.pipeline.video as video_mod
from aivc_tpu.pipeline.video import decode_video, encode_video

from tests.test_e2e import H, W, _synthetic_frames


@pytest.fixture(scope="module")
def codec():
    _, params = init_fullnet(TINY, spatial=64)
    return FrameCodec(TINY, params, H, W)


CFG = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)


@pytest.mark.slow
def test_stream_dir_chunks_and_identical_bitstream(tmp_path, codec):
    frames = _synthetic_frames(9)  # 2 GOPs of 5 frames (last one padded)
    plain = encode_video(codec, frames, CFG, wave_batch=2)
    stored = encode_video(codec, frames, CFG, wave_batch=2,
                          stream_dir=str(tmp_path / "s"))
    assert stored.bitstream == plain.bitstream
    chunks = sorted(p.name for p in (tmp_path / "s").glob("gop_*.bin"))
    assert chunks == ["gop_00000.bin", "gop_00001.bin"]


def test_resume_skips_finished_gops(tmp_path, codec, monkeypatch):
    frames = _synthetic_frames(9)
    sdir = tmp_path / "s"
    full = encode_video(codec, frames, CFG, wave_batch=2,
                        stream_dir=str(sdir))

    # Simulate a crash after GOP 0: drop the later chunk.
    for g in (1,):
        (sdir / f"gop_{g:05d}.bin").unlink()
        (sdir / f"gop_{g:05d}.json").unlink()

    encoded_gops = []
    real_encode_gop = video_mod.encode_gop

    def spy(codec_, gop, gop_frames, idx_rate, first_idx, results, **kw):
        encoded_gops.append(first_idx)
        return real_encode_gop(codec_, gop, gop_frames, idx_rate,
                               first_idx, results, **kw)

    monkeypatch.setattr(video_mod, "encode_gop", spy)
    resumed = encode_video(codec, frames, CFG, wave_batch=2,
                           stream_dir=str(sdir))
    assert encoded_gops == [5]  # GOP 0 came from disk
    assert resumed.bitstream == full.bitstream
    # Decoded frames of the salvaged GOP are rebuilt bit-exactly.
    for idx in full.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(resumed.decoded_frames[idx][k],
                                          full.decoded_frames[idx][k])
    # Frame stats reloaded for the salvaged GOP too.
    assert len(resumed.frame_results) == len(full.frame_results)


def test_resume_refuses_mismatched_settings(tmp_path, codec):
    frames = _synthetic_frames(5)
    sdir = str(tmp_path / "s")
    encode_video(codec, frames, CFG, wave_batch=2, stream_dir=sdir)
    with pytest.raises(ValueError, match="different encode"):
        encode_video(codec, frames, CFG, wave_batch=1, stream_dir=sdir)


@pytest.mark.slow
def test_rate_audit_attaches_analytic_bits():
    _, params = init_fullnet(TINY, spatial=64)
    audit_codec = FrameCodec(TINY, params, H, W, audit=True)
    frames = _synthetic_frames(5)
    res = encode_video(audit_codec, frames, CFG, wave_batch=2)
    analytic = sum(fr.analytic_bits for fr in res.frame_results)
    real = sum(fr.bytes for fr in res.frame_results) * 8.0
    assert analytic > 0
    # Real payload always >= analytic minus rounding slack; container
    # overhead (state flush, headers, padding) keeps it above.
    assert real > 0.9 * analytic
    # The audited stream itself stays decodable and bit-exact.
    dec = decode_video(audit_codec, res.bitstream)
    for idx in dec:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(dec[idx][k],
                                          res.decoded_frames[idx][k])


def test_ai_fast_path_stream_dir_resume(tmp_path, codec):
    """All-Intra batched encodes salvage per-frame chunks too, and the
    resumed batch re-decodes at the encoder's grouping."""
    frames = _synthetic_frames(6)
    ai = CodingConfig(coding_config="AI")
    sdir = tmp_path / "ai"
    full = encode_video(codec, frames, ai, wave_batch=2,
                        stream_dir=str(sdir))
    assert sorted(p.name for p in sdir.glob("gop_*.bin")) == [
        f"gop_{i:05d}.bin" for i in range(6)]

    # Crash: lose the last batch (frames 4, 5).
    for i in (4, 5):
        (sdir / f"gop_{i:05d}.bin").unlink()
        (sdir / f"gop_{i:05d}.json").unlink()
    resumed = encode_video(codec, frames, ai, wave_batch=2,
                           stream_dir=str(sdir))
    assert resumed.bitstream == full.bitstream
    for idx in full.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(resumed.decoded_frames[idx][k],
                                          full.decoded_frames[idx][k])
