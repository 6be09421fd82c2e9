"""In-band per-latent md5 debug chunks (VERDICT r3 item 8).

Under --bitstream_debug the encoder embeds a 16-byte md5 of each decoded
latent tensor in the frame container (reference embeds the same,
src/real_life/bitstream.py:229-234,419-421,488-499); the decoder
recomputes and NAMES the exact latent that drifted.
"""

import numpy as np
import pytest

import aivc_tpu.coding.bitstream as bs
from aivc_tpu.config import CodingConfig
from aivc_tpu.models.zoo import TINY, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import decode_video, encode_video

from tests.test_e2e import H, W, _synthetic_frames


def test_pack_unpack_digest_trailer_roundtrip():
    chunks = {"mofnet_z": b"abc", "mofnet_y": b"", "codecnet_z": b"xy",
              "codecnet_y": b"q" * 7}
    digs = {"codecnet_y": bytes(range(16)), "mofnet_z": b"\xff" * 16}
    fb = bs.pack_frame(chunks, digs)
    back = bs.unpack_frame(fb)
    assert back["__digests__"] == digs
    for name in bs.CHUNK_ORDER:
        assert back[name] == chunks[name]
    # No trailer -> no digest key, and trailing garbage still raises.
    assert "__digests__" not in bs.unpack_frame(bs.pack_frame(chunks))
    with pytest.raises(ValueError):
        bs.unpack_frame(bs.pack_frame(chunks) + b"\x00")


def test_latent_md5_dtype_invariant():
    a16 = np.arange(-8, 8, dtype=np.int16).reshape(4, 4)
    a32 = a16.astype(np.int32)
    af = a16.astype(np.float32)
    assert bs.latent_md5(a16) == bs.latent_md5(a32) == bs.latent_md5(af)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["host", "device"])
def test_debug_stream_carries_digests_and_decodes(backend):
    _, params = init_fullnet(TINY, spatial=64)
    codec = FrameCodec(TINY, params, H, W, debug=True,
                       entropy_backend=backend)
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)
    res = encode_video(codec, frames, cfg)

    # Every frame container carries the trailer with the right key set.
    _, gops = bs.unpack_video(res.bitstream)
    _, fbs = bs.unpack_gop(gops[0])
    first = bs.unpack_frame(fbs[0])          # I-frame
    assert set(first["__digests__"]) == {"codecnet_z", "codecnet_y"}
    second = bs.unpack_frame(fbs[1])         # P-frame
    assert set(second["__digests__"]) == {
        "mofnet_z", "mofnet_y", "codecnet_z", "codecnet_y"}

    # A clean decoder (no debug flag) verifies them silently.
    clean = FrameCodec(TINY, params, H, W, entropy_backend=backend)
    dec = decode_video(clean, res.bitstream)
    for idx in dec:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                dec[idx][k], res.decoded_frames[idx][k])


@pytest.mark.slow
@pytest.mark.parametrize("chunk", ["mofnet_y", "codecnet_z"])
def test_corrupt_latent_is_named_at_decode(chunk):
    """Corrupting one latent's in-band digest makes the decoder raise an
    error NAMING that chunk (the digest stands in for the latent: the
    comparison fires identically whichever side of it rotted)."""
    _, params = init_fullnet(TINY, spatial=64)
    codec = FrameCodec(TINY, params, H, W, debug=True,
                       entropy_backend="host")
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)
    res = encode_video(codec, frames, cfg)

    header, gops = bs.unpack_video(res.bitstream)
    gh, fbs = bs.unpack_gop(gops[0])
    target = bs.unpack_frame(fbs[1])  # P-frame: has all four latents
    digs = dict(target.pop("__digests__"))
    digs[chunk] = bytes(16)  # wrong digest for this latent
    fbs[1] = bs.pack_frame(target, digs)
    tampered = bs.pack_video(header, [bs.pack_gop(gh, fbs)])

    clean = FrameCodec(TINY, params, H, W, entropy_backend="host")
    with pytest.raises(ValueError, match=chunk):
        decode_video(clean, tampered)


def test_video_header_sched_roundtrip():
    h = bs.VideoHeader(h_x=64, w_x=48, h_y=4, w_y=3, h_z=1, w_z=1,
                       nb_gop=1, idx_first_frame=0, idx_last_frame=4,
                       backend=1, wave_batch=2, ac_log2=7, sched=3)
    back = bs.VideoHeader.unpack(h.pack())
    assert back == h
    assert len(h.pack()) == bs.VideoHeader.SIZE
