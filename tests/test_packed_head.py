"""Lane-packed synthesis head (LanePackedConv) correctness.

The packed formulation is the same math as the plain conv with a
different accumulation order, so outputs match to float tolerance and
the parameter tree is IDENTICAL (checkpoints load into either path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.ops.layers import UpBlock, head_lane_pack_auto


def test_head_lane_pack_auto():
    assert head_lane_pack_auto(6) == 4    # 24ch head -> 96 lanes
    assert head_lane_pack_auto(3) == 8    # 12ch head -> 96 lanes
    assert head_lane_pack_auto(128) == 1  # big heads: off


@pytest.mark.parametrize("out_ft,G", [(6, 4), (3, 8)])
def test_packed_upblock_matches_plain(out_ft, G):
    plain = UpBlock(out_ft, 5, non_linearity="no")
    packed = UpBlock(out_ft, 5, non_linearity="no", lane_pack=G)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32, 16))
    params = plain.init(jax.random.PRNGKey(1), x)
    # identical parameter tree -> the packed module accepts it verbatim
    y0 = plain.apply(params, x)
    y1 = packed.apply(params, x)
    assert y0.shape == y1.shape == (2, 16, 64, out_ft)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)


def test_packed_falls_back_when_width_indivisible():
    packed = UpBlock(3, 5, non_linearity="no", lane_pack=8)
    plain = UpBlock(3, 5, non_linearity="no")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 12, 16))  # 12 % 8
    params = plain.init(jax.random.PRNGKey(1), x)
    y0 = plain.apply(params, x)
    y1 = packed.apply(params, x)  # falls back to the plain conv
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_codec_packed_head_closed_loop_and_close_to_plain():
    """FrameCodec with the packed head: closed loop stays bit-exact and
    the reconstruction stays close to the plain-conv codec's."""
    import os

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    from tests.test_e2e import H, W, _synthetic_frames

    _, params = init_fullnet(TINY, spatial=64)
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)

    prior = os.environ.get("AIVC_PACKED_HEAD")
    try:
        os.environ["AIVC_PACKED_HEAD"] = "0"
        plain = FrameCodec(TINY, params, H, W)
        res0 = encode_video(plain, frames, cfg)
        os.environ["AIVC_PACKED_HEAD"] = "1"
        packed = FrameCodec(TINY, params, H, W)
        assert packed.cfg.codecnet.head_lane_pack > 1
        res1 = encode_video(packed, frames, cfg)
        dec1 = decode_video(packed, res1.bitstream)
    finally:
        if prior is None:
            os.environ.pop("AIVC_PACKED_HEAD", None)
        else:
            os.environ["AIVC_PACKED_HEAD"] = prior

    # Schedule mismatch: the plain codec must REFUSE the packed stream
    # (different float sum order would silently drift through the GOP
    # reference chain) — the header's sched byte makes it loud.
    with pytest.raises(ValueError, match="compute schedule"):
        decode_video(plain, res1.bitstream)

    # Closed loop: the packed decoder reproduces the packed encoder
    # bit-exactly (the contract the pipeline relies on).
    for idx in res1.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                dec1[idx][k], res1.decoded_frames[idx][k],
                err_msg=f"packed closed-loop drift frame {idx} {k}")
    # Cross-codec: same math to float tolerance -> reconstructions agree
    # within a couple of 8-bit levels (sum-order differences only).
    for idx in res0.decoded_frames:
        for k in ("y", "u", "v"):
            a = res0.decoded_frames[idx][k].astype(np.int32)
            b = res1.decoded_frames[idx][k].astype(np.int32)
            assert np.abs(a - b).max() <= 2, (idx, k, np.abs(a - b).max())
