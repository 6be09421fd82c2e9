"""Channel-major MOFNet maps schedule (config.py:maps_cm).

The channel-major path computes the SAME values as the channel-last
path — the pixel shuffle and the NHWC->planes transpose are pure data
movement, and the map elementwise ops are applied per-plane — so the
two schedules agree to float tolerance, and a codec built with one
schedule refuses streams from the other (sched byte bit 2).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.config import FRAME_B, FRAME_P
from aivc_tpu.models.fullnet import _mofnet_maps, _mofnet_maps_cm
from aivc_tpu.ops.layers import depth_to_space2


@pytest.mark.parametrize("ftype", [FRAME_P, FRAME_B])
@pytest.mark.parametrize("fb", [0.0, 16.0])
def test_maps_cm_matches_channel_last(ftype, fb):
    out24 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 24))
    out6 = depth_to_space2(out24)                      # [2, 8, 16, 6]
    alpha, beta, vp, vn = _mofnet_maps(out6, ftype, fb)
    m = _mofnet_maps_cm(out24, ftype, fb)              # [2, 6, 8, 16]
    assert m.shape == (2, 6, 8, 16)
    ref = jnp.concatenate([alpha, beta, vp, vn], axis=-1)  # [2, 8, 16, 6]
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(m, 1, -1)),
                               np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_warp_packed_accepts_plane_tuple():
    from aivc_tpu.ops.warp import pack_yuv_u32, warp_packed

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 16, 3))
    flow = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16, 2)) * 3.0
    packed = pack_yuv_u32(x)
    a = warp_packed(packed, flow)
    b = warp_packed(packed, (flow[..., 0], flow[..., 1]))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cin", [3, 6, 9])
def test_s2d_convblock_matches_plain(cin):
    """ConvBlock.s2d: same parameters, same sums to float tolerance."""
    from aivc_tpu.ops.layers import ConvBlock

    plain = ConvBlock(16, 5, stride=2, non_linearity="no")
    s2d = ConvBlock(16, 5, stride=2, non_linearity="no", s2d=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 24, cin))
    params = plain.init(jax.random.PRNGKey(1), x)
    y0 = plain.apply(params, x)
    y1 = s2d.apply(params, x)  # identical parameter tree
    assert y0.shape == y1.shape == (2, 8, 12, 16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)


def test_s2d_falls_back_on_odd_input():
    from aivc_tpu.ops.layers import ConvBlock

    plain = ConvBlock(8, 5, stride=2, non_linearity="no")
    s2d = ConvBlock(8, 5, stride=2, non_linearity="no", s2d=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 15, 23, 3))
    params = plain.init(jax.random.PRNGKey(1), x)
    y0 = plain.apply(params, x)
    y1 = s2d.apply(params, x)  # odd padded dims -> plain path
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_codec_maps_cm_closed_loop_and_close_to_legacy():
    """FrameCodec with channel-major maps: closed loop stays bit-exact,
    reconstructions match the legacy schedule to 8-bit tolerance, and
    the legacy codec refuses the cm stream (sched byte)."""
    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    from tests.test_e2e import H, W, _synthetic_frames

    _, params = init_fullnet(TINY, spatial=64)
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)

    prior = os.environ.get("AIVC_MAPS_CM")
    try:
        os.environ["AIVC_MAPS_CM"] = "0"
        legacy = FrameCodec(TINY, params, H, W)
        assert not legacy.cfg.mofnet.maps_cm
        res0 = encode_video(legacy, frames, cfg)
        os.environ["AIVC_MAPS_CM"] = "1"
        cm = FrameCodec(TINY, params, H, W)
        assert cm.cfg.mofnet.maps_cm
        res1 = encode_video(cm, frames, cfg)
        dec1 = decode_video(cm, res1.bitstream)
    finally:
        if prior is None:
            os.environ.pop("AIVC_MAPS_CM", None)
        else:
            os.environ["AIVC_MAPS_CM"] = prior

    with pytest.raises(ValueError, match="compute schedule"):
        decode_video(legacy, res1.bitstream)

    for idx in res1.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                dec1[idx][k], res1.decoded_frames[idx][k],
                err_msg=f"maps_cm closed-loop drift frame {idx} {k}")
    for idx in res0.decoded_frames:
        for k in ("y", "u", "v"):
            a = res0.decoded_frames[idx][k].astype(np.int32)
            b = res1.decoded_frames[idx][k].astype(np.int32)
            assert np.abs(a - b).max() <= 2, (idx, k, np.abs(a - b).max())
