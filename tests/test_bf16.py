"""bfloat16 transform variant: runs, stays finite, roundtrips bit-exact."""

import numpy as np
import pytest

from aivc_tpu.config import CodingConfig
from aivc_tpu.models.zoo import get_model, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import decode_video, encode_video

from tests.test_e2e import H, W, _synthetic_frames


@pytest.mark.slow
def test_bf16_roundtrip_bit_exact():
    cfg, _ = get_model("tpu-aivc-tiny-bf16")
    _, params = init_fullnet(cfg, spatial=64)
    codec = FrameCodec(cfg, params, H, W)
    frames = _synthetic_frames(3)
    res = encode_video(codec, frames,
                       CodingConfig(coding_config="LDP", intra_period=2))
    decoded = decode_video(codec, res.bitstream)
    assert len(decoded) == 3
    for idx in decoded:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                decoded[idx][k], res.decoded_frames[idx][k],
                err_msg=f"bf16 drift at frame {idx} plane {k}")


@pytest.mark.slow
def test_bf16_latents_are_float32():
    import jax
    import jax.numpy as jnp

    from aivc_tpu.config import FRAME_P
    from aivc_tpu.models.fullnet import FullNet

    cfg, _ = get_model("tpu-aivc-tiny-bf16")
    model, params = init_fullnet(cfg, spatial=64)
    x = jnp.zeros((1, 64, 64, 3))
    y, z_q = model.apply(params, x, x, x, 0.0, FRAME_P,
                         method=FullNet.mof_analyze)
    assert y.dtype == jnp.float32
    assert z_q.dtype == jnp.float32
    mu, sigma = model.apply(params, z_q, method=FullNet.mofnet_hyper)
    assert mu.dtype == jnp.float32 and sigma.dtype == jnp.float32
