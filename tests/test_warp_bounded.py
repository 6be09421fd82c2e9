"""Windowed bounded-flow warp kernel vs the gather-based oracle.

warp_bounded_pallas evaluates the same gather indices and unpack + FMA
expression tree as warp_packed whenever |flow| <= fb
(ops/warp_pallas.py).  Separately compiled programs may contract
multiply-adds differently (FMA), so values can differ in the LAST ULP —
the codec stays bit-exact because encoder and decoder share ONE
compiled motion program, and the video header pins the warp engine so
cross-machine decode cannot silently mix paths.  Checked in interpreter
mode on CPU over random bounded flows, border-saturating flows, and
non-128-multiple widths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aivc_tpu.ops.warp import pack_yuv_u32, warp_packed
from aivc_tpu.ops.warp_pallas import FB_MAX, warp_bounded_pallas


def _setup(b, h, w, fb, seed, extreme=False):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    x = jnp.round(jax.random.uniform(k1, (b, h, w, 3)) * 255.0) / 255.0
    if extreme:
        # flows that push every sample to the border clamp
        flow = jnp.where(
            jax.random.uniform(k2, (b, h, w, 2)) < 0.5, -float(fb),
            float(fb))
    else:
        flow = jax.random.uniform(k2, (b, h, w, 2), minval=-fb, maxval=fb)
    return pack_yuv_u32(x), flow


@pytest.mark.parametrize("shape,fb", [((2, 32, 128), 8),
                                      ((1, 64, 256), 30),
                                      ((1, 32, 192), 12)])
def test_bounded_matches_packed_bitexact(shape, fb):
    b, h, w = shape
    packed, flow = _setup(b, h, w, fb, seed=h + w)
    ref = warp_packed(packed, flow)
    out = warp_bounded_pallas(packed, flow, fb=fb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=3e-7)


def test_bounded_border_saturation_bitexact():
    packed, flow = _setup(1, 32, 128, 16, seed=5, extreme=True)
    ref = warp_packed(packed, flow)
    out = warp_bounded_pallas(packed, flow, fb=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=3e-7)


def test_bounded_rejects_oversized_bound():
    packed, flow = _setup(1, 32, 128, 8, seed=1)
    with pytest.raises(ValueError):
        warp_bounded_pallas(packed, flow, fb=FB_MAX + 1, interpret=True)


@pytest.mark.slow
def test_flow_bound_model_roundtrip():
    """End-to-end bit-exact enc/dec with a flow_bound + gdn_clamp model
    (the healthy-motion parameterization) on the CPU packed-warp path."""
    import dataclasses

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    cfg = dataclasses.replace(
        TINY, name="tpu-aivc-tiny-fb", flow_bound=16.0,
        mofnet=dataclasses.replace(TINY.mofnet, gdn_clamp=16.0),
        codecnet=dataclasses.replace(TINY.codecnet, gdn_clamp=16.0))
    _, params = init_fullnet(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    frames = []
    h, w = 48, 64
    base = rng.integers(0, 255, (h + 8, w + 8), np.uint8)
    for t in range(5):
        y = base[t:t + h, t:t + w]  # translating crop: real motion
        u = y[::2, ::2]
        frames.append({"y": y, "u": u, "v": 255 - u})
    codec = FrameCodec(cfg, params, h, w)
    assert codec.warp_engine == "packed"  # CPU: kernel is TPU-gated
    res = encode_video(codec, frames, CodingConfig(
        coding_config="RA", gop_size=4, intra_period=4))
    dec = decode_video(codec, res.bitstream)
    for i, d in res.decoded_frames.items():
        for pl_ in ("y", "u", "v"):
            np.testing.assert_array_equal(d[pl_], dec[i][pl_])
