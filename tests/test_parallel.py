"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.parallel.mesh import (
    frame_sharding,
    make_mesh,
    shard_params,
    stacked_frame_sharding,
)


def test_mesh_shapes():
    mesh = make_mesh(8, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh1 = make_mesh(8, spatial=1)
    assert mesh1.shape == {"data": 8, "spatial": 1}
    with pytest.raises(ValueError):
        make_mesh(6, spatial=4)


def test_sharded_warp_matches_single_device():
    from aivc_tpu.ops.warp import warp

    mesh = make_mesh(8, spatial=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    flow = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 2))
    ref = jax.jit(warp)(x, flow)
    with mesh:
        xs = jax.device_put(x, frame_sharding(mesh))
        fs = jax.device_put(flow, frame_sharding(mesh))
        out = jax.jit(warp)(xs, fs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_runs():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_codec_matches_unsharded_bit_exact():
    """Spatially-sharded FrameCodec (GSPMD halo exchange) must produce the
    same bitstream and frames as the single-device codec."""
    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    from tests.test_e2e import H, W, _synthetic_frames

    _, params = init_fullnet(TINY, spatial=64)
    frames = _synthetic_frames(3)
    cfg = CodingConfig(coding_config="LDP", intra_period=2)

    base = FrameCodec(TINY, params, H, W)
    res0 = encode_video(base, frames, cfg)

    mesh = make_mesh(8, spatial=2)
    with mesh:
        sharded = FrameCodec(TINY, params, H, W, mesh=mesh)
        res1 = encode_video(sharded, frames, cfg)
        dec1 = decode_video(sharded, res1.bitstream)

    for idx in res0.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                res1.decoded_frames[idx][k], res0.decoded_frames[idx][k],
                err_msg=f"sharded encode drift frame {idx} {k}")
            np.testing.assert_array_equal(
                dec1[idx][k], res0.decoded_frames[idx][k],
                err_msg=f"sharded decode drift frame {idx} {k}")


@pytest.mark.slow
def test_combined_data_spatial_mesh_bit_exact():
    """Wave batches laid over a combined ('data' x 'spatial') mesh —
    batch over data, rows over spatial — stay bit-exact with the
    single-device codec (SURVEY.md §2.5: temporal-wave + tile sharding)."""
    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    from tests.test_e2e import H, W, _synthetic_frames

    _, params = init_fullnet(TINY, spatial=64)
    frames = _synthetic_frames(5)
    cfg = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)

    base = FrameCodec(TINY, params, H, W)
    res0 = encode_video(base, frames, cfg, wave_batch=2)

    mesh = make_mesh(4, spatial=2)  # data=2 x spatial=2
    with mesh:
        sharded = FrameCodec(TINY, params, H, W, mesh=mesh)
        res1 = encode_video(sharded, frames, cfg, wave_batch=2)
        dec1 = decode_video(sharded, res1.bitstream)

    assert res1.bitstream == res0.bitstream
    for idx in res0.decoded_frames:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(
                dec1[idx][k], res0.decoded_frames[idx][k],
                err_msg=f"data x spatial drift frame {idx} {k}")
