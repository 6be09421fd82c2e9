"""Model-layer tests: shapes, rates, init coverage, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.config import FRAME_B, FRAME_I, FRAME_P
from aivc_tpu.gop import generate_gop_struct
from aivc_tpu.models.fullnet import FullNet
from aivc_tpu.models.zoo import TINY, get_model, init_fullnet
from aivc_tpu.train.trainer import make_optimizer, make_train_step

H = W = 64


@pytest.fixture(scope="module")
def model_and_params():
    return init_fullnet(TINY, spatial=64)


def test_zoo_ladder():
    for i in range(1, 8):
        cfg, idx = get_model(f"tpu-msssim-{i}")
        assert idx == float(i - 1)
    with pytest.raises(KeyError):
        get_model("nope")


def test_init_covers_all_gain_matrices(model_and_params):
    # CodecNet codes I, P and B frames -> three gain matrices; MOFNet never
    # codes I-frames (they skip motion entirely), so it only has P and B.
    _, params = model_and_params
    expected = {"mofnet": ("gain_P", "gain_B"),
                "codecnet": ("gain_I", "gain_P", "gain_B")}
    for net, gains in expected.items():
        sub = params["params"][net]
        net_cfg = TINY.mofnet if net == "mofnet" else TINY.codecnet
        for gm in gains:
            assert gm in sub, f"{net}.{gm} missing from init"
            assert sub[gm]["enc_gain"].shape == (net_cfg.n_rates,
                                                 net_cfg.nb_ft_y)


@pytest.mark.parametrize("ftype", [FRAME_I, FRAME_P, FRAME_B])
def test_forward_frame_shapes_and_rates(model_and_params, ftype):
    model, params = model_and_params
    frame = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    prev = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    nxt = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3))
    x_hat, aux = model.apply(params, frame, prev, nxt, 0.0, ftype,
                             method=FullNet.forward_frame)
    assert x_hat.shape == (1, H, W, 3)
    assert np.isfinite(np.asarray(x_hat)).all()
    cod = aux["cod"]
    assert cod["rate_y"].shape == (1, H // 16, W // 16, TINY.codecnet.nb_ft_y)
    assert float(cod["rate_y"].sum()) >= 0
    if ftype == FRAME_I:
        assert aux["mof"] is None
        np.testing.assert_allclose(np.asarray(aux["alpha"]), 1.0)
    else:
        assert aux["mof"] is not None
        a = np.asarray(aux["alpha"])
        assert (a >= 0).all() and (a <= 1).all()
        b = np.asarray(aux["beta"])
        if ftype == FRAME_P:
            np.testing.assert_allclose(b, 1.0)


def test_p_frame_latents_are_integers_eval(model_and_params):
    model, params = model_and_params
    frame = jax.random.uniform(jax.random.PRNGKey(4), (1, H, W, 3))
    _, aux = model.apply(params, frame, frame, frame, 0.0, FRAME_P,
                         method=FullNet.forward_frame)
    for lat in (aux["cod"], aux["mof"]):
        y = np.asarray(lat["y_cq"])
        z = np.asarray(lat["z_q"])
        np.testing.assert_array_equal(y, np.round(y))
        np.testing.assert_array_equal(z, np.round(z))
        assert np.abs(y).max() <= 256 and np.abs(z).max() <= 256


@pytest.mark.slow
def test_train_step_decreases_nothing_nan():
    model, params = init_fullnet(TINY, spatial=64)
    gop = generate_gop_struct("1_GOP_2")
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    step = make_train_step(model, TINY, gop, opt, dist_loss="mse")
    frames = jax.random.uniform(jax.random.PRNGKey(0), (3, 1, H, W, 3))
    p2, opt_state, logs = step(params, opt_state, frames, 0, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["grad_norm"]))
    assert float(logs["grad_norm"]) > 0
    # Params actually changed
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf1 = jax.tree_util.tree_leaves(p2)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


@pytest.mark.slow
def test_train_step_non_multiple_of_z_downscale():
    """Crop-to-y-grid regression: training sizes that are not multiples of
    the z downscale (64) overshoot the hyper-decoder output (the reference
    crops the same way, decode.py:844-856)."""
    model, params = init_fullnet(TINY, spatial=64)
    gop = generate_gop_struct("1_GOP_2")
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    step = make_train_step(model, TINY, gop, opt, dist_loss="mse")
    # 80 = 5 * 16 y-grid but 80 / 64 rounds up to a 2-cell z grid whose
    # upsampled mu/sigma (8 cells) must crop back to 5.
    frames = jax.random.uniform(jax.random.PRNGKey(0), (3, 1, 80, 80, 3))
    _, _, logs = step(params, opt_state, frames, 0, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, model_and_params):
    from aivc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    _, params = model_and_params
    save_checkpoint(tmp_path / "ck", TINY, params)
    cfg2, params2 = load_checkpoint(tmp_path / "ck")
    assert cfg2 == TINY
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_mixture_ec_mode_roundtrip_bit_exact():
    """A K=2 mixture config (ec_mode 'two') codes end-to-end: the
    hyper-synthesis carries (3K-1)*C channels, coding consumes component
    [0] (reference: decode.py:853-856), and the closed loop stays
    bit-exact."""
    from dataclasses import replace

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video
    from tests.test_e2e import H, W, _synthetic_frames

    cfg = replace(
        TINY, name="tiny-mix2",
        mofnet=replace(TINY.mofnet, ec_mode="two"),
        codecnet=replace(TINY.codecnet, ec_mode="two"))
    assert cfg.codecnet.sigma_cond_c == 5 * cfg.codecnet.nb_ft_y
    _, params = init_fullnet(cfg, spatial=64)
    codec = FrameCodec(cfg, params, H, W)
    frames = _synthetic_frames(3)
    res = encode_video(codec, frames, CodingConfig(
        coding_config="RA", gop_size=2, intra_period=2))
    decoded = decode_video(codec, res.bitstream)
    for idx in decoded:
        for k in ("y", "u", "v"):
            np.testing.assert_array_equal(decoded[idx][k],
                                          res.decoded_frames[idx][k])


@pytest.mark.slow
def test_mixture_train_step_finite():
    """RD training runs with the mixture rate model in the loss."""
    from dataclasses import replace

    cfg = replace(
        TINY, name="tiny-mix2",
        mofnet=replace(TINY.mofnet, ec_mode="two"),
        codecnet=replace(TINY.codecnet, ec_mode="three"))
    model, params = init_fullnet(cfg, spatial=32)
    gop = generate_gop_struct("1_GOP_2")
    opt = make_optimizer(1e-4)
    step = make_train_step(model, cfg, gop, opt)
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (3, 1, 32, 32, 3)),
        jnp.float32)
    params, _, logs = step(params, opt.init(params), frames, 0,
                           jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["rate_bpp"]) > 0


@pytest.mark.slow
def test_train_step_grad_accum(model_and_params):
    """accum=2 runs one optimizer update from the f32 mean of two
    microbatch gradients (activation memory at microbatch size); the
    logs carry the valid-microbatch count and the step stays healthy on
    ordinary data."""
    model, params = model_and_params
    gop = generate_gop_struct("1_GOP_2")
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    step = make_train_step(model, TINY, gop, opt, dist_loss="mse", accum=2)
    frames = jax.random.uniform(jax.random.PRNGKey(0), (3, 4, H, W, 3))
    p2, opt_state, logs = step(params, opt_state, frames, 0,
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["grad_norm"]) > 0
    assert float(logs["micro_skipped"]) == 0.0
    assert float(logs["step_skipped"]) == 0.0
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf1 = jax.tree_util.tree_leaves(p2)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
