"""Coverage for utilities and training-loss semantics."""

import numpy as np
import pytest


def test_yuv_geometry_parsing(tmp_path):
    from aivc_tpu.io.yuv import YuvReader, parse_geometry

    w, h, fps = parse_geometry("BlowingBubbles_416x240_50_420.yuv")
    assert (w, h, fps) == (416, 240, 50)
    with pytest.raises(ValueError):
        parse_geometry("no_geometry_here.yuv")

    # Odd dimensions: UV planes are ceil(x/2)
    p = tmp_path / "odd_31x17_30_420.yuv"
    frame_bytes = 31 * 17 + 2 * 16 * 9
    p.write_bytes(bytes(frame_bytes * 2))
    r = YuvReader(p)
    assert r.n_frames == 2
    f = r.read_frame(1)
    assert f["y"].shape == (17, 31)
    assert f["u"].shape == (9, 16)


@pytest.mark.slow
def test_loss_excludes_padded_frame_distortion():
    """Padded frames contribute rate but not distortion
    (reference: loss_function.py:292-311)."""
    import jax
    import jax.numpy as jnp

    from aivc_tpu.gop import generate_gop_struct
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.train.loss import gop_rd_loss

    model, params = init_fullnet(TINY, spatial=64)
    gop = generate_gop_struct("LDP_2")
    rng = jax.random.PRNGKey(0)
    frames = [jax.random.uniform(jax.random.PRNGKey(i), (1, 64, 64, 3))
              for i in range(3)]

    _, logs_all = gop_rd_loss(model, params, frames, gop, 0, rng,
                              l_codec=0.01, l_mof=0.01, dist_loss="mse",
                              nb_pad_frame=0, training=False)
    _, logs_pad = gop_rd_loss(model, params, frames, gop, 0, rng,
                              l_codec=0.01, l_mof=0.01, dist_loss="mse",
                              nb_pad_frame=1, training=False)
    # Rate average unchanged; distortion normalisation differs
    np.testing.assert_allclose(float(logs_all["rate_bpp"]),
                               float(logs_pad["rate_bpp"]), rtol=1e-6)
    assert not np.isclose(float(logs_all["mse"]), float(logs_pad["mse"]))


@pytest.mark.slow
def test_loss_flow_telemetry_and_penalty():
    """flow_mag/flow_max expose motion liveness (the round-3 explosion
    was invisible in logs), and flow_penalty adds exactly the L1 of the
    pre-map synthesis logits to the loss."""
    import jax

    from aivc_tpu.gop import generate_gop_struct
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.train.loss import gop_rd_loss

    model, params = init_fullnet(TINY, spatial=64)
    gop = generate_gop_struct("LDP_2")
    rng = jax.random.PRNGKey(0)
    frames = [jax.random.uniform(jax.random.PRNGKey(i), (1, 64, 64, 3))
              for i in range(3)]

    l0, logs0 = gop_rd_loss(model, params, frames, gop, 0, rng,
                            l_codec=0.01, l_mof=0.01, dist_loss="mse",
                            training=False)
    assert float(logs0["flow_mag"]) >= 0.0
    assert float(logs0["flow_max"]) >= float(logs0["flow_mag"])
    w = 0.125
    l1, logs1 = gop_rd_loss(model, params, frames, gop, 0, rng,
                            l_codec=0.01, l_mof=0.01, dist_loss="mse",
                            training=False, flow_penalty=w)
    # penalty strictly increases the loss and scales linearly with w
    assert float(l1) > float(l0)
    l2, _ = gop_rd_loss(model, params, frames, gop, 0, rng,
                        l_codec=0.01, l_mof=0.01, dist_loss="mse",
                        training=False, flow_penalty=2 * w)
    np.testing.assert_allclose(float(l2) - float(l1), float(l1) - float(l0),
                               rtol=1e-3)


def test_stage_timer_report():
    import time

    from aivc_tpu.utils.logging import StageTimer

    t = StageTimer()
    with t("a"):
        time.sleep(0.01)
    with t("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "b:" in rep


def test_print_log_msg_format(capsys):
    from aivc_tpu.utils.logging import print_log_msg

    print_log_msg("INFO", "test_fn", "var", 42)
    out = capsys.readouterr().out
    assert out.startswith("[INFO")
    assert "test_fn" in out and "42" in out


def test_frame_result_logger(tmp_path):
    import json

    from aivc_tpu.pipeline.video import FrameResult
    from aivc_tpu.utils.logging import FrameResultLogger

    logger = FrameResultLogger(tmp_path)
    logger.log(FrameResult(idx=0, frame_type=0, bytes=100, mode_bytes=0,
                           codec_bytes=100, alpha_mean=1.0, beta_mean=1.0,
                           bpp=0.5))
    logger.close()
    rows = [json.loads(l) for l in (tmp_path / "detailed.jsonl").open()]
    assert rows[0]["bytes"] == 100
    assert (tmp_path / "detailed.txt").read_text().count("\n") == 2


def test_gop_curriculum():
    from aivc_tpu.train.trainer import gop_curriculum

    stages = ["1_GOP_2", "1_GOP_4", "2_GOP_4"]
    epochs = [10, 20, 30]
    assert gop_curriculum(0, epochs, stages) == "1_GOP_2"
    assert gop_curriculum(9, epochs, stages) == "1_GOP_2"
    assert gop_curriculum(10, epochs, stages) == "1_GOP_4"
    assert gop_curriculum(25, epochs, stages) == "2_GOP_4"
    assert gop_curriculum(99, epochs, stages) == "2_GOP_4"
    import pytest

    with pytest.raises(ValueError):
        gop_curriculum(0, [1], ["a", "b"])


def test_header_range_validation():
    import pytest

    from aivc_tpu.coding.bitstream import GopHeader

    GopHeader("1_GOP_4", 15.9).pack()  # max representable
    with pytest.raises(ValueError):
        GopHeader("1_GOP_4", 16.5).pack()
    with pytest.raises(ValueError):
        GopHeader("1_GOP_4", -1.0).pack()


def test_gain_smooth_geometric_fixed_point():
    """Row smoothing = geometric mean of neighbours: an exactly geometric
    ladder is a fixed point, and a perturbed row is pulled back onto the
    interpolation path (scripts/gain_smooth.py — the MS-SSIM ladder
    inversion surgery)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from gain_smooth import smooth_rows

    base = np.geomspace(4.0, 0.5, 7)[:, None] * np.ones((7, 3), np.float32)
    tree = {"gain_I": {"enc_gain": base.copy()}, "conv": {"kernel": base}}
    out, n = smooth_rows(tree, [1, 3])
    assert n == 1  # only *_gain leaves are touched
    np.testing.assert_allclose(out["gain_I"]["enc_gain"], base, rtol=1e-6)
    np.testing.assert_array_equal(out["conv"]["kernel"], base)

    bad = base.copy()
    bad[2] *= 3.0
    out, _ = smooth_rows({"g": {"dec_gain": bad}}, [2])
    np.testing.assert_allclose(out["g"]["dec_gain"][2], base[2], rtol=1e-6)
