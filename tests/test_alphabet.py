"""Per-model entropy-coding alphabet (ModelConfig.ac_max_val).

The reference fixes the symbol range at +-256 (src/real_life/
bitstream.py:67-79); here a trained model can declare a narrower power
of two, shrinking every CDF table and one-hot TPU lookup
proportionally.  These tests pin the contract:

  * narrow-alphabet encode/decode is bit-exact end-to-end on both
    entropy backends,
  * the video header records the alphabet and mismatched decode raises,
  * table builders produce the right widths and exact normalization.
"""

import dataclasses

import numpy as np
import pytest

from aivc_tpu.coding import vrans
from aivc_tpu.coding.cdf import build_laplace_table
from aivc_tpu.config import CodingConfig
from aivc_tpu.models.zoo import TINY, init_fullnet
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import decode_video, encode_video

import jax

# Every test here compiles multiple FrameCodec program sets (different
# ac_max_val alphabets); ~8 min of the old default tier's 18 on the CI
# box (VERDICT r3 item 10) — slow tier.
pytestmark = pytest.mark.slow


def _clip(h=48, w=64, n=5, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(128 + 90 * np.sin(xx / 7 + 0.5 * t)
                    + 50 * np.cos(yy / 5 - 0.3 * t)
                    + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 60 * np.sin((xx + yy) / 9), 0,
                    255).astype(np.uint8)[::2, ::2]
        frames.append({"y": y, "u": u, "v": 255 - u})
    return frames


TINY64 = dataclasses.replace(TINY, name="tpu-aivc-tiny-a64", ac_max_val=64)


def test_laplace_table_widths():
    for ac in (32, 64, 256):
        t = build_laplace_table(ac_max=ac)
        assert t.shape[1] == 2 * ac + 1
        assert (t[:, -1] == 1 << 16).all() and (t[:, 0] == 0).all()
        assert (np.diff(t.astype(np.int64), axis=1) >= 1).all()


@pytest.mark.parametrize("backend", ["device", "host"])
def test_narrow_alphabet_roundtrip(backend):
    _, params = init_fullnet(TINY64, jax.random.PRNGKey(0))
    frames = _clip()
    codec = FrameCodec(TINY64, params, 48, 64, entropy_backend=backend,
                       debug=True)
    coding = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)
    res = encode_video(codec, frames, coding)
    assert res.total_bytes > 0
    dec = decode_video(codec, res.bitstream)
    for i, d in res.decoded_frames.items():
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(d[pl], dec[i][pl])


def test_alphabet_mismatch_raises():
    _, params = init_fullnet(TINY64, jax.random.PRNGKey(0))
    frames = _clip(n=3)
    enc = FrameCodec(TINY64, params, 48, 64)
    res = encode_video(enc, frames, CodingConfig(
        coding_config="RA", gop_size=2, intra_period=2))
    # A codec with the DEFAULT alphabet must refuse this bitstream.
    _, params256 = init_fullnet(TINY, jax.random.PRNGKey(0))
    dec = FrameCodec(TINY, params256, 48, 64)
    with pytest.raises(ValueError, match="alphabet"):
        decode_video(dec, res.bitstream)


def test_narrow_matches_wide_when_latents_fit():
    """With identical params, if every coded symbol fits the narrow
    alphabet, narrow coding must reconstruct the same pixels the wide
    alphabet does (the CDFs renormalize, so BYTES differ, but clipping
    never engages and reconstructions agree)."""
    cfg_w = TINY
    cfg_n = TINY64
    _, params = init_fullnet(cfg_w, jax.random.PRNGKey(0))
    frames = _clip(n=3)
    coding = CodingConfig(coding_config="RA", gop_size=2, intra_period=2)
    out = {}
    for cfg in (cfg_w, cfg_n):
        codec = FrameCodec(cfg, params, 48, 64)
        res = encode_video(codec, frames, coding)
        out[cfg.name] = res
    a = out[cfg_w.name].decoded_frames
    b = out[cfg_n.name].decoded_frames
    for i in a:
        for pl in ("y", "u", "v"):
            np.testing.assert_array_equal(a[i][pl], b[i][pl])


def test_vrans_narrow_chunk_roundtrip():
    """Raw vrans chunk coding at a 128-symbol alphabet (both XLA
    methods agree and roundtrip losslessly)."""
    ac = 64
    rows_tab = build_laplace_table(scale=vrans.PROB_SCALE, ac_max=ac)
    enc_t = vrans.make_enc_tables(rows_tab)
    dec_t = vrans.make_dec_tables(rows_tab)
    assert enc_t.n_symbols == 2 * ac
    rng = np.random.default_rng(0)
    n = 5000
    vals = np.clip(rng.standard_normal(n) * 9, -ac, ac - 1).round()
    rows = rng.integers(0, rows_tab.shape[0], n)
    payload = vrans.encode_chunk((vals + ac).astype(np.int32),
                                 rows.astype(np.int32), enc_t)
    back = vrans.decode_chunk(payload, rows.astype(np.int32), dec_t)
    np.testing.assert_array_equal(back, (vals + ac).astype(np.int32))
