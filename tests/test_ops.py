"""Numerical tests of the ops library against the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.ops import (
    GDN,
    ConvBlock,
    FactorizedPrior,
    SimplifiedAttention,
    UpBlock,
    interpolate_gain,
    laplace_bin_prob,
    pdf_parameterize,
    quantize,
    rate_bits,
    ste_round,
    warp,
    x444_to_yuv420,
    yuv420_to_444,
)
from aivc_tpu.ops.gdn import gdn_apply, gdn_params_init


# ---------------------------------------------------------------------------
# warp
# ---------------------------------------------------------------------------

def test_warp_zero_flow_is_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)), jnp.float32)
    flow = jnp.zeros((2, 8, 12, 2), jnp.float32)
    np.testing.assert_allclose(warp(x, flow), x, atol=1e-6)


def test_warp_integer_shift():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    # flow (+1, 0): out(y, x) = in(y, x + 1)
    flow = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(1.0)
    out = warp(x, flow)
    expect = np.asarray(x)[:, :, [1, 2, 3, 3], :]  # border clamp on last col
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_warp_fractional_bilinear():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1)
    flow = jnp.zeros((1, 1, 4, 2)).at[..., 0].set(0.5)
    out = np.asarray(warp(x, flow))[0, 0, :, 0]
    np.testing.assert_allclose(out, [0.5, 1.5, 2.5, 3.0], atol=1e-6)


def test_warp_grad_flows():
    x = jnp.ones((1, 4, 4, 1))
    flow = jnp.full((1, 4, 4, 2), 0.3)

    def loss(f):
        return jnp.sum(warp(x * 2.0, f) ** 2)

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# GDN
# ---------------------------------------------------------------------------

def test_gdn_formula():
    C = 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 3, C)), jnp.float32)
    beta_r, gamma_r = gdn_params_init(C)
    out = gdn_apply(x, beta_r, gamma_r, inverse=False)
    # Initial params: beta ~ 1, gamma ~ 0.1 * I
    expect = np.asarray(x) / np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
    # XLA may fuse the divide into an rsqrt approximation; allow ~1e-3.
    np.testing.assert_allclose(out, expect, rtol=2e-3, atol=2e-3)


def test_gdn_inverse_roundtrip_shape_and_module():
    x = jnp.ones((2, 4, 4, 8))
    mod = GDN(8, inverse=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape
    np.testing.assert_allclose(out, np.sqrt(1.1) * np.ones_like(out), rtol=1e-4)


def test_lower_bound_gradient_gating():
    from aivc_tpu.ops import lower_bound

    def f(x):
        return jnp.sum(lower_bound(x, 1.0))

    g = jax.grad(f)(jnp.array([0.5, 2.0]))
    # Below bound with positive (upward-pulling in minimisation) grad: blocked
    np.testing.assert_allclose(g, [0.0, 1.0])

    def f2(x):
        return jnp.sum(-lower_bound(x, 1.0))

    g2 = jax.grad(f2)(jnp.array([0.5, 2.0]))
    # Negative incoming grads always pass (lets optimiser push values up)
    np.testing.assert_allclose(g2, [-1.0, -1.0])


# ---------------------------------------------------------------------------
# Quantizer
# ---------------------------------------------------------------------------

def test_quantize_eval_rounds_train_adds_noise():
    x = jnp.array([0.4, 0.6, -1.2])
    np.testing.assert_allclose(quantize(x, training=False), [0.0, 1.0, -1.0])
    noisy = quantize(x, training=True, rng=jax.random.PRNGKey(0))
    assert np.all(np.abs(np.asarray(noisy - x)) <= 0.5)


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.array([0.3, 1.7]))
    np.testing.assert_allclose(g, [3.0, 3.0])


# ---------------------------------------------------------------------------
# Gain interpolation
# ---------------------------------------------------------------------------

def test_gain_integer_index_selects_row():
    gains = jnp.array([[2.0, 4.0], [1.0, 1.0], [0.5, 0.25]])
    np.testing.assert_allclose(interpolate_gain(gains, 0.0), [2.0, 4.0])
    np.testing.assert_allclose(interpolate_gain(gains, 2.0), [0.5, 0.25])


def test_gain_geometric_interpolation():
    gains = jnp.array([[4.0], [1.0]])
    # idx 0.5: l = 0.5 -> 4^0.5 * 1^0.5 = 2
    np.testing.assert_allclose(interpolate_gain(gains, 0.5), [2.0], rtol=1e-6)


def test_gain_abs_reparam_and_clamp():
    gains = jnp.array([[-2.0], [1.0]])
    np.testing.assert_allclose(interpolate_gain(gains, 0.0), [2.0])
    # Above the last index: clamps to the last row
    np.testing.assert_allclose(interpolate_gain(gains, 5.0), [1.0])


def test_gain_interpolation_jits_with_traced_idx():
    gains = jnp.ones((4, 8))
    out = jax.jit(interpolate_gain)(gains, jnp.float32(1.5))
    assert out.shape == (8,)


# ---------------------------------------------------------------------------
# Entropy models
# ---------------------------------------------------------------------------

def test_factorized_prior_cdf_monotone_and_bounded():
    C = 6
    prior = FactorizedPrior(C)
    x = jnp.tile(jnp.linspace(-20, 20, 101)[None, :], (C, 1))
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, C)))
    cdf = prior.apply(params, x, method=prior.cdf)
    cdf_np = np.asarray(cdf)
    assert (cdf_np >= 0).all() and (cdf_np <= 1).all()
    assert (np.diff(cdf_np, axis=1) >= -1e-6).all()


def test_factorized_prior_bin_probs_sum_to_one():
    C = 3
    prior = FactorizedPrior(C)
    params = prior.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 2, C)))
    sym = jnp.tile(jnp.arange(-256, 256, dtype=jnp.float32)[None, :], (C, 1))
    p = np.asarray(
        prior.apply(params, sym + 0.5, method=prior.cdf)
        - prior.apply(params, sym - 0.5, method=prior.cdf)
    )
    assert p.min() >= -1e-6
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-2)


def test_laplace_bin_prob_matches_closed_form():
    y = jnp.array([0.0, 1.0, -2.0])
    sigma = jnp.array([1.0, 2.0, 0.5])
    b = np.asarray(sigma) / np.sqrt(2)

    def lap_cdf(x, b):
        return np.where(x < 0, 0.5 * np.exp(x / b), 1 - 0.5 * np.exp(-x / b))

    expect = lap_cdf(np.asarray(y) + 0.5, b) - lap_cdf(np.asarray(y) - 0.5, b)
    np.testing.assert_allclose(laplace_bin_prob(y, sigma), expect, rtol=1e-5)


def test_rate_bits_clamps_proba():
    p = jnp.array([1.0, 2.0 ** -20, 0.5])
    r = np.asarray(rate_bits(p))
    np.testing.assert_allclose(r, [0.0, 16.0, 1.0], atol=1e-5)


def test_pdf_parameterize_logvar_trick():
    nb_ft = 2
    x = jnp.zeros((1, 1, 1, 4)).at[..., 2:].set(jnp.array([0.0, 100.0]))
    mu, sigma = pdf_parameterize(x, nb_ft)
    np.testing.assert_allclose(mu, 0.0)
    np.testing.assert_allclose(
        np.asarray(sigma)[0, 0, 0], [1.0, np.exp(5.0)], rtol=1e-5)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def test_conv_block_preserves_or_halves_spatial():
    x = jnp.ones((1, 16, 16, 3))
    blk = ConvBlock(8, k_size=5)
    p = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(p, x).shape == (1, 16, 16, 8)
    blk2 = ConvBlock(8, k_size=5, stride=2)
    p2 = blk2.init(jax.random.PRNGKey(0), x)
    assert blk2.apply(p2, x).shape == (1, 8, 8, 8)


def test_upblock_doubles_spatial():
    x = jnp.ones((1, 8, 8, 4))
    blk = UpBlock(6)
    p = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(p, x).shape == (1, 16, 16, 6)


def test_attention_shape():
    x = jnp.ones((1, 8, 8, 16))
    blk = SimplifiedAttention(16)
    p = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(p, x).shape == x.shape


def test_yuv420_444_roundtrip_shapes():
    y = jnp.ones((1, 16, 16, 1))
    u = jnp.full((1, 8, 8, 1), 0.5)
    v = jnp.full((1, 8, 8, 1), 0.25)
    x = yuv420_to_444(y, u, v)
    assert x.shape == (1, 16, 16, 3)
    y2, u2, v2 = x444_to_yuv420(x)
    np.testing.assert_allclose(y2, y)
    np.testing.assert_allclose(u2, u)
    np.testing.assert_allclose(v2, v)


def test_x444_downscale_is_2x2_mean():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    x3 = jnp.concatenate([jnp.zeros_like(x), x, x], axis=-1)
    _, u, _ = x444_to_yuv420(x3)
    expect = np.array([[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_allclose(np.asarray(u)[0, :, :, 0], expect)


# ---------------------------------------------------------------------------
# Metrics: JAX vs independent numpy oracle
# ---------------------------------------------------------------------------

def test_msssim_matches_numpy_oracle():
    from aivc_tpu.ops.metrics import msssim
    from aivc_tpu.ops.metrics_np import msssim_np, psnr_np

    rng = np.random.default_rng(7)
    a = rng.random((1, 192, 176, 1)).astype(np.float32)
    # correlated distortion so MS-SSIM is in a meaningful range
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    ms_jax = float(msssim(jnp.asarray(a), jnp.asarray(b)))
    ms_np = msssim_np(a[0, :, :, 0], b[0, :, :, 0])
    assert abs(ms_jax - ms_np) < 2e-4, (ms_jax, ms_np)


def test_psnr_matches_numpy():
    from aivc_tpu.ops.metrics import psnr
    from aivc_tpu.ops.metrics_np import psnr_np

    rng = np.random.default_rng(8)
    a = rng.random((32, 32)).astype(np.float32)
    b = rng.random((32, 32)).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    assert abs(float(psnr(jnp.float32(mse))) - psnr_np(a, b)) < 1e-3


def test_bd_metrics_analytic():
    """BD-rate/BD-PSNR on analytically shifted curves: a curve that needs
    x% fewer bits at every quality must report ~-x% BD-rate; a +d dB
    offset at every rate must report +d BD-PSNR."""
    from aivc_tpu.ops.bd_metrics import bd_psnr, bd_rate

    rates = [400.0, 800.0, 1600.0, 3200.0, 6400.0]
    ref = [(r, 30.0 + 3.0 * np.log2(r / 400.0)) for r in rates]

    # identical curves -> both deltas ~0
    assert abs(bd_rate(ref, ref)) < 1e-9
    assert abs(bd_psnr(ref, ref)) < 1e-9

    # 20% rate savings at equal quality
    saved = [(r * 0.8, q) for r, q in ref]
    assert abs(bd_rate(ref, saved) - (-20.0)) < 0.5

    # +1.5 dB at equal rate
    better = [(r, q + 1.5) for r, q in ref]
    assert abs(bd_psnr(ref, better) - 1.5) < 1e-6

    # worse codec: positive BD-rate
    worse = [(r * 1.25, q) for r, q in ref]
    assert bd_rate(ref, worse) > 20.0
