"""Differential tests against the ACTUAL reference implementation.

These import the reference's own torch modules (read-only, mounted at
/root/reference) and compare their outputs numerically against our
JAX implementations on random inputs — the strongest possible parity
evidence for the numerics the bitstream depends on:

  * GOP structure generation   (reference: src/func_util/GOP_structure.py)
  * bilinear warp              (reference: src/func_util/optical_flow.py)
  * MS-SSIM                    (reference: src/func_util/ms_ssim.py)
  * GDN                        (reference: src/layers/misc/misc_layers.py)
  * BallePdfEstim CDF          (reference: src/layers/entropy_coding/
                                pdf_estimator.py)
  * Laplace bin probabilities  (reference: ParametricPdf, same file)
  * gain-vector interpolation  (reference: src/layers/multi_rate/
                                gain_matrix.py)
  * CLIC21 MultiScaleSSIM      (reference: src/clic21/msssim.py)

Everything here is skipped when the reference checkout is not present.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref():
    """Make the reference importable: path + a torchvision stub (the
    reference only uses torchvision for PNG<->tensor helpers that these
    tests never touch, but importing func_util.math_func pulls it in)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        functional = types.ModuleType("torchvision.transforms.functional")
        functional.to_tensor = None
        functional.to_pil_image = None
        transforms.functional = functional
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional
    import torch

    torch.manual_seed(0)
    return torch


# ---------------------------------------------------------------------------
# GOP structures
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", [
    "1_GOP_0", "LDP_4", "LDP_16", "1_GOP_2", "1_GOP_4", "1_GOP_8",
    "1_GOP_16", "2_GOP_4", "4_GOP_8", "2_GOP_16",
])
def test_gop_structures_match_reference(ref, name):
    from func_util.GOP_structure import generate_gop_struct as ref_gen

    from aivc_tpu.gop import generate_gop_struct

    ref_gop = ref_gen(name)
    ours = generate_gop_struct(name)

    assert len(ours) == len(ref_gop)
    for spec in ours.frames:
        rf = ref_gop[f"frame_{spec.idx}"]
        assert spec.frame_type == rf["type"], (name, spec.idx)
        for key, val in (("prev_ref", spec.prev_ref),
                         ("next_ref", spec.next_ref)):
            expect = rf[key]
            got = None if val is None else f"frame_{val}"
            assert got == expect, (name, spec.idx, key)
        assert spec.coding_order == rf["coding_order"], (name, spec.idx)


# ---------------------------------------------------------------------------
# Bilinear warp (motion compensation primitive)
# ---------------------------------------------------------------------------

def test_warp_matches_reference_grid_sample(ref):
    torch = ref
    from func_util.optical_flow import warp as ref_warp

    from aivc_tpu.ops.warp import warp

    rng = np.random.default_rng(1)
    B, C, H, W = 2, 3, 24, 40
    x = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
    # Mix of sub-pixel, multi-pixel and far out-of-bounds displacements:
    # border clamping must match grid_sample(padding_mode='border').
    flow = rng.uniform(-6, 6, (B, 2, H, W)).astype(np.float32)
    flow[0, :, :4, :4] = 100.0
    flow[1, :, -4:, -4:] = -100.0

    ref_out = ref_warp(torch.from_numpy(x), torch.from_numpy(flow))
    ref_np = ref_out.detach().numpy()

    ours = np.asarray(warp(
        np.transpose(x, (0, 2, 3, 1)), np.transpose(flow, (0, 2, 3, 1))))
    ours = np.transpose(ours, (0, 3, 1, 2))

    np.testing.assert_allclose(ours, ref_np, atol=2e-5, rtol=0)


def test_warp_zero_flow_is_identity(ref):
    torch = ref
    from func_util.optical_flow import warp as ref_warp

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    out = ref_warp(torch.from_numpy(x), torch.zeros((1, 2, 16, 16)))
    # Establishes the oracle's own sanity (align_corners=True semantics).
    np.testing.assert_allclose(out.numpy(), x, atol=1e-6)


# ---------------------------------------------------------------------------
# MS-SSIM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hw", [(96, 112), (97, 103)])
def test_msssim_matches_reference(ref, hw):
    torch = ref
    from func_util.ms_ssim import msssim as ref_msssim

    import jax.numpy as jnp

    from aivc_tpu.ops.metrics import msssim

    H, W = hw
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (1, 1, H, W)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    ref_val = float(ref_msssim(torch.from_numpy(a), torch.from_numpy(b),
                               val_range=1.0))
    ours = float(msssim(jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
                        jnp.asarray(np.transpose(b, (0, 2, 3, 1)))))
    assert abs(ours - ref_val) < 1e-4, (ours, ref_val)


def test_msssim_np_matches_clic21(ref):
    from clic21.msssim import MultiScaleSSIM

    from aivc_tpu.ops.metrics_np import msssim_np

    rng = np.random.default_rng(4)
    a = rng.uniform(0, 255, (1, 128, 160, 1)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255).astype(np.float64)
    ref_val = MultiScaleSSIM(a, b, max_val=255)
    ours = msssim_np(a[0, :, :, 0] / 255.0, b[0, :, :, 0] / 255.0)
    # The reference's own two implementations (torch ms_ssim.py vs numpy
    # clic21/msssim.py) differ at ~1e-5 (padding scheme); ours follows the
    # torch one, so compare to CLIC21 at that granularity.
    assert abs(ours - ref_val) < 1e-3, (ours, ref_val)


# ---------------------------------------------------------------------------
# GDN
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_matches_reference(ref, inverse):
    torch = ref
    from layers.misc.misc_layers import GDN as RefGDN

    import jax.numpy as jnp

    from aivc_tpu.ops.gdn import gdn_apply

    ch = 8
    m = RefGDN(ch, inverse=inverse)
    rng = np.random.default_rng(5)
    # Perturb the reparameterised parameters away from the identity init.
    with torch.no_grad():
        m.beta += torch.from_numpy(
            rng.uniform(0, 0.5, ch).astype(np.float32))
        m.gamma += torch.from_numpy(
            rng.uniform(0, 0.2, (ch, ch)).astype(np.float32))

    x = rng.normal(0, 1, (2, ch, 12, 20)).astype(np.float32)
    ref_out = m(torch.from_numpy(x)).detach().numpy()

    ours = np.asarray(gdn_apply(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(m.beta.detach().numpy()),
        jnp.asarray(m.gamma.detach().numpy()),
        inverse))
    ours = np.transpose(ours, (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=3e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# BallePdfEstim (factorized prior CDF)
# ---------------------------------------------------------------------------

def test_factorized_prior_matches_reference(ref):
    torch = ref
    from layers.entropy_coding.pdf_estimator import BallePdfEstim

    import jax.numpy as jnp

    from aivc_tpu.ops.entropy_models import FactorizedPrior

    C = 6
    m = BallePdfEstim(C, "balle", verbose=False)
    params = {"params": {}}
    for i in range(m.K):
        params["params"][f"h{i}"] = jnp.asarray(
            m.matrix_h[i].detach().numpy())
        params["params"][f"b{i}"] = jnp.asarray(
            m.bias_b[i].detach().numpy())
        if i != m.K - 1:
            params["params"][f"a{i}"] = jnp.asarray(
                m.bias_a[i].detach().numpy())

    prior = FactorizedPrior(C)
    rng = np.random.default_rng(6)

    # cdf at the half-integer grid the range coder uses
    pts = np.tile(np.linspace(-12.5, 12.5, 51, dtype=np.float32), (C, 1))
    ours_cdf = np.asarray(prior.apply(params, jnp.asarray(pts),
                                      method=FactorizedPrior.cdf))
    ref_cdf = m.cdf(torch.from_numpy(
        pts.reshape(1, C, -1, 1))).detach().numpy().reshape(C, -1)
    np.testing.assert_allclose(ours_cdf, ref_cdf, atol=1e-6)

    # forward bin probability on a random quantized latent
    x = rng.integers(-8, 9, (2, C, 4, 5)).astype(np.float32)
    ref_p = m(torch.from_numpy(x)).detach().numpy()
    ours_p = np.asarray(prior.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(
        np.transpose(ours_p, (0, 3, 1, 2)), ref_p, atol=1e-6)


# ---------------------------------------------------------------------------
# Laplace bin probabilities (ParametricPdf)
# ---------------------------------------------------------------------------

def test_laplace_bin_prob_matches_reference(ref):
    torch = ref
    from layers.entropy_coding.pdf_estimator import ParametricPdf

    import jax.numpy as jnp

    from aivc_tpu.ops.entropy_models import laplace_bin_prob

    m = ParametricPdf("laplace")
    rng = np.random.default_rng(7)
    y = rng.integers(-20, 21, (1, 4, 6, 6)).astype(np.float32)
    sigma = np.exp(rng.uniform(-3, 2, y.shape)).astype(np.float32)

    ref_p = m(torch.from_numpy(y),
              [{"sigma": torch.from_numpy(sigma)}],
              zero_mu=True).numpy()
    ours = np.asarray(laplace_bin_prob(jnp.asarray(y), jnp.asarray(sigma)))
    np.testing.assert_allclose(ours, ref_p, atol=1e-6)


@pytest.mark.parametrize("ec_mode", ["two", "three"])
def test_mixture_parameterizer_matches_reference(ref, ec_mode):
    """K-component PdfParamParameterizer + the mixture probability
    composition match the reference end to end
    (reference: src/layers/misc/misc_layers.py:172-269,
    src/layers/entropy_coding/pdf_estimator.py:40-70)."""
    torch = ref
    from layers.entropy_coding.pdf_estimator import ParametricPdf
    from layers.misc.misc_layers import PdfParamParameterizer

    import jax.numpy as jnp

    from aivc_tpu.ops.entropy_models import (
        mixture_bin_prob,
        pdf_parameterize_mixture,
    )

    K = {"two": 2, "three": 3}[ec_mode]
    C, H, W = 4, 5, 6
    n_ch = (3 * K - 1) * C
    rng = np.random.default_rng(11)
    x = rng.normal(0, 2.0, (1, n_ch, H, W)).astype(np.float32)

    ref_params = PdfParamParameterizer(ec_mode, C)(torch.from_numpy(x))
    # NHWC view of the same hyper-synthesis output
    ours = pdf_parameterize_mixture(
        jnp.asarray(np.moveaxis(x, 1, -1)), C, ec_mode)

    assert len(ref_params) == len(ours) == K
    for rp, op in zip(ref_params, ours):
        for key in ("mu", "sigma", "weight"):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(op[key]), -1, 1)[:, :, :, :],
                rp[key].numpy(), atol=1e-6, err_msg=key)

    # Mixture probability: unweighted sum over components, zero-mu
    y = rng.integers(-10, 11, (1, C, H, W)).astype(np.float32)
    ref_p = ParametricPdf("laplace")(
        torch.from_numpy(y), ref_params, zero_mu=True).numpy()
    ours_p = mixture_bin_prob(
        jnp.asarray(np.moveaxis(y, 1, -1)), ours, "laplace")
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours_p), -1, 1), ref_p, atol=1e-6)


# ---------------------------------------------------------------------------
# Gain-vector interpolation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("idx_rate", [0.0, 1.0, 2.5, 3.999, 6.0])
def test_gain_interpolation_matches_reference(ref, idx_rate):
    torch = ref
    from layers.multi_rate.gain_matrix import GainMatrix as RefGain

    from aivc_tpu.ops.gain import interpolate_gain

    N, nb_ft = 7, 12
    m = RefGain({"N": N, "nb_ft": nb_ft})
    rng = np.random.default_rng(8)
    gains = rng.uniform(0.2, 3.0, (N, nb_ft)).astype(np.float32)
    # Sign flips exercise the abs() reparameterisation.
    gains[1] *= -1.0
    with torch.no_grad():
        for i in range(N):
            m.enc_gain_list[i].copy_(
                torch.from_numpy(gains[i].reshape(nb_ft, 1, 1)))
    m.eval()

    x = torch.ones((1, nb_ft, 1, 1))
    ref_out = m({"x": x, "idx_rate": idx_rate, "mode": "enc"})[
        "output"].detach().numpy().reshape(nb_ft)
    ours = np.asarray(interpolate_gain(gains, idx_rate))
    np.testing.assert_allclose(ours, ref_out, atol=1e-6, rtol=1e-6)
