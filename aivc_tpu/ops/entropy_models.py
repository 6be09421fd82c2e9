"""Learned entropy models.

Two ingredients, as in the reference:

* FactorizedPrior — the Ballé-2018 (Appendix 6) univariate-per-channel
  learned CDF used for the hyper-latent z
  (reference: src/layers/entropy_coding/pdf_estimator.py:73-245).
  K=4 layers of width r=3, per-channel weight matrices applied with one
  einsum, softplus-positive H matrices, tanh-gated bias, final sigmoid.

* Parametric Laplace/Normal bin probabilities for the main latent y, with
  scale sigma predicted from the decoded z by the hyper-synthesis
  (reference: pdf_estimator.py:17-70).  mu is subtracted before
  quantization at the encoder, so coding always uses the zero-mean
  distribution (reference: src/real_life/decode.py:858-867).

Rate proxies clamp probabilities at 2^-16
(reference: src/layers/entropy_coding/entropy_coder.py:18-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from aivc_tpu.config import LOG_VAR_MAX, LOG_VAR_MIN, PROBA_MIN

SQRT2 = 1.4142135623730951


class FactorizedPrior(nn.Module):
    """Per-channel learned CDF c_x; p(x) = c_x(x + .5) - c_x(x - .5)."""

    nb_channel: int
    K: int = 4   # number of layers
    r: int = 3   # hidden width

    def setup(self):
        C, K, r = self.nb_channel, self.K, self.r
        dims = [1] + [r] * (K - 1) + [1]

        def winit(d, rr):
            scale = (2.0 / (d * rr)) ** 0.5
            return nn.initializers.normal(stddev=scale)

        self.matrix_h = [
            self.param(f"h{i}", winit(dims[i], dims[i + 1]), (C, dims[i], dims[i + 1]))
            for i in range(K)
        ]
        self.bias_b = [
            self.param(f"b{i}", winit(1, dims[i + 1]), (C, dims[i + 1]))
            for i in range(K)
        ]
        self.bias_a = [
            self.param(f"a{i}", winit(1, dims[i + 1]), (C, dims[i + 1]))
            for i in range(K - 1)
        ]

    def cdf(self, x: jax.Array) -> jax.Array:
        """Evaluate the per-channel CDF.

        Args:
          x: [C, N] evaluation points (N points per channel).
        Returns:
          [C, N] CDF values in [0, 1].
        """
        t = x[..., None]  # [C, N, 1]
        for i in range(self.K):
            h = jax.nn.softplus(self.matrix_h[i])
            t = jnp.einsum("cnd,cdr->cnr", t, h,
                           preferred_element_type=jnp.float32)
            t = t + self.bias_b[i][:, None, :]
            if i != self.K - 1:
                t = t + jnp.tanh(self.bias_a[i][:, None, :]) * jnp.tanh(t)
        return jax.nn.sigmoid(t[..., 0])

    def __call__(self, x: jax.Array) -> jax.Array:
        """Bin probability of quantized symbols.

        Args:
          x: [B, H, W, C] quantized (or noise-perturbed) hyper-latent.
        Returns:
          [B, H, W, C] per-element probability.
        """
        B, H, W, C = x.shape
        flat = jnp.moveaxis(x, -1, 0).reshape(C, B * H * W)
        p = self.cdf(flat + 0.5) - self.cdf(flat - 0.5)
        return jnp.moveaxis(p.reshape(C, B, H, W), 0, -1)


def laplace_cdf(x: jax.Array, scale: jax.Array) -> jax.Array:
    """CDF of a zero-mean Laplace with scale b."""
    return 0.5 + 0.5 * jnp.sign(x) * (1.0 - jnp.exp(-jnp.abs(x) / scale))


def laplace_bin_prob(y: jax.Array, sigma: jax.Array) -> jax.Array:
    """P(Y = y) for integer y under Laplace with std sigma (b = sigma/sqrt2)."""
    b = sigma / SQRT2
    return laplace_cdf(y + 0.5, b) - laplace_cdf(y - 0.5, b)


def normal_bin_prob(y: jax.Array, sigma: jax.Array) -> jax.Array:
    ndtr = jax.scipy.special.ndtr
    return ndtr((y + 0.5) / sigma) - ndtr((y - 0.5) / sigma)


def bin_prob(y: jax.Array, sigma: jax.Array, pdf_family: str) -> jax.Array:
    if "laplace" in pdf_family.split("_"):
        return laplace_bin_prob(y, sigma)
    if "normal" in pdf_family.split("_"):
        return normal_bin_prob(y, sigma)
    raise ValueError(f"unknown pdf family {pdf_family!r}")


def rate_bits(p: jax.Array) -> jax.Array:
    """Training/estimation rate proxy: -log2 of clamped probability."""
    return -jnp.log2(jnp.clip(p, PROBA_MIN, 1.0))


def pdf_parameterize(x: jax.Array, nb_ft: int):
    """Split a hyper-synthesis output into (mu, sigma), K = 1 fast path.

    x: [B, H, W, 2*nb_ft] -> mu = x[..., :nb_ft],
    sigma = exp(0.5 * clamp(logvar)) (the log-var trick,
    reference: src/layers/misc/misc_layers.py:209-219).
    """
    mu = x[..., :nb_ft]
    logvar = jnp.clip(x[..., nb_ft: 2 * nb_ft], LOG_VAR_MIN, LOG_VAR_MAX)
    sigma = jnp.exp(0.5 * logvar)
    return mu, sigma


def pdf_parameterize_mixture(x: jax.Array, nb_ft: int, ec_mode: str = "one"):
    """Split a hyper-synthesis output into K mixture components.

    Mirrors the reference PdfParamParameterizer channel layout exactly
    (reference: src/layers/misc/misc_layers.py:172-269): x carries
    [K*C mu | K*C log-var | (K*C log-gamma if 'gamma') | (K-1)*C weight
    logits]; component weights are softmax over K with component 0's
    logit hard-wired to 1 (misc_layers.py:241-254); gamma defaults to
    ones (flagged '! Never used' in the reference).

    Returns a list of K dicts {mu, sigma, gamma, weight}, each value
    [B, H, W, nb_ft] — component [0] is what the deployed coding path
    consumes (reference: src/real_life/decode.py:853-856).
    """
    parts = ec_mode.split("_")
    K = 2 if "two" in parts else 3 if "three" in parts else 1
    C = nb_ft
    pos = 0

    def take(n):
        nonlocal pos
        out = [x[..., pos + k * C: pos + (k + 1) * C] for k in range(n)]
        pos += n * C
        return out

    mus = take(K)
    sigmas = [jnp.exp(0.5 * jnp.clip(lv, LOG_VAR_MIN, LOG_VAR_MAX))
              for lv in take(K)]
    if "gamma" in parts:
        gammas = [jnp.exp(0.5 * jnp.clip(lg, LOG_VAR_MIN, LOG_VAR_MAX))
                  for lg in take(K)]
    else:
        gammas = [jnp.ones_like(mus[0])] * K
    logits = [jnp.ones_like(mus[0])] + take(K - 1)
    w = jax.nn.softmax(jnp.stack(logits, axis=0), axis=0)
    return [{"mu": mus[k], "sigma": sigmas[k], "gamma": gammas[k],
             "weight": w[k]} for k in range(K)]


def mixture_bin_prob(y: jax.Array, components, pdf_family: str,
                     zero_mu: bool = True) -> jax.Array:
    """Mixture bin probability: the sum over components of
    cdf(y+.5) - cdf(y-.5), exactly as the reference ParametricPdf.forward
    composes it (reference: src/layers/entropy_coding/pdf_estimator.py:
    40-70 — the component weights are deliberately NOT applied there; the
    overcount is tamed by the rate proxy's clamp to [2^-16, 1]).

    zero_mu: mu already subtracted before quantization (the deployed
    path, pdf_estimator.py:45-46)."""
    p = jnp.zeros_like(y)
    for comp in components:
        yc = y if zero_mu else y - comp["mu"]
        p = p + bin_prob(yc, comp["sigma"], pdf_family)
    return p
