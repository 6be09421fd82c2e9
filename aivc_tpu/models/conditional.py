"""ConditionalNet: one conditional autoencoder with hyperprior + gains.

This is the shared shape of MOFNet's inner net and CodecNet's inner net —
a *ghost* class in the reference (it exists only inside pickled model
files; its interface is reconstructed in SURVEY.md §2.3 from the decoder
mirror, reference: src/real_life/decode.py:752-898).  Here it is a
first-class flax module.

Transforms:
  g_a      analysis: 4x stride-2 conv (GDN) -> nb_ft_y latents
  g_a_ref  shortcut/conditioning encoder: same downsampling to
           out_c_shortcut_y channels (decode.py:887-892)
  h_a      hyper-analysis: 2x stride-2 -> nb_ft_z
  h_s      hyper-synthesis: 2x up -> (mu, logvar) of y  (decode.py:853-856)
  g_s      synthesis from cat(y_hat_gained, y_shortcut) (decode.py:894-896)

Coding pipeline (encoder):
  y  = g_a(x) * gain_enc(frame_type, idx_rate)
  z  = h_a(y);  z_q = round(z)                   [transmitted]
  mu, sigma = pdf_param(h_s(z_q))
  y_cq = clip(round(y - mu))                     [transmitted, zero-mean]
Decoder (mirrors decode.py:839-896):
  y_hat = (y_cq + mu) * gain_dec(frame_type, idx_rate)
  x_hat = g_s(cat(y_hat, g_a_ref(shortcut) or zeros))

mu is subtracted before quantization, so entropy coding always sees the
zero-mean Laplace (reference: pdf_estimator.py:45-46, decode.py:858-867).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from aivc_tpu.config import AC_MAX_VAL, FRAME_B, FRAME_I, FRAME_P, ConditionalNetConfig
from aivc_tpu.ops.entropy_models import (
    FactorizedPrior,
    bin_prob,
    mixture_bin_prob,
    pdf_parameterize,
    pdf_parameterize_mixture,
    rate_bits,
)
from aivc_tpu.ops.gain import GainMatrix
from aivc_tpu.ops.layers import ConvBlock, SimplifiedAttention, UpBlock
from aivc_tpu.ops.quantizer import quantize


class AnalysisTransform(nn.Module):
    """g_a / g_a_ref: 4x stride-2 downsampling conv stack with GDN."""

    nb_ft: int
    out_ft: int
    k_size: int = 5
    use_attention: bool = True
    dtype: str = "float32"
    gdn_clamp: float = 0.0
    gdn_lowp: bool = False
    # Space-to-depth schedule for the FIRST conv (the only few-channel
    # one — 3/6/9-channel full-res frame concats; see ConvBlock.s2d /
    # config.py:s2d_analysis).
    s2d_first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.dtype
        gdn = "gdn" if not self.gdn_clamp else f"gdn@{self.gdn_clamp}"
        if self.gdn_lowp:
            gdn += "!lp"
        x = x.astype(d)
        x = ConvBlock(self.nb_ft, self.k_size, stride=2, non_linearity=gdn,
                      dtype=d, s2d=self.s2d_first)(x)
        x = ConvBlock(self.nb_ft, self.k_size, stride=2, non_linearity=gdn,
                      dtype=d)(x)
        if self.use_attention:
            x = SimplifiedAttention(self.nb_ft, dtype=d)(x)
        x = ConvBlock(self.nb_ft, self.k_size, stride=2, non_linearity=gdn,
                      dtype=d)(x)
        x = ConvBlock(self.out_ft, self.k_size, stride=2, non_linearity="no",
                      dtype=d)(x)
        # Latents leave in float32: quantization, entropy modelling and the
        # gain scaling all need full precision.
        return x.astype(jnp.float32)


class SynthesisTransform(nn.Module):
    """g_s: 4x stride-2 upsampling with IGDN."""

    nb_ft: int
    out_ft: int
    k_size: int = 5
    use_attention: bool = True
    dtype: str = "float32"
    gdn_clamp: float = 0.0
    # Lane-pack the OUTPUT head conv (4*out_ft channels — 24/12 for the
    # map/pixel heads, 7-19x under the MXU's 128 lanes); see
    # ops/layers.py:LanePackedConv.  0 = plain conv (training default);
    # FrameCodec enables it for inference via ConditionalNetConfig.
    head_lane_pack: int = 0
    gdn_lowp: bool = False
    # Return the head conv output PRE-depth-to-space ([B, H/2, W/2,
    # 4*out_ft]) so the caller folds the pixel shuffle into its own
    # layout transform (channel-major maps, config.py:maps_cm).
    head_pre_dts: bool = False

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        d = self.dtype
        igdn = ("gdn_inverse" if not self.gdn_clamp
                else f"gdn_inverse@{self.gdn_clamp}")
        if self.gdn_lowp:
            igdn += "!lp"
        y = y.astype(d)
        y = UpBlock(self.nb_ft, self.k_size, non_linearity=igdn,
                    dtype=d)(y)
        if self.use_attention:
            y = SimplifiedAttention(self.nb_ft, dtype=d)(y)
        y = UpBlock(self.nb_ft, self.k_size, non_linearity=igdn,
                    dtype=d)(y)
        y = UpBlock(self.nb_ft, self.k_size, non_linearity=igdn,
                    dtype=d)(y)
        y = UpBlock(self.out_ft, self.k_size, non_linearity="no", dtype=d,
                    lane_pack=self.head_lane_pack,
                    skip_dts=self.head_pre_dts)(y)
        return y.astype(jnp.float32)


class HyperAnalysis(nn.Module):
    nb_ft: int
    out_ft: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        d = self.dtype
        y = jnp.abs(y).astype(d)
        y = ConvBlock(self.nb_ft, 3, non_linearity="leaky_relu", dtype=d)(y)
        y = ConvBlock(self.nb_ft, 5, stride=2, non_linearity="leaky_relu",
                      dtype=d)(y)
        y = ConvBlock(self.out_ft, 5, stride=2, non_linearity="no", dtype=d)(y)
        return y.astype(jnp.float32)


class HyperSynthesis(nn.Module):
    nb_ft: int
    out_ft: int  # 2 * nb_ft_y: mu and logvar
    dtype: str = "float32"

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        d = self.dtype
        z = z.astype(d)
        z = UpBlock(self.nb_ft, 5, non_linearity="leaky_relu", dtype=d)(z)
        z = UpBlock(self.nb_ft, 5, non_linearity="leaky_relu", dtype=d)(z)
        z = ConvBlock(self.out_ft, 3, non_linearity="no", dtype=d)(z)
        # mu / log-var in float32: sigma feeds the entropy coder.
        return z.astype(jnp.float32)


class ConditionalNet(nn.Module):
    """Full conditional coder; see module docstring for dataflow."""

    cfg: ConditionalNetConfig

    def setup(self):
        c = self.cfg
        d = c.dtype
        clamp = getattr(c, "gdn_clamp", 0.0)
        lowp = getattr(c, "gdn_lowp", False)
        s2d = getattr(c, "s2d_analysis", False)
        self.g_a = AnalysisTransform(c.nb_ft, c.nb_ft_y, c.k_size,
                                     c.use_attention, dtype=d,
                                     gdn_clamp=clamp, gdn_lowp=lowp,
                                     s2d_first=s2d)
        if c.in_c_shortcut > 0:
            self.g_a_ref = AnalysisTransform(
                c.nb_ft, c.out_c_shortcut_y, c.k_size, use_attention=False,
                dtype=d, gdn_clamp=clamp, gdn_lowp=lowp, s2d_first=s2d)
        self.g_s = SynthesisTransform(c.nb_ft, c.out_c, c.k_size,
                                      c.use_attention, dtype=d,
                                      gdn_clamp=clamp,
                                      head_lane_pack=getattr(
                                          c, "head_lane_pack", 0),
                                      gdn_lowp=lowp,
                                      head_pre_dts=getattr(
                                          c, "maps_cm", False))
        self.h_a = HyperAnalysis(c.nb_ft_z, c.nb_ft_z, dtype=d)
        self.h_s = HyperSynthesis(c.nb_ft_y, c.sigma_cond_c, dtype=d)
        self.pdf_z = FactorizedPrior(c.nb_ft_z)
        self.gain_I = GainMatrix(c.n_rates, c.nb_ft_y)
        if c.gain_p_b:
            self.gain_P = GainMatrix(c.n_rates, c.nb_ft_y)
            self.gain_B = GainMatrix(c.n_rates, c.nb_ft_y)

    # -- gain selection (frame_type is a static python int: the three frame
    # -- functions are separate XLA specializations, per SURVEY.md §7)
    def _gain(self, x, idx_rate, mode: str, frame_type: int):
        if not self.cfg.gain_p_b or frame_type == FRAME_I:
            return self.gain_I(x, idx_rate, mode)
        if frame_type == FRAME_P:
            return self.gain_P(x, idx_rate, mode)
        if frame_type == FRAME_B:
            return self.gain_B(x, idx_rate, mode)
        raise ValueError(f"bad frame_type {frame_type}")

    # ------------------------------------------------------------------
    # Encoder-side: full latent production
    # ------------------------------------------------------------------
    def encode_latents(self, x: jax.Array, idx_rate, frame_type: int,
                       training: bool = False,
                       rng: Optional[jax.Array] = None):
        """x: [B, H, W, in_c] -> latents + coding side-info.

        Returns a dict with quantized integer latents (y_cq, z_q), the
        distribution parameters (mu, sigma from the *quantized* z, so the
        decoder reproduces them exactly), and rate estimates in bits.
        """
        y = self.g_a(x)
        y = self._gain(y, idx_rate, "enc", frame_type)
        z = self.h_a(y)

        if training:
            rng_z, rng_y = jax.random.split(rng)
            z_q = quantize(z, training=True, rng=rng_z)
        else:
            z_q = jnp.clip(jnp.round(z), -AC_MAX_VAL, AC_MAX_VAL - 1)

        comps = self._pdf_components(z_q, y.shape[1], y.shape[2])
        # Coding always consumes component [0]; mu is subtracted before
        # quantization (reference: decode.py:853-867).
        mu, sigma = comps[0]["mu"], comps[0]["sigma"]

        y_centered = y - mu
        if training:
            y_cq = quantize(y_centered, training=True, rng=rng_y)
        else:
            y_cq = jnp.clip(jnp.round(y_centered), -AC_MAX_VAL, AC_MAX_VAL - 1)

        rate_z = rate_bits(self.pdf_z(z_q))
        if len(comps) == 1:
            p_y = bin_prob(y_cq, sigma, self.cfg.pdf_family)
        else:
            p_y = mixture_bin_prob(y_cq, comps, self.cfg.pdf_family)
        rate_y = rate_bits(p_y)

        return {
            "y_cq": y_cq,
            "z_q": z_q,
            "mu": mu,
            "sigma": sigma,
            "rate_y": rate_y,
            "rate_z": rate_z,
        }

    def analyze(self, x: jax.Array, idx_rate, frame_type: int):
        """Eval-only analysis: x -> (gained y, integer z_q).

        The pipeline deliberately splits coding into analyze / hyper_decode /
        synthesize stages so the encoder and decoder run the *same compiled
        programs* for every computation whose float bits feed entropy
        coding (sigma) or the reconstruction loop — the XLA analogue of the
        reference's determinism contract
        (reference: src/func_util/cluster_mngt.py:27-37, encode.py:94).
        """
        y = self.g_a(x)
        y = self._gain(y, idx_rate, "enc", frame_type)
        z = self.h_a(y)
        z_q = jnp.clip(jnp.round(z), -AC_MAX_VAL, AC_MAX_VAL - 1)
        return y, z_q

    # ------------------------------------------------------------------
    # Decoder-side pieces (also used by the encoder to close the loop)
    # ------------------------------------------------------------------
    def _pdf_components(self, z_q: jax.Array, hy: int, wy: int):
        """Hyper-synthesis -> K mixture components, cropped to the y grid.

        When H, W are not multiples of the z downscale, the hyper-decoder
        output overshoots the y grid; crop to y's spatial dims (the
        reference crops the same way, decode.py:844-856).  No-op for the
        inference pipeline, which pads frames to the full downscale."""
        h = self.h_s(z_q)
        if self.cfg.mixture_k == 1:
            mu, sigma = pdf_parameterize(h, self.cfg.nb_ft_y)
            comps = [{"mu": mu, "sigma": sigma}]
        else:
            comps = pdf_parameterize_mixture(h, self.cfg.nb_ft_y,
                                             self.cfg.ec_mode)
        return [{k: v[:, :hy, :wy, :] for k, v in c.items()} for c in comps]

    def hyper_decode(self, z_q: jax.Array):
        """Decoded z -> (mu, sigma) of component [0]; bit-identical to the
        encoder's use (reference: decode.py:853-856 reads pdf_param[0])."""
        c0 = self._pdf_components(z_q, z_q.shape[1] * 4, z_q.shape[2] * 4)[0]
        return c0["mu"], c0["sigma"]

    def synthesize(self, y_cq: jax.Array, mu: jax.Array,
                   shortcut_in: Optional[jax.Array], idx_rate,
                   frame_type: int) -> jax.Array:
        """(y_cq + mu) -> gain(dec) -> cat shortcut -> g_s
        (reference: decode.py:858-896)."""
        y_hat = y_cq + mu
        y_hat = self._gain(y_hat, idx_rate, "dec", frame_type)
        if shortcut_in is not None and self.cfg.in_c_shortcut > 0:
            y_shortcut = self.g_a_ref(shortcut_in)
        else:
            B, H, W, _ = y_hat.shape
            y_shortcut = jnp.zeros(
                (B, H, W, self.cfg.out_c_shortcut_y), y_hat.dtype)
        return self.g_s(jnp.concatenate([y_hat, y_shortcut], axis=-1))

    # ------------------------------------------------------------------
    def __call__(self, x, shortcut_in, idx_rate, frame_type: int,
                 training: bool = False, rng: Optional[jax.Array] = None):
        """Full conditional coding round trip (training / eval forward)."""
        lat = self.encode_latents(x, idx_rate, frame_type, training, rng)
        out = self.synthesize(lat["y_cq"], lat["mu"], shortcut_in,
                              idx_rate, frame_type)
        return out, lat
