"""Convolutional building blocks (NHWC, XLA-friendly).

Functional re-design of the reference layer library
(reference: src/layers/misc/custom_conv_layers.py, src/layers/misc/attention.py,
src/layers/ae/ae_layers.py).  All convolutions use replication (edge)
padding so spatial tiling across a device mesh only needs halo exchange,
never zero-phantom pixels; downsampling is stride-2 conv, upsampling is
stride-2 transposed conv (exact x2, mirroring the reference's
ConvTranspose2d stride-2/output-padding-1 parameterisation).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from aivc_tpu.ops.gdn import GDN


def replication_pad(x: jax.Array, pad: int) -> jax.Array:
    """Edge-replication padding on H and W of an NHWC tensor
    (reference pads with ReplicationPad2d, custom_conv_layers.py:145-153)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def _nonlinearity(name: str, ch: int) -> Optional[Callable]:
    # "gdn@16" / "gdn_inverse@16": multiplier clamp (ops/gdn.py:gdn_apply)
    # "...!lp" suffix: low-precision parameter path (inference codecs —
    # see gdn_apply lowp)
    lowp = False
    if name.startswith("gdn") and name.endswith("!lp"):
        name = name[:-3]
        lowp = True
    clamp = 0.0
    if name.startswith("gdn") and "@" in name:
        name, c = name.split("@", 1)
        clamp = float(c)
    if name == "gdn":
        return GDN(ch, inverse=False, clamp=clamp, lowp=lowp)
    if name == "gdn_inverse":
        return GDN(ch, inverse=True, clamp=clamp, lowp=lowp)
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "relu":
        return jax.nn.relu
    if name == "no":
        return None
    raise ValueError(f"unknown non-linearity {name!r}")


class ConvBlock(nn.Module):
    """Replication-pad + conv + nonlinearity
    (reference CustomConvLayer, custom_conv_layers.py:129-180).

    s2d=True (stride-2, k=5 only): compute the conv as a space-to-depth
    stride-1 3x3 conv.  A stride-2 k5 conv on a FEW-CHANNEL full-res
    input (the 3/6/9-channel frame concats feeding every analysis
    transform) is the worst conv shape on the MXU — measured ~80x off
    roofline at 1080p (g_a_ref ConvBlock_0 = 17.5 ms of the mof_synth
    stage, scripts/dump_synth_hlo.py).  Folding the 2x2 stride phases
    into channels (C -> 4C, kernel 5x5 -> 3x3 with the taps rearranged
    and 2 of 36 zero) quadruples the contraction depth and removes the
    full-res few-channel tensor from the conv entirely.  Same
    parameters, same sums up to reassociation — an inference
    compute-schedule switch like LanePackedConv.
    """

    out_ft: int
    k_size: int = 5
    stride: int = 1
    non_linearity: str = "leaky_relu"
    dtype: str = "float32"
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.k_size // 2
        x = replication_pad(x, pad)
        if (self.s2d and self.stride == 2 and self.k_size == 5
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            x = S2DConv(self.out_ft, (5, 5), padding="VALID",
                        dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.out_ft, (self.k_size, self.k_size),
                        strides=(self.stride, self.stride), padding="VALID",
                        dtype=self.dtype, name="Conv_0")(x)
        nl = _nonlinearity(self.non_linearity, self.out_ft)
        return nl(x) if nl is not None else x


class S2DConv(nn.Conv):
    """nn.Conv drop-in (identical parameter tree) computing the padded
    VALID stride-2 k5 conv as a space-to-depth stride-1 3x3 conv.

    Derivation: out[y, x] = sum_dy,dx W5[dy, dx] . in[2y+dy, 2x+dx]
    with dy = 2*ka + py (ka in 0..2, py in 0..1) becomes a VALID 3x3
    conv over in2[r, s, (py, px, c)] = in[2r+py, 2s+px, c] with
    W3[ka, kb, (py, px, c), f] = W5[2ka+py, 2kb+px, c, f] (the dy=5 /
    dx=5 phantom taps are zero).  Same parameters, same per-output sums
    up to float reassociation (see ConvBlock.s2d)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        F = self.features
        kernel = self.param(
            "kernel", self.kernel_init, (5, 5, cin, F))
        bias = (self.param("bias", self.bias_init, (F,))
                if self.use_bias else None)
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        w5 = kernel.astype(dt)
        # [5,5,C,F] -> pad the tap grid to 6x6 -> (ka,py,kb,px,C,F)
        w = jnp.pad(w5, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w = w.reshape(3, 2, 3, 2, cin, F)
        w3 = jnp.transpose(w, (0, 2, 1, 3, 4, 5)).reshape(3, 3, 4 * cin, F)
        B, Hp, Wp, _ = x.shape
        x2 = x.reshape(B, Hp // 2, 2, Wp // 2, 2, cin)
        x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5))
        x2 = x2.reshape(B, Hp // 2, Wp // 2, 4 * cin)
        out = jax.lax.conv_general_dilated(
            x2, w3, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            out = out + bias.astype(dt)
        return out


def depth_to_space2(x: jax.Array) -> jax.Array:
    """[B, H, W, 4C] -> [B, 2H, 2W, C] pixel shuffle."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, 2 * H, 2 * W, C)


class LanePackedConv(nn.Conv):
    """nn.Conv drop-in (identical parameter tree) that computes a
    FEW-OUTPUT-CHANNEL conv as a lane-packed strided wide conv.

    A stride-1 KxK conv with F output channels lowers to a GEMM with
    N = F lanes; the MXU is 128 lanes wide, so the synthesis OUTPUT
    heads (F = 4*6 = 24 maps for MOFNet, 4*3 = 12 for CodecNet) cap MXU
    utilization at 19% / 9% — measured 7-8% of peak at 1080p
    (scripts/conv_probe.py, the worst stage of the round-3 profile).

    Packing G adjacent output COLUMNS into the lane dim fixes the shape:
    the kernel widens to K+G-1 taps (tap g..g+K-1 holds output g's
    weights, zero elsewhere), the conv strides G columns, and produces
    G*F channels that reshape back to the original layout.  FLOPs grow
    (K+G-1)/K but lane utilization grows G-fold: at F=12, G=8 the GEMM
    runs 96/128 lanes instead of 12/128 — ~3x net.  Same math, same
    parameters; accumulation order differs, so outputs match the plain
    conv only to float tolerance (enc/dec share programs, so the
    closed-loop bit-exactness contract is unaffected).
    """

    pack: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k_h, k_w = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k_h, k_w, cin, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        G = self.pack
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        B, H, Wp, _ = x.shape
        W = Wp - (k_w - 1)  # VALID output width of the plain conv
        if G <= 1 or W % G:
            out = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            F = self.features
            wide = jnp.zeros((k_h, k_w + G - 1, cin, G, F), dt)
            for g in range(G):
                wide = wide.at[:, g:g + k_w, :, g, :].set(kernel)
            wide = wide.reshape(k_h, k_w + G - 1, cin, G * F)
            out = jax.lax.conv_general_dilated(
                x, wide, (1, G), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = out.reshape(B, H - (k_h - 1), W // G, G, F)
            out = out.reshape(B, H - (k_h - 1), W, F)
        if bias is not None:
            out = out + bias.astype(dt)
        return out


def head_lane_pack_auto(out_ft: int) -> int:
    """Largest power-of-2 G with G*4*out_ft <= 128 (the padded frame
    width is a multiple of 64, so W/2 divides by every such G)."""
    g = 1
    while 2 * g * 4 * out_ft <= 128:
        g *= 2
    return g


class UpBlock(nn.Module):
    """Exact x2 upsampling + nonlinearity
    (role of the reference UpscalingLayer, custom_conv_layers.py:183-253).

    mode='shuffle' (default): conv to 4x channels + depth-to-space — the
    TPU-native choice; stride-2 transposed convs lower to input-dilated
    convolutions that waste 4x MXU work on inserted zeros.
    mode='tconv': the reference-style transposed conv.
    lane_pack=G > 1: route the conv through LanePackedConv (few-output
    heads only; see its docstring).
    skip_dts: return the conv output WITHOUT depth-to-space
    ([B, H, W, 4*out_ft] at the input resolution) so the caller can fold
    the shuffle into its own layout transform (the channel-major maps
    head, models/fullnet.py:_mofnet_maps_cm).  Only valid for shuffle
    mode with non_linearity='no' (the nonlinearity is per-output-channel
    and must see the shuffled layout).
    """

    out_ft: int
    k_size: int = 5
    non_linearity: str = "leaky_relu"
    dtype: str = "float32"
    mode: str = "shuffle"
    lane_pack: int = 0
    skip_dts: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.skip_dts:
            assert self.mode == "shuffle" and self.non_linearity == "no"
        if self.mode == "shuffle":
            pad = self.k_size // 2
            x = replication_pad(x, pad)
            # Both branches scope their parameters under "Conv_0", so
            # checkpoints load identically whichever path is active.
            if self.lane_pack > 1:
                x = LanePackedConv(4 * self.out_ft,
                                   (self.k_size, self.k_size),
                                   padding="VALID", dtype=self.dtype,
                                   pack=self.lane_pack, name="Conv_0")(x)
            else:
                x = nn.Conv(4 * self.out_ft, (self.k_size, self.k_size),
                            padding="VALID", dtype=self.dtype,
                            name="Conv_0")(x)
            if self.skip_dts:
                return x
            x = depth_to_space2(x)
        else:
            x = nn.ConvTranspose(self.out_ft, (self.k_size, self.k_size),
                                 strides=(2, 2), padding="SAME",
                                 dtype=self.dtype)(x)
        nl = _nonlinearity(self.non_linearity, self.out_ft)
        return nl(x) if nl is not None else x


class ResBlock(nn.Module):
    """pad-conv-relu-pad-conv with relu(x + f(x))
    (reference: custom_conv_layers.py:112-126)."""

    nb_ft: int
    k_size: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ConvBlock(self.nb_ft, self.k_size, non_linearity="relu",
                      dtype=self.dtype)(x)
        h = ConvBlock(self.nb_ft, self.k_size, non_linearity="no",
                      dtype=self.dtype)(h)
        return jax.nn.relu(x + h)


class ChengResBlock(nn.Module):
    """Residual blocks from Cheng et al. 2019: plain / down (stride-2 + GDN,
    1x1-stride-2 skip) / up (tconv + IGDN, tconv skip)
    (reference: custom_conv_layers.py:21-109)."""

    nb_ft: int
    mode: str = "plain"  # 'plain' | 'down' | 'up'

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode == "plain":
            h = ConvBlock(self.nb_ft, 3, non_linearity="leaky_relu")(x)
            h = ConvBlock(self.nb_ft, 3, non_linearity="leaky_relu")(h)
            return x + h
        if self.mode == "down":
            h = ConvBlock(self.nb_ft, 3, stride=2, non_linearity="leaky_relu")(x)
            h = ConvBlock(self.nb_ft, 3, non_linearity="gdn")(h)
            skip = nn.Conv(self.nb_ft, (1, 1), strides=(2, 2))(x)
            return skip + h
        if self.mode == "up":
            h = UpBlock(self.nb_ft, 3, non_linearity="leaky_relu")(x)
            h = ConvBlock(self.nb_ft, 3, non_linearity="gdn_inverse")(h)
            skip = UpBlock(self.nb_ft, 3, non_linearity="no")(x)
            return skip + h
        raise ValueError(f"unknown ChengResBlock mode {self.mode!r}")


class SimplifiedAttention(nn.Module):
    """Cheng-style trunk * sigmoid(attention) + x
    (reference: src/layers/misc/attention.py:45-97)."""

    nb_ft: int
    k_size: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        trunk = x
        for _ in range(3):
            trunk = ResBlock(self.nb_ft, self.k_size, self.dtype)(trunk)
        attn = x
        for _ in range(3):
            attn = ResBlock(self.nb_ft, self.k_size, self.dtype)(attn)
        attn = nn.Conv(self.nb_ft, (1, 1), dtype=self.dtype)(attn)
        attn = jax.nn.sigmoid(attn)
        return trunk * attn + x


# ---------------------------------------------------------------------------
# YUV420 <-> 444 boundary layers
# ---------------------------------------------------------------------------

def yuv420_to_444(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Nearest-upsample U,V x2 and crop to Y size, concat to 3 channels
    (reference InputLayer, src/layers/ae/ae_layers.py:17-35).

    y: [B, H, W, 1]; u, v: [B, ceil(H/2), ceil(W/2), 1] -> [B, H, W, 3].
    """
    H, W = y.shape[1], y.shape[2]
    uv = jnp.concatenate([u, v], axis=-1)
    uv = jnp.repeat(jnp.repeat(uv, 2, axis=1), 2, axis=2)[:, :H, :W, :]
    return jnp.concatenate([y, uv], axis=-1)


def x444_to_yuv420(x: jax.Array):
    """Split a 4:4:4 tensor into a YUV420 triple.

    U and V are downscaled x0.5 with bilinear/align_corners=False semantics,
    which for an exact factor of two reduces to 2x2 mean pooling
    (reference OutputLayer, src/layers/ae/ae_layers.py:38-56).  Odd sizes are
    handled upstream by padding to PAD_MULTIPLE and cropping via data_dim.
    """
    y = x[..., 0:1]
    uv = x[..., 1:3]
    B, H, W, _ = uv.shape
    uv = uv.reshape(B, H // 2, 2, W // 2, 2, 2).mean(axis=(2, 4))
    return y, uv[..., 0:1], uv[..., 1:2]
