"""FullNet: the per-frame video codec (MOFNet + motion comp + CodecNet).

First-class implementation of the reference's ghost FullNet (pickle-only;
interface reconstructed in SURVEY.md §2.3 from
reference: src/real_life/decode.py:429-580 and
src/model_mngt/model_management.py:307-320).

Per-frame dataflow (mirrors the decoder reconstruction, decode.py:492-553):

  P/B frames:
    mofnet codes cat(frame, prev, next) conditioned on cat(prev, next)
      -> 6 maps: alpha, beta, v_prev(2), v_next(2)   (decode.py:730-735)
      -> P forces beta = 1, v_next = 0               (decode.py:737-739)
    x_warp = beta * warp(prev, v_prev) + (1-beta) * warp(next, v_next)
    skip   = (1 - alpha) * x_warp                    (decode.py:536)
    codecnet codes cat(frame, alpha*x_warp) conditioned on alpha*x_warp
    x_hat  = codecnet_out + skip                     (decode.py:549)
  I frames:
    alpha = 1, x_warp = 0, skip = 0; codecnet unconditioned
                                                     (decode.py:500-504)

All tensors are padded 4:4:4 NHWC; YUV420 conversion and cropping to the
true frame size happen in the pipeline layer.  frame_type is static, so
XLA compiles three specializations instead of branching at runtime.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from aivc_tpu.config import FRAME_B, FRAME_I, FRAME_P, ModelConfig
from aivc_tpu.models.conditional import ConditionalNet
from aivc_tpu.ops.warp import (
    motion_compensation,
    pack_yuv_u32,
    warp,
    warp_packed,
)


def _motion_comp(prev, nxt, v_prev, v_next, beta, frame_type: int):
    """Frame-type-specialized motion compensation: P-frames have beta
    forced to 1 and v_next to 0 (reference: decode.py:737-739), so the
    second warp is a no-op — skip it entirely (one 40 ms gather saved per
    P-frame at 1080p)."""
    if frame_type == FRAME_P:
        return warp(prev, v_prev)
    return motion_compensation(prev, nxt, v_prev, v_next, beta)


def _mofnet_maps(out6: jax.Array, frame_type: int,
                 flow_bound: float = 0.0):
    """Split MOFNet synthesis output into alpha/beta/flows
    (reference: decode.py:730-739).

    flow_bound > 0 applies v = B * softsign(raw / B): |v| stays below B
    pixels and d v/d raw = (1 + |raw|/B)^-2 is never zero, so a flow that
    drifts out of range can always be pulled back by the distortion
    gradient.  The reference's raw linear flows (flow_bound = 0) were
    observed to die irrecoverably: the border-clamped bilinear warp has
    ZERO gradient once a flow points outside the frame, and trained
    checkpoints ended with every flow ~1e32 — motion compensation
    silently degraded to warped border pixels (intra-only behaviour)."""
    if flow_bound > 0.0:
        # Saturating-but-never-flat maps: the hard clip(x + 0.5) the
        # reference uses for alpha/beta has zero gradient outside
        # [-0.5, 0.5] and was observed saturated EVERYWHERE (binary
        # masks from ~1e33 logits) — sigmoid(4x) matches its slope at 0
        # and keeps the mask trainable.
        alpha = jax.nn.sigmoid(4.0 * out6[..., 0:1])
        beta = jax.nn.sigmoid(4.0 * out6[..., 1:2])
        b = jnp.asarray(flow_bound, out6.dtype)
        v_prev = out6[..., 2:4]
        v_next = out6[..., 4:6]
        v_prev = v_prev / (1.0 + jnp.abs(v_prev) / b)
        v_next = v_next / (1.0 + jnp.abs(v_next) / b)
    else:
        alpha = jnp.clip(out6[..., 0:1] + 0.5, 0.0, 1.0)
        beta = jnp.clip(out6[..., 1:2] + 0.5, 0.0, 1.0)
        v_prev = out6[..., 2:4]
        v_next = out6[..., 4:6]
    if frame_type == FRAME_P:
        beta = jnp.ones_like(beta)
        v_next = jnp.zeros_like(v_next)
    return alpha, beta, v_prev, v_next


def _mofnet_maps_cm(out24: jax.Array, frame_type: int,
                    flow_bound: float = 0.0) -> jax.Array:
    """Channel-major variant of ``_mofnet_maps``: the PRE-depth-to-space
    head output [B, H/2, W/2, 24] -> processed maps [B, 6, H, W], plane
    order [alpha, beta, u_prev, v_prev, u_next, v_next].

    The pixel shuffle and the NHWC->NCHW transpose fuse into ONE data
    movement (the legacy path pays the shuffle, then relayouts every
    1-2-channel slice), and all map elementwise ops run on (H, W)-minor
    planes — full 128-lane tiles instead of 6/128 (config.py:maps_cm).
    Same values as ``_mofnet_maps`` up to float reassociation.
    """
    B, h, w, C4 = out24.shape
    C = C4 // 4  # 6 maps
    # depth_to_space2 factors channel k as (i, j, c), k = i*2C + j*C + c,
    # out[2y+i, 2x+j, c] = in[y, x, k]; produce out_cm[c, 2y+i, 2x+j].
    m = out24.reshape(B, h, w, 2, 2, C)
    m = jnp.transpose(m, (0, 5, 1, 3, 2, 4)).reshape(B, C, 2 * h, 2 * w)
    if flow_bound > 0.0:
        alpha = jax.nn.sigmoid(4.0 * m[:, 0:1])
        beta = jax.nn.sigmoid(4.0 * m[:, 1:2])
        b = jnp.asarray(flow_bound, m.dtype)
        v_prev = m[:, 2:4]
        v_next = m[:, 4:6]
        v_prev = v_prev / (1.0 + jnp.abs(v_prev) / b)
        v_next = v_next / (1.0 + jnp.abs(v_next) / b)
    else:
        alpha = jnp.clip(m[:, 0:1] + 0.5, 0.0, 1.0)
        beta = jnp.clip(m[:, 1:2] + 0.5, 0.0, 1.0)
        v_prev = m[:, 2:4]
        v_next = m[:, 4:6]
    if frame_type == FRAME_P:
        beta = jnp.ones_like(beta)
        v_next = jnp.zeros_like(v_next)
    return jnp.concatenate([alpha, beta, v_prev, v_next], axis=1)


class FullNet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.mofnet = ConditionalNet(self.cfg.mofnet)
        self.codecnet = ConditionalNet(self.cfg.codecnet)

    # ------------------------------------------------------------------
    # Encoder-side full forward for one frame
    # ------------------------------------------------------------------
    def forward_frame(self, frame: jax.Array, prev: jax.Array, nxt: jax.Array,
                      idx_rate, frame_type: int, training: bool = False,
                      rng: Optional[jax.Array] = None):
        """Code one padded 4:4:4 frame given (possibly zero) references.

        Returns (x_hat444, aux) where aux carries everything the loss and
        the bitstream writer need: quantized latents, sigmas, rate maps,
        alpha/beta/x_warp.
        """
        B, H, W, _ = frame.shape
        aux = {}

        if frame_type == FRAME_I:
            alpha = jnp.ones((B, H, W, 1), frame.dtype)
            x_warp = jnp.zeros_like(frame)
            skip = jnp.zeros_like(frame)
            pred = jnp.zeros_like(frame)
            aux["mof"] = None
        else:
            rng_m = rng_c = None
            if training:
                rng_m, rng_c = jax.random.split(rng)
                rng = rng_c
            mof_in = jnp.concatenate([frame, prev, nxt], axis=-1)
            shortcut = (jnp.concatenate([prev, nxt], axis=-1)
                        if frame_type == FRAME_B else None)
            out6, mof_lat = self.mofnet(
                mof_in, shortcut, idx_rate, frame_type, training, rng_m)
            alpha, beta, v_prev, v_next = _mofnet_maps(
                out6, frame_type, self.cfg.flow_bound)
            x_warp = _motion_comp(prev, nxt, v_prev, v_next, beta, frame_type)
            skip = (1.0 - alpha) * x_warp
            pred = alpha * x_warp
            aux["mof"] = mof_lat
            aux["beta"] = beta
            aux["v_prev"] = v_prev
            aux["v_next"] = v_next
            # PRE-map synthesis logits, ALL SIX channels: once |raw| >>
            # flow_bound the warp and softsign gradients are ~zero, so
            # the only signal that can pull an exploded head back is an
            # explicit penalty on raw (train/loss.py flow_penalty) —
            # Adam normalizes its tiny-but-consistent gradient to full
            # step size.  alpha/beta logits are included because their
            # saturation objective (sigmoid never reaches exactly 1)
            # drags the SHARED output scale upward without bound, and
            # the flow channels ride the same trunk (exploded ckpts
            # measured alpha logits ~2e16 alongside ~1e16 flows).
            aux["flow_raw"] = out6

        cod_in = jnp.concatenate([frame, pred], axis=-1)
        cod_shortcut = pred if frame_type != FRAME_I else None
        cod_out, cod_lat = self.codecnet(
            cod_in, cod_shortcut, idx_rate, frame_type, training, rng)

        x_hat = cod_out + skip
        aux["cod"] = cod_lat
        aux["alpha"] = alpha
        aux["x_warp"] = x_warp
        if frame_type == FRAME_I:
            aux["beta"] = jnp.ones_like(alpha)
        return x_hat, aux

    # ------------------------------------------------------------------
    # Granular stage methods, shared verbatim by encoder and decoder so
    # both sides run identical compiled programs (see ConditionalNet.analyze
    # docstring).  The host range coder sits between the stages: z is
    # decoded before sigma exists, y before synthesis.
    # ------------------------------------------------------------------
    def mof_analyze(self, frame, prev, nxt, idx_rate, frame_type: int):
        mof_in = jnp.concatenate([frame, prev, nxt], axis=-1)
        return self.mofnet.analyze(mof_in, idx_rate, frame_type)

    def cod_analyze(self, frame, pred, idx_rate, frame_type: int):
        cod_in = jnp.concatenate([frame, pred], axis=-1)
        return self.codecnet.analyze(cod_in, idx_rate, frame_type)

    def mofnet_hyper(self, z_q):
        return self.mofnet.hyper_decode(z_q)

    def codecnet_hyper(self, z_q):
        return self.codecnet.hyper_decode(z_q)

    def mofnet_synth_maps(self, y_cq, mu, prev, nxt, idx_rate,
                          frame_type: int):
        """MOFNet synthesis -> alpha/beta/flow maps (no warp).

        The warp gather lives in its own compiled program
        (motion_comp_stage): fused into the synthesis graph, XLA's
        scheduling makes the gather several times slower than the
        standalone op (measured at 1080p on v5e)."""
        shortcut = (jnp.concatenate([prev, nxt], axis=-1)
                    if frame_type == FRAME_B else None)
        out = self.mofnet.synthesize(y_cq, mu, shortcut, idx_rate, frame_type)
        if getattr(self.cfg.mofnet, "maps_cm", False):
            # Channel-major schedule: ONE [B, 6, H, W] planes tensor
            # (config.py:maps_cm; out is the pre-dts head output here).
            return _mofnet_maps_cm(out, frame_type, self.cfg.flow_bound)
        alpha, beta, v_prev, v_next = _mofnet_maps(
            out, frame_type, self.cfg.flow_bound)
        return alpha, beta, v_prev, v_next

    @staticmethod
    def motion_comp_stage(prev, nxt, alpha, beta, v_prev, v_next,
                          frame_type: int, warp_engine: str = "packed",
                          flow_bound: int = 0):
        """Warp + blend + skip/pred split, standalone (inference pipeline).

        warp_engine 'packed' (default): byte-packed single-gather warp —
        one 16-byte-row gather per pixel (ops/warp.py:warp_packed).
        'bounded': the windowed Pallas kernel for flow_bound models —
        the gather is latency-bound at ~16 ns/pixel (~33 ms per 1080p
        frame, the top encode stage in the round-3 profile), while the
        windowed kernel runs at vector rate (ops/warp_pallas.py).
        Training (forward_frame) keeps the float warp for
        differentiability."""
        from aivc_tpu.ops.warp import mc_warp

        if frame_type == FRAME_P:
            x_warp = mc_warp(pack_yuv_u32(prev), v_prev, warp_engine,
                             flow_bound)
        else:
            pw = mc_warp(pack_yuv_u32(prev), v_prev, warp_engine,
                         flow_bound)
            nw = mc_warp(pack_yuv_u32(nxt), v_next, warp_engine,
                         flow_bound)
            x_warp = beta * pw + (1.0 - beta) * nw
        x_warp = x_warp.astype(prev.dtype)
        pred = alpha * x_warp
        skip = (1.0 - alpha) * x_warp
        return {"alpha": alpha, "beta": beta, "x_warp": x_warp,
                "pred": pred, "skip": skip,
                "alpha_mean": jnp.mean(alpha, axis=(1, 2, 3)),
                "beta_mean": jnp.mean(beta, axis=(1, 2, 3))}

    @staticmethod
    def motion_comp_stage_cm(prev, nxt, maps6, frame_type: int,
                             warp_engine: str = "packed",
                             flow_bound: int = 0):
        """Channel-major counterpart of ``motion_comp_stage``: ``maps6``
        is [B, 6, H, W] from ``_mofnet_maps_cm``; flows reach the warp as
        (u, v) planes so no channel-last flow tensor is ever
        materialized, and only the tensors inference actually consumes
        (pred/skip/means) are program outputs — the legacy stage
        materializes alpha/beta/x_warp full-res maps nobody reads
        (~380 MB of HBM writes per wave-8 1080p call)."""
        from aivc_tpu.ops.warp import mc_warp

        alpha = maps6[:, 0]  # [B, H, W] planes
        beta = maps6[:, 1]
        vp = (maps6[:, 2], maps6[:, 3])
        vn = (maps6[:, 4], maps6[:, 5])
        if frame_type == FRAME_P:
            x_warp = mc_warp(pack_yuv_u32(prev), vp, warp_engine,
                             flow_bound)
        else:
            pw = mc_warp(pack_yuv_u32(prev), vp, warp_engine, flow_bound)
            nw = mc_warp(pack_yuv_u32(nxt), vn, warp_engine, flow_bound)
            b3 = beta[..., None]
            x_warp = b3 * pw + (1.0 - b3) * nw
        x_warp = x_warp.astype(prev.dtype)
        a3 = alpha[..., None]
        return {"pred": a3 * x_warp, "skip": (1.0 - a3) * x_warp,
                "alpha_mean": jnp.mean(alpha, axis=(1, 2)),
                "beta_mean": jnp.mean(beta, axis=(1, 2))}

    def mofnet_synth(self, y_cq, mu, prev, nxt, idx_rate, frame_type: int):
        """MOFNet synthesis + motion compensation -> prediction and skip.
        (Single-program variant; the pipeline uses the split stages.)"""
        maps = self.mofnet_synth_maps(
            y_cq, mu, prev, nxt, idx_rate, frame_type)
        if getattr(self.cfg.mofnet, "maps_cm", False):
            return self.motion_comp_stage_cm(prev, nxt, maps, frame_type)
        alpha, beta, v_prev, v_next = maps
        return self.motion_comp_stage(prev, nxt, alpha, beta, v_prev,
                                      v_next, frame_type)

    def codecnet_synth(self, y_cq, mu, pred, skip, idx_rate, frame_type: int):
        shortcut = pred if frame_type != FRAME_I else None
        out = self.codecnet.synthesize(y_cq, mu, shortcut, idx_rate, frame_type)
        return out + skip

    # ------------------------------------------------------------------
    def init_all(self, frame, prev, nxt):
        """Touch every submodule and gain matrix so init() creates the full
        parameter tree (I, P and B paths)."""
        _ = self.forward_frame(frame, prev, nxt, 0.0, FRAME_I)
        _ = self.forward_frame(frame, prev, nxt, 0.0, FRAME_P)
        x, aux = self.forward_frame(frame, prev, nxt, 0.0, FRAME_B)
        return x
