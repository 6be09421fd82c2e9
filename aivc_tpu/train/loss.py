"""Rate-distortion loss over a GOP (training path).

Re-implements the reference loss semantics
(reference: src/model_mngt/loss_function.py:103-257):
  loss = sum_frames [ l_codec * R_codec + l_mof * R_mode + D ]
with D = MSE or (1 - MS-SSIM) on pixel-count-weighted YUV planes,
I-frame weighting, and padded frames contributing rate but not
distortion (loss_function.py:292-311).

The GOP walk is unrolled in coding order inside one jit: frame types and
the dependency DAG are static, references flow through the reconstruction
(x_hat) so gradients reach MOFNet through the temporal chain.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from aivc_tpu.config import FRAME_B, FRAME_I
from aivc_tpu.gop import GopStruct
from aivc_tpu.models.fullnet import FullNet
from aivc_tpu.ops.layers import x444_to_yuv420
from aivc_tpu.ops.metrics import yuv_mse, yuv_msssim


def _to_yuv(x444):
    y, u, v = x444_to_yuv420(x444)
    return {"y": y, "u": u, "v": v}


def gop_rd_loss(model: FullNet, params, frames444: List[jax.Array],
                gop: GopStruct, idx_rate: int, rng: jax.Array,
                l_codec: float, l_mof: float,
                dist_loss: str = "mse",
                weight_i_frame_loss: float = 1.0,
                nb_pad_frame: int = 0,
                training: bool = True,
                flow_penalty: float = 0.0,
                alpha_penalty: float = 0.0):
    """frames444: list of [B, H, W, 3] padded frames in display order.

    Returns (loss, metrics dict).
    """
    n = len(gop)
    B, H, W, _ = frames444[0].shape
    nb_pixel = H * W

    recon: Dict[int, jax.Array] = {}
    zeros = jnp.zeros_like(frames444[0])

    total_loss = 0.0
    logs = {"rate_bpp": 0.0, "mode_rate_bpp": 0.0, "codec_rate_bpp": 0.0,
            "mse": 0.0, "dist": 0.0, "dist_pure": 0.0}
    n_dist = n - nb_pad_frame
    # Motion-liveness telemetry: mean/max |flow| over inter frames.
    # Round 3's motion path silently re-exploded to ~1e16 px flows
    # mid-training (border-clamped warp => dead gradients => intra-only
    # behaviour) and nothing in the logs showed it; these two scalars
    # make the failure visible the step it starts.
    flow_sum = jnp.float32(0.0)
    flow_max = jnp.float32(0.0)
    alpha_sum = jnp.float32(0.0)
    n_inter = 0

    for step, spec in enumerate(gop.coding_order):
        rng, rng_f = jax.random.split(rng)
        frame = frames444[spec.idx]
        prev = recon.get(spec.prev_ref, zeros) if spec.prev_ref is not None else zeros
        nxt = recon.get(spec.next_ref, zeros) if spec.next_ref is not None else zeros

        x_hat, aux = model.apply(
            params, frame, prev, nxt,
            jnp.asarray(idx_rate, jnp.float32), spec.frame_type,
            training, rng_f, method=FullNet.forward_frame)
        # The REFERENCE chain sees pixel-range reconstructions, as at
        # inference time (the decoder's 256-level cast clips to [0, 1],
        # pipeline/codec.py; reference clamps via nn_util.py:83-97 +
        # model_management.py:321-326).  Training on the unclamped chain
        # let a single excursion amplify through the GOP: one blow-up
        # batch produced |x_hat| ~ 1e8 activations downstream, MS-SSIM
        # > 1 (negative loss) and grad norms ~ 1e8 (observed round 2,
        # steps ~1900).  Distortion still reads the unclamped x_hat so
        # out-of-range output is penalized rather than hidden.
        recon[spec.idx] = jnp.clip(x_hat, 0.0, 1.0)

        cod = aux["cod"]
        codec_rate = (cod["rate_y"].sum() + cod["rate_z"].sum()) / (B * nb_pixel)
        if aux["mof"] is not None:
            mof = aux["mof"]
            mode_rate = (mof["rate_y"].sum() + mof["rate_z"].sum()) / (B * nb_pixel)
            # Both flow halves: a B-frame explosion confined to v_next
            # would be invisible to v_prev-only telemetry (and would
            # bypass the trainer's flow-health abort).  P-frames force
            # v_next = 0, so only B-frames concatenate it.
            if spec.frame_type == FRAME_B:
                av = jnp.abs(jnp.concatenate(
                    [aux["v_prev"], aux["v_next"]], axis=-1))
            else:
                av = jnp.abs(aux["v_prev"])
            flow_sum = flow_sum + jnp.mean(av)
            flow_max = jnp.maximum(flow_max, jnp.max(av))
            alpha_sum = alpha_sum + jnp.mean(aux["alpha"])
            n_inter += 1
            if alpha_penalty > 0.0:
                # Coding-mode revival (round-4): alpha has sat at exactly
                # 1.0 since ~step 4k of every run — at logit ~5+ the
                # sigmoid(4x) gradient is ~1e-8, so even on truly static
                # scenes (where skip = x_warp is a free exact
                # reconstruction) the RD gradient cannot walk alpha back.
                # softplus on the POSITIVE side of the logit restores a
                # non-vanishing downward pull (-> ~4w at saturation,
                # ~0 for alpha < 0.5, so it never forces skip mode);
                # once logits re-enter the trainable zone the RD
                # objective decides per-pixel.  Adam normalizes the
                # small-but-consistent gradient to a full step, same
                # mechanism as flow_penalty.
                total_loss = total_loss + alpha_penalty * jnp.mean(
                    jax.nn.softplus(
                        4.0 * aux["flow_raw"][..., 0:1]).astype(jnp.float32))
            if flow_penalty > 0.0:
                # Penalty on the PRE-bound logits: the round-3 explosion
                # mode drives |raw| to ~1e3+ where warp clipping and
                # softsign saturation zero every task gradient; |raw| is
                # the one lever with a nonzero pull-back everywhere.
                # Negligible when healthy (mean |raw| <~ 1).
                total_loss = total_loss + flow_penalty * jnp.mean(
                    jnp.abs(aux["flow_raw"]).astype(jnp.float32))
        else:
            mode_rate = jnp.float32(0.0)

        is_padded = spec.idx >= n - nb_pad_frame
        if is_padded:
            dist = jnp.float32(0.0)
            mse = jnp.float32(0.0)
            dist_pure = jnp.float32(0.0)
        else:
            yuv_hat = _to_yuv(x_hat)
            yuv_ref = _to_yuv(frame)
            mse = yuv_mse(yuv_hat, yuv_ref)
            if dist_loss == "ms_ssim":
                # MS-SSIM is nearly blind to DC/luminance offsets (only
                # the last scale carries a luminance term): a state with
                # x_hat = frame + 0.45 scores ~0.97 MS-SSIM at 7 dB
                # PSNR, and pure-MS-SSIM training drifted into exactly
                # that every few hundred steps (loss 0.06, psnr 7,
                # recurring "collapse" round 3 never root-caused).  A
                # small MSE anchor prices the offset (healthy mse ~1e-3
                # adds ~1% of dist; the offset state adds ~0.05) without
                # changing the RD objective materially.
                # dist_pure = the un-anchored reference objective
                # (1 - msssim), logged separately so eval comparisons
                # against reference numbers stay apples-to-apples; the
                # OPTIMIZED dist keeps the MSE anchor.
                dist_pure = 1.0 - yuv_msssim(yuv_hat, yuv_ref)
                dist = dist_pure + 0.25 * mse
            else:
                dist = mse
                dist_pure = mse

        cur = l_codec * codec_rate + l_mof * mode_rate + dist
        if spec.frame_type == FRAME_I:
            cur = cur * weight_i_frame_loss
        total_loss = total_loss + cur

        logs["rate_bpp"] += codec_rate + mode_rate
        logs["mode_rate_bpp"] += mode_rate
        logs["codec_rate_bpp"] += codec_rate
        logs["mse"] += mse
        logs["dist"] += dist
        logs["dist_pure"] += dist_pure

    logs = {k: v / n for k, v in logs.items()}
    # Distortion averages exclude padded frames
    # (reference: loss_function.py:307-328)
    if n_dist > 0:
        logs["mse"] = logs["mse"] * n / n_dist
        logs["dist"] = logs["dist"] * n / n_dist
        logs["dist_pure"] = logs["dist_pure"] * n / n_dist
    logs["psnr"] = 10.0 * jnp.log10(1.0 / jnp.maximum(logs["mse"], 1e-12))
    logs["flow_mag"] = flow_sum / max(n_inter, 1)
    logs["flow_max"] = flow_max
    # Mask telemetry: the recurring forward collapse (PSNR ~8 with
    # NORMAL bpp) pattern-matches a mask degeneracy (alpha -> 0 turns
    # x_hat into codecnet_out + x_warp, roughly doubling the frame);
    # logging mean alpha localizes it the step it starts.
    logs["alpha_mean"] = alpha_sum / max(n_inter, 1)
    return total_loss, logs
