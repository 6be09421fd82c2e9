"""Toy training run on synthetic video (smoke-scale, no external data).

Trains the codec end-to-end (RD loss over a small hierarchical GOP) on
procedurally generated moving textures — translating mixtures of sinusoids
and filtered noise with global + local motion.  This is NOT a substitute
for training on natural video; it exists to (a) drive the training
subsystem end-to-end on real hardware, (b) produce non-degenerate weights
so rate/elision/codec behavior in benchmarks resembles a trained model.

Usage:
  python scripts/train_toy.py --steps 200 --size 128 --model tiny \
      --out models_ckpt/tiny-toy
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _texture(rng: np.random.Generator, size: int, margin: int):
    """One static RGB texture [size+2m, size+2m, 3]: 1/f-ish filtered noise
    + sinusoid detail, per-channel correlated like natural images."""
    s2 = size + 2 * margin
    # spectral shaping: white noise -> 1/f amplitude falloff
    noise = rng.normal(size=(s2, s2))
    f = np.fft.fftfreq(s2)
    rad = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2) + 1.0 / s2
    spec = np.fft.fft2(noise) / (rad ** rng.uniform(0.8, 1.6))
    luma = np.real(np.fft.ifft2(spec))
    luma = (luma - luma.min()) / max(float(np.ptp(luma)), 1e-6)
    # mild chroma variation around the luma (natural-video-like)
    tex = np.stack([
        luma,
        np.clip(luma * rng.uniform(0.6, 1.0) + rng.uniform(0.0, 0.3), 0, 1),
        np.clip(luma * rng.uniform(0.6, 1.0) + rng.uniform(0.0, 0.3), 0, 1),
    ], axis=-1).astype(np.float32)
    return tex


def make_batch(rng: np.random.Generator, n_frames: int, batch: int, size: int):
    """[n_frames, B, size, size, 3] float32 clips with natural-ish
    statistics: a 1/f-textured background under global translation plus a
    foreground patch with independent motion (occlusion/disocclusion), so
    MOFNet's flows, alpha mask and beta blending all get training signal.
    """
    margin = 16
    out = np.empty((n_frames, batch, size, size, 3), np.float32)
    for b in range(batch):
        bg = _texture(rng, size, margin)
        fg = _texture(rng, size, margin)
        # foreground ellipse mask
        cy, cx = rng.uniform(0.25, 0.75, 2) * size
        ry, rx = rng.uniform(0.12, 0.3, 2) * size
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        vbg = rng.uniform(-2.0, 2.0, 2)
        vfg = rng.uniform(-3.0, 3.0, 2)
        for t in range(n_frames):
            oy, ox = margin + vbg[0] * t, margin + vbg[1] * t
            iy = np.clip((yy + oy).astype(np.int32), 0, size + 2 * margin - 1)
            ix = np.clip((xx + ox).astype(np.int32), 0, size + 2 * margin - 1)
            frame = bg[iy, ix]
            fy_, fx_ = margin + vfg[0] * t, margin + vfg[1] * t
            jy = np.clip((yy + fy_).astype(np.int32), 0, size + 2 * margin - 1)
            jx = np.clip((xx + fx_).astype(np.int32), 0, size + 2 * margin - 1)
            mask = ((((yy - cy - vfg[0] * t) / ry) ** 2
                     + ((xx - cx - vfg[1] * t) / rx) ** 2) < 1.0)[..., None]
            out[t, b] = np.where(mask, fg[jy, jx], frame)
    # light sensor noise so rate never collapses to zero
    out = np.clip(out + rng.normal(scale=0.004, size=out.shape), 0.0, 1.0)
    return out.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--model", default="tiny",
                    choices=["tiny", "base", "bf16"])
    ap.add_argument("--gop", default="1_GOP_2")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="")
    ap.add_argument("--resume", default="",
                    help="checkpoint dir to initialize params from")
    ap.add_argument("--save_every", type=int, default=0,
                    help="also save a checkpoint every N steps")
    ap.add_argument("--dist", default="mse")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=20)
    args = ap.parse_args()

    from aivc_tpu.config import ModelConfig
    from aivc_tpu.gop import generate_gop_struct
    from aivc_tpu.models.zoo import BASE_BF16, TINY, init_fullnet
    from aivc_tpu.train.trainer import make_optimizer, make_train_step
    from aivc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = {"tiny": TINY, "base": ModelConfig(), "bf16": BASE_BF16}[args.model]
    model, params = init_fullnet(cfg)
    if args.resume:
        cfg_loaded, params = load_checkpoint(args.resume)
        print(f"resumed params from {args.resume} ({cfg_loaded.name})")
    gop = generate_gop_struct(args.gop)
    opt = make_optimizer(args.lr)
    opt_state = opt.init(params)
    step_fn = make_train_step(model, cfg, gop, opt, dist_loss=args.dist)

    rng_np = np.random.default_rng(args.seed)
    rng = jax.random.PRNGKey(args.seed)
    n_rates = len(cfg.lambda_tradeoff)

    t0 = time.time()
    for step in range(args.steps):
        frames = jnp.asarray(make_batch(rng_np, len(gop), args.batch, args.size))
        idx_rate = int(rng_np.integers(0, n_rates))
        rng, rng_s = jax.random.split(rng)
        params, opt_state, logs = step_fn(params, opt_state, frames,
                                          idx_rate, rng_s)
        if step % args.log_every == 0 or step == args.steps - 1:
            print(f"step {step:5d}  rate_idx {idx_rate}  "
                  f"loss {float(logs['loss']):.4f}  "
                  f"psnr {float(logs['psnr']):.2f}  "
                  f"bpp {float(logs['rate_bpp']):.4f}  "
                  f"gnorm {float(logs['grad_norm']):.2f}  "
                  f"({(time.time() - t0):.0f}s)", flush=True)
        if args.out and args.save_every and step and step % args.save_every == 0:
            save_checkpoint(args.out, cfg, params)
            print(f"checkpoint @ step {step} -> {args.out}", flush=True)

    if args.out:
        save_checkpoint(args.out, cfg, params)
        print(f"saved checkpoint to {args.out}")


if __name__ == "__main__":
    main()
