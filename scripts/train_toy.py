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


def make_batch(rng: np.random.Generator, n_frames: int, batch: int, size: int):
    """[n_frames, B, size, size, 3] float32 moving-texture clips."""
    out = np.empty((n_frames, batch, size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for b in range(batch):
        n_waves = 6
        fx = rng.uniform(0.02, 0.35, (3, n_waves))
        fy = rng.uniform(0.02, 0.35, (3, n_waves))
        ph = rng.uniform(0, 6.28, (3, n_waves))
        amp = rng.uniform(0.05, 0.4, (3, n_waves))
        vx, vy = rng.uniform(-2.5, 2.5, 2)
        for t in range(n_frames):
            for c in range(3):
                acc = np.zeros((size, size), np.float32)
                for w in range(n_waves):
                    acc += amp[c, w] * np.sin(
                        fx[c, w] * (xx + vx * t) + fy[c, w] * (yy + vy * t)
                        + ph[c, w])
                out[t, b, :, :, c] = acc
    out = (out - out.min()) / max(float(np.ptp(out)), 1e-6)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--model", default="tiny", choices=["tiny", "base"])
    ap.add_argument("--gop", default="1_GOP_2")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="")
    ap.add_argument("--dist", default="mse")
    ap.add_argument("--log_every", type=int, default=20)
    args = ap.parse_args()

    from aivc_tpu.config import ModelConfig
    from aivc_tpu.gop import generate_gop_struct
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.train.trainer import make_optimizer, make_train_step
    from aivc_tpu.utils.checkpoint import save_checkpoint

    cfg = TINY if args.model == "tiny" else ModelConfig()
    model, params = init_fullnet(cfg)
    gop = generate_gop_struct(args.gop)
    opt = make_optimizer(args.lr)
    opt_state = opt.init(params)
    step_fn = make_train_step(model, cfg, gop, opt, dist_loss=args.dist)

    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)
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

    if args.out:
        save_checkpoint(args.out, cfg, params)
        print(f"saved checkpoint to {args.out}")


if __name__ == "__main__":
    main()
