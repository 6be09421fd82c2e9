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


def _texture_1f(rng: np.random.Generator, s2: int):
    """One static RGB texture [s2, s2, 3]: 1/f-ish filtered noise,
    per-channel correlated like natural images."""
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


def _natural_pool():
    """Natural RGB images bundled with installed packages (the environment
    has no external video data): sklearn's two sample photos and
    matplotlib's grace_hopper.  float32 [H, W, 3] in [0, 1]."""
    pool = []
    try:
        from sklearn.datasets import load_sample_images

        for im in load_sample_images().images:
            pool.append(np.asarray(im, np.float32) / 255.0)
    except Exception:
        pass
    try:
        import matplotlib.cbook as cbook
        from PIL import Image

        with cbook.get_sample_data("grace_hopper.jpg") as f:
            pool.append(
                np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0)
    except Exception:
        pass
    return pool


_NATURAL = None


def _texture(rng: np.random.Generator, size: int, margin: int):
    """A texture for the clip generator: with probability ~0.6 a random
    crop (random flip / channel roll) of a bundled natural photo — real
    spatial statistics — otherwise procedural 1/f noise."""
    global _NATURAL
    if _NATURAL is None:
        _NATURAL = _natural_pool()
    s2 = size + 2 * margin
    if _NATURAL and rng.random() < 0.6:
        im = _NATURAL[int(rng.integers(len(_NATURAL)))]
        H, W, _ = im.shape
        if H >= s2 and W >= s2:
            y0 = int(rng.integers(0, H - s2 + 1))
            x0 = int(rng.integers(0, W - s2 + 1))
            tex = im[y0:y0 + s2, x0:x0 + s2].copy()
            if rng.random() < 0.5:
                tex = tex[:, ::-1]
            if rng.random() < 0.5:
                tex = tex[::-1]
            if rng.random() < 0.3:
                tex = np.roll(tex, int(rng.integers(1, 3)), axis=2)
            # random contrast/brightness jitter
            tex = np.clip(tex * rng.uniform(0.7, 1.2)
                          + rng.uniform(-0.08, 0.08), 0.0, 1.0)
            return np.ascontiguousarray(tex, np.float32)
    return _texture_1f(rng, s2)


def _sample_bilinear(tex: np.ndarray, sy: np.ndarray, sx: np.ndarray):
    """Bilinear sample tex [Ht, Wt, 3] at float coords (border-clamped)."""
    Ht, Wt, _ = tex.shape
    sy = np.clip(sy, 0.0, Ht - 1.0)
    sx = np.clip(sx, 0.0, Wt - 1.0)
    y0 = np.floor(sy).astype(np.int32)
    x0 = np.floor(sx).astype(np.int32)
    y1 = np.minimum(y0 + 1, Ht - 1)
    x1 = np.minimum(x0 + 1, Wt - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    top = tex[y0, x0] * (1 - wx) + tex[y0, x1] * wx
    bot = tex[y1, x0] * (1 - wx) + tex[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def make_batch(rng: np.random.Generator, n_frames: int, batch: int, size: int):
    """[n_frames, B, size, size, 3] float32 clips: a textured background
    under a SUBPIXEL affine motion (translation + slight zoom/rotation)
    plus a foreground ellipse with independent subpixel translation
    (occlusion/disocclusion), so MOFNet's flows train at the bilinear
    warp's actual precision and alpha/beta get masking signal.  Textures
    mix natural-photo crops with procedural 1/f noise (_texture).
    """
    margin = 24
    out = np.empty((n_frames, batch, size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy0, cx0 = (size - 1) / 2.0, (size - 1) / 2.0
    for b in range(batch):
        bg = _texture(rng, size, margin)
        fg = _texture(rng, size, margin)
        # foreground ellipse mask
        cy, cx = rng.uniform(0.25, 0.75, 2) * size
        ry, rx = rng.uniform(0.12, 0.3, 2) * size
        vbg = rng.uniform(-2.5, 2.5, 2)
        vfg = rng.uniform(-3.5, 3.5, 2)
        # slight per-frame zoom / rotation of the background (affine flow)
        zoom = rng.uniform(-0.004, 0.004)
        rot = rng.uniform(-0.004, 0.004)
        for t in range(n_frames):
            s, c = np.sin(rot * t), np.cos(rot * t) * (1.0 + zoom * t)
            dy = yy - cy0
            dx = xx - cx0
            sy = cy0 + c * dy + s * dx + margin + vbg[0] * t
            sx = cx0 - s * dy + c * dx + margin + vbg[1] * t
            frame = _sample_bilinear(bg, sy, sx)
            jy = yy + margin + vfg[0] * t
            jx = xx + margin + vfg[1] * t
            mask = ((((yy - cy - vfg[0] * t) / ry) ** 2
                     + ((xx - cx - vfg[1] * t) / rx) ** 2) < 1.0)[..., None]
            out[t, b] = np.where(mask, _sample_bilinear(fg, jy, jx), frame)
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

    # Host-side prefetch: the next batch is generated on a worker thread
    # while the device runs the current step (single worker, so the numpy
    # rng stays single-threaded).
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1)

    def gen():
        return (make_batch(rng_np, len(gop), args.batch, args.size),
                int(rng_np.integers(0, n_rates)))

    fut = ex.submit(gen)
    t0 = time.time()
    for step in range(args.steps):
        frames_np, idx_rate = fut.result()
        fut = ex.submit(gen)
        frames = jnp.asarray(frames_np)
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
