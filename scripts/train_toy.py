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
    has no external video data): sklearn/matplotlib sample photos plus
    material photographs (wood, skin, marble, grass, foil...) from
    simulation-asset packages.  The held-out textures in
    scripts/photo_pool.py are deliberately EXCLUDED.  float32 [H, W, 3]
    in [0, 1]."""
    from photo_pool import train_pool

    return train_pool()


_NATURAL = None


def _texture_cartoon(rng: np.random.Generator, s2: int):
    """Piecewise-constant Voronoi 'cartoon': flat colored cells with hard
    edges — the low-rate-friendly content family (screen content, graphics)
    that 1/f noise and photos never produce."""
    k = int(rng.integers(4, 14))
    sites = rng.uniform(0, s2, size=(k, 2)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(k, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:s2, 0:s2].astype(np.float32)
    d = ((yy[..., None] - sites[:, 0]) ** 2
         + (xx[..., None] - sites[:, 1]) ** 2)
    return colors[np.argmin(d, axis=-1)]


def _texture_grating(rng: np.random.Generator, s2: int):
    """Oriented sinusoid grating or circular zone plate."""
    yy, xx = np.mgrid[0:s2, 0:s2].astype(np.float32)
    base = rng.uniform(0, 1, 3).astype(np.float32)
    amp = rng.uniform(0.15, 0.5)
    if rng.random() < 0.5:
        fy, fx = rng.uniform(-0.35, 0.35, 2)
        wave = np.sin(fy * yy + fx * xx + rng.uniform(0, 6.28))
    else:  # zone plate: radially increasing frequency
        cy, cx = rng.uniform(0, s2, 2)
        r2 = (yy - cy) ** 2 + (xx - cx) ** 2
        wave = np.sin(r2 * rng.uniform(0.0005, 0.004))
    tex = base[None, None] + amp * wave[..., None] * rng.uniform(0.5, 1.0, 3)
    return np.clip(tex, 0, 1).astype(np.float32)


def _texture_checker(rng: np.random.Generator, s2: int):
    """Rotated checkerboard / stripes: hard periodic edges."""
    yy, xx = np.mgrid[0:s2, 0:s2].astype(np.float32)
    th = rng.uniform(0, 3.14)
    u = np.cos(th) * xx + np.sin(th) * yy
    v = -np.sin(th) * xx + np.cos(th) * yy
    p = rng.uniform(6, 28)
    sq = np.sign(np.sin(u * 6.28 / p))
    if rng.random() < 0.5:
        sq = sq * np.sign(np.sin(v * 6.28 / p))
    c0 = rng.uniform(0, 1, 3).astype(np.float32)
    c1 = rng.uniform(0, 1, 3).astype(np.float32)
    return np.where(sq[..., None] > 0, c0, c1).astype(np.float32)


def _texture_ramp(rng: np.random.Generator, s2: int):
    """Smooth gradient ramp + a few soft Gaussian blobs (sky-like)."""
    yy, xx = np.mgrid[0:s2, 0:s2].astype(np.float32)
    gy, gx = rng.uniform(-1, 1, 2) / s2
    tex = np.empty((s2, s2, 3), np.float32)
    for c in range(3):
        tex[..., c] = rng.uniform(0.2, 0.8) + gy * rng.uniform(-1, 1) * yy \
            + gx * rng.uniform(-1, 1) * xx
    for _ in range(int(rng.integers(1, 4))):
        cy, cx = rng.uniform(0, s2, 2)
        sig2 = rng.uniform(6, 40) ** 2
        blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig2))
        tex += rng.uniform(-0.3, 0.3, 3) * blob[..., None]
    return np.clip(tex, 0, 1).astype(np.float32)


def _texture(rng: np.random.Generator, size: int, margin: int):
    """A texture for the clip generator.  Families (VERDICT r1: 'more
    diverse procedural data'): natural-photo crops, 1/f noise, flat
    Voronoi cartoons, gratings/zone plates, checkerboards, smooth ramps."""
    global _NATURAL
    if _NATURAL is None:
        _NATURAL = _natural_pool()
    s2 = size + 2 * margin
    u = rng.random()
    if _NATURAL and u < 0.40:
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
        u = rng.uniform(0.40, 1.0)  # photo too small: fall through
    if u < 0.55:
        return _texture_cartoon(rng, s2)
    if u < 0.67:
        return _texture_grating(rng, s2)
    if u < 0.78:
        return _texture_checker(rng, s2)
    if u < 0.86:
        return _texture_ramp(rng, s2)
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


def _new_scene(rng: np.random.Generator, size: int, margin: int):
    """Sample one scene: background affine motion + 0-2 foreground
    ellipses with independent translation (occlusion/disocclusion)."""
    # 20% TRULY static scenes (zero translation AND zoom/rot) so the skip
    # path sees content where x_warp reconstructs exactly for free: the
    # old "static" draw zeroed only vbg, so residual zoom/rot still made
    # skip lossy everywhere and alpha=1 stayed RD-optimal (VERDICT r3
    # item 2 — the coding-mode mask never fired).
    static = rng.random() < 0.20
    scene = {
        "bg": _texture(rng, size, margin),
        "vbg": np.zeros(2) if static else rng.uniform(-2.5, 2.5, 2),
        "zoom": 0.0 if static else rng.uniform(-0.004, 0.004),
        "rot": 0.0 if static else rng.uniform(-0.004, 0.004),
        # 20% of scenes reverse all motion at a random time (bounce-like;
        # without this, training motion is strictly linear in t and the
        # held-out velocity-reversal family is fully out-of-distribution)
        "t_rev": (int(rng.integers(1, 6)) if rng.random() < 0.2 else -1),
        "fgs": [],
    }
    for _ in range(int(rng.integers(0, 3))):
        scene["fgs"].append({
            "tex": _texture(rng, size, margin),
            "c": rng.uniform(0.2, 0.8, 2) * size,
            "r": rng.uniform(0.08, 0.3, 2) * size,
            # static scenes freeze the foregrounds too, else the moving
            # ellipses keep skip lossy over most of the frame
            "v": np.zeros(2) if static else rng.uniform(-3.5, 3.5, 2),
        })
    # illumination drift: slow global gain oscillation (50% of moving
    # scenes; static scenes stay exactly repeatable so skip is free)
    if not static and rng.random() < 0.5:
        scene["illum"] = (rng.uniform(0.03, 0.15),
                          rng.uniform(0.15, 0.8), rng.uniform(0, 6.28))
    else:
        scene["illum"] = None
    return scene


def _render_scene(scene, t: int, size: int, margin: int,
                  yy: np.ndarray, xx: np.ndarray):
    t_rev = scene.get("t_rev", -1)
    if t_rev > 0 and t > t_rev:  # motion retraces after the reversal
        t = 2 * t_rev - t
    cy0 = cx0 = (size - 1) / 2.0
    s = np.sin(scene["rot"] * t)
    c = np.cos(scene["rot"] * t) * (1.0 + scene["zoom"] * t)
    dy, dx = yy - cy0, xx - cx0
    sy = cy0 + c * dy + s * dx + margin + scene["vbg"][0] * t
    sx = cx0 - s * dy + c * dx + margin + scene["vbg"][1] * t
    frame = _sample_bilinear(scene["bg"], sy, sx)
    for fg in scene["fgs"]:
        jy = yy + margin + fg["v"][0] * t
        jx = xx + margin + fg["v"][1] * t
        mask = ((((yy - fg["c"][0] - fg["v"][0] * t) / fg["r"][0]) ** 2
                 + ((xx - fg["c"][1] - fg["v"][1] * t) / fg["r"][1]) ** 2)
                < 1.0)[..., None]
        frame = np.where(mask, _sample_bilinear(fg["tex"], jy, jx), frame)
    if scene["illum"] is not None:
        amp, w, phi = scene["illum"]
        frame = frame * (1.0 + amp * np.sin(w * t + phi))
    return frame


def make_batch(rng: np.random.Generator, n_frames: int, batch: int, size: int):
    """[n_frames, B, size, size, 3] float32 clips: textured backgrounds
    under SUBPIXEL affine motion (translation + slight zoom/rotation) with
    0-2 foreground ellipses moving independently (occlusion/disocclusion),
    so MOFNet's flows train at the bilinear warp's actual precision and
    alpha/beta get masking signal.  Texture families span photos, noise,
    cartoons, gratings, checkers, ramps (_texture); 15% of clips contain a
    scene cut (alpha must fall back to intra coding), 50% have slow
    illumination drift, and sensor noise varies per clip (30% noiseless).
    """
    margin = 24
    out = np.empty((n_frames, batch, size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for b in range(batch):
        scene = _new_scene(rng, size, margin)
        t_cut = (int(rng.integers(1, n_frames))
                 if n_frames > 1 and rng.random() < 0.15 else -1)
        t0 = 0
        for t in range(n_frames):
            if t == t_cut:
                scene = _new_scene(rng, size, margin)
                t0 = t
            out[t, b] = _render_scene(scene, t - t0, size, margin, yy, xx)
        noise = 0.0 if rng.random() < 0.3 else rng.uniform(0.001, 0.006)
        if noise:
            out[:, b] += rng.normal(scale=noise,
                                    size=out[:, b].shape).astype(np.float32)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--step0", type=int, default=0,
                    help="resume the LR schedule at this absolute step: "
                         "the cosine's decay_steps tracks --steps, so "
                         "relaunches must keep --steps (total) constant "
                         "for the compile cache to hit, and pass the "
                         "completed count here; the optimizer state's "
                         "count leaves are fast-forwarded so warmup is "
                         "not repeated and the decay continues")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step: the "
                         "effective batch is batch*accum but activation "
                         "memory stays at --batch (lax.scan over "
                         "microbatches).  Round-4 finding: B=2 gradient "
                         "noise makes every continuation leg fall out of "
                         "the flagship's sharp basin; cutting the noise "
                         "scale, not adding steps, is the lever")
    ap.add_argument("--model", default="tiny",
                    choices=["tiny", "base", "bf16"])
    ap.add_argument("--gop", default="1_GOP_2")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr_final", type=float, default=0.0,
                    help="cosine-decay the lr to this value over --steps "
                         "(0 = constant lr, the round-1 behaviour)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear lr warmup steps (useful when resuming "
                         "into a changed objective, e.g. a new ladder)")
    ap.add_argument("--out", default="")
    ap.add_argument("--resume", default="",
                    help="checkpoint dir to initialize params from")
    ap.add_argument("--save_every", type=int, default=0,
                    help="also save a checkpoint every N steps")
    ap.add_argument("--snapshot_every", type=int, default=0,
                    help="save step-stamped snapshot dirs (<out>-s<step>) "
                         "every N steps, so the best intermediate can be "
                         "promoted after held-out evaluation")
    ap.add_argument("--dist", default="mse")
    ap.add_argument("--workers", type=int, default=4,
                    help="prefetch threads (each with its own rng slot)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--alpha_penalty", type=float, default=0.0,
                    help="softplus penalty weight on the POSITIVE side of "
                         "the alpha logit: the sigmoid(4x) mask saturates "
                         "at 1.0 with ~1e-8 gradient, so the skip path "
                         "can never re-engage without an explicit "
                         "non-vanishing downward pull (round-4 VERDICT "
                         "item 2); 2e-4 is negligible against distortion "
                         "once alpha is in the trainable zone")
    ap.add_argument("--flow_penalty", type=float, default=0.0,
                    help="L1 penalty weight on the PRE-bound flow logits "
                         "(flow_bound models): the explosion mode drives "
                         "|raw| to ~1e3+ where every task gradient is "
                         "dead; 1e-4 is negligible when healthy and "
                         "pulls a dead flow head back under Adam")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="exponential moving average decay for a shadow "
                         "parameter set (0 = off).  Round-4 finding: the "
                         "small-batch trajectories oscillate +-1-2 dB "
                         "between 1k-step snapshots and eval-promotion "
                         "picks outlier peaks that the next leg "
                         "immediately falls off (docs/evals/"
                         "r6_leg_trajectory.jsonl); the EMA tracks the "
                         "basin center instead of a draw.  Snapshots and "
                         "the final save write an '<out>-ema' twin")
    ap.add_argument("--health_psnr", type=float, default=4.0,
                    help="abort (rc 3) and refuse checkpoints when mean "
                         "PSNR of the last 15 steps falls below this; "
                         "raise it for resumed runs that start healthy "
                         "(a collapse from 20 dB hovered at 7-9 dB and "
                         "slipped past the default)")
    ap.add_argument("--cpu", action="store_true",
                    help="train on host CPU (sitecustomize pins the axon "
                         "TPU platform; env JAX_PLATFORMS alone does not "
                         "stick — see .claude/skills/verify gotchas)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aivc_tpu.config import ModelConfig
    from aivc_tpu.gop import generate_gop_struct
    from aivc_tpu.models.zoo import BASE_BF16, TINY, init_fullnet
    from aivc_tpu.train.trainer import make_optimizer, make_train_step
    from aivc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    if args.resume:
        # The checkpoint's OWN config drives the module, the train step
        # and every save: round 3 trained for a full leg with the zoo
        # config silently clobbering the checkpoint's (flow_bound /
        # gdn_clamp / ac_max_val surgery was dropped on resume and the
        # promoted flagship shipped with the wrong config.json).
        cfg, params = load_checkpoint(args.resume)
        from aivc_tpu.models.fullnet import FullNet
        model = FullNet(cfg)
        print(f"resumed params from {args.resume} ({cfg.name})")
    else:
        cfg = {"tiny": TINY, "base": ModelConfig(),
               "bf16": BASE_BF16}[args.model]
        model, params = init_fullnet(cfg)
    gop = generate_gop_struct(args.gop)
    opt = make_optimizer(
        args.lr,
        lr_final=args.lr_final or None,
        decay_steps=args.steps if args.lr_final else None,
        warmup_steps=args.warmup)
    opt_state = opt.init(params)
    # Optimizer-state persistence: every supervisor relaunch used to
    # zero Adam's mu/nu, and the resume shock (full-size steps with no
    # gradient-variance memory) seeded PSNR collapses within ~40 steps
    # of some restarts.  The state rides next to the params (saved
    # below), so rollbacks restore BOTH.
    from flax import serialization as _ser

    loaded_opt = False
    if args.resume:
        opt_path = Path(args.resume) / "opt_state.msgpack"
        if opt_path.exists():
            try:
                opt_state = _ser.from_bytes(opt_state,
                                            opt_path.read_bytes())
                loaded_opt = True
                print("resumed optimizer state")
            except Exception as e:  # shape change (surgery): fresh state
                print(f"optimizer state not loadable ({e}); fresh init")
    if args.resume and not loaded_opt and not args.warmup:
        print("WARNING: resuming without optimizer state and without "
              "--warmup: fresh Adam mu/nu takes full-size normalized "
              "steps from step one (the round-3 'resume shock'); every "
              "failed continuation leg from bf16-r5 started this way — "
              "consider --warmup 200", flush=True)
    if args.step0 and not loaded_opt:
        def _ff(s):
            # NB 'count' must be looked up in _fields: every tuple has a
            # .count METHOD, so hasattr(s, 'count') is always true.
            # Only the SCHEDULE's count is fast-forwarded.  Adam's own
            # count must stay 0: its mu/nu are freshly zeroed here, and a
            # fast-forwarded count disables bias correction, making the
            # first ~100 post-restart updates ~3x the intended LR.
            if hasattr(s, "_fields"):
                if "count" in s._fields and "mu" not in s._fields:
                    s = s._replace(count=jnp.asarray(args.step0, jnp.int32))
                # Recurse into namedtuple fields too (wrapped states such
                # as optax.MultiSteps carry inner_state fields).
                return s._replace(**{
                    f: _ff(getattr(s, f)) for f in s._fields
                    if isinstance(getattr(s, f), (tuple, list))})
            if isinstance(s, (tuple, list)):
                return type(s)(_ff(x) for x in s)
            return s
        opt_state = _ff(opt_state)
        print(f"schedule fast-forwarded to step {args.step0}")
    step_fn = make_train_step(model, cfg, gop, opt, dist_loss=args.dist,
                              flow_penalty=args.flow_penalty,
                              alpha_penalty=args.alpha_penalty,
                              accum=args.accum)

    rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), args.step0)
    n_rates = len(cfg.lambda_tradeoff)

    # Host-side prefetch: batches are generated on worker threads while
    # the device runs the current step.  Each worker slot owns its own
    # numpy rng (seeded (seed, slot)), so generation is deterministic per
    # (seed, workers) and thread-safe: a slot's rng is only touched by the
    # one in-flight future submitted for that slot.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, args.workers)
    ex = ThreadPoolExecutor(max_workers=workers)
    # step0 folds into the seeding so a supervisor relaunch doesn't
    # re-generate (and re-train on) the same early batches it already saw.
    slot_rngs = [np.random.default_rng([args.seed, w, args.step0])
                 for w in range(workers)]

    # Ladder-extreme oversampling (round-4 VERDICT item 4): uniform
    # rate-index draws gave each extreme 1/7 of the steps and the gain
    # vectors at idx 0-2 stayed undertrained — MS-SSIM regressed
    # idx1 -> idx2 on the promoted flagship.  Mild weights keep the
    # middle healthy while the extremes catch up.
    if n_rates == 7:
        rate_w = np.array([1.6, 1.35, 1.15, 1.0, 1.0, 1.1, 1.35])
    else:
        rate_w = np.ones(n_rates)
    rate_p = rate_w / rate_w.sum()

    def gen(slot):
        r = slot_rngs[slot]
        return (make_batch(r, len(gop), args.batch * args.accum, args.size),
                int(r.choice(n_rates, p=rate_p)))

    futs = deque(ex.submit(gen, w) for w in range(workers))
    t0 = time.time()
    # Divergence containment (round 3: a run drifted from psnr 20 to
    # -112 dB over ~1000 steps with finite positive loss, and the
    # periodic saves captured the diverged params).  Host-side window
    # over recent psnr: checkpoints only save while healthy, and a
    # sustained collapse aborts with rc 3 so the supervisor rolls back
    # to the last GOOD checkpoint with a fresh data stream.
    recent = deque(maxlen=15)
    recent_flow = deque(maxlen=15)
    # Flow-health bound: mean |v| pinned near the softsign bound means
    # the motion path exploded (observed: 1.06 -> 22 px mean in 20 steps
    # at step ~1630; PSNR alone stayed 18-25 because codecnet covers for
    # the degenerate motion, so the PSNR guard never fires).  The limit
    # must clear HEALTHY large motion: hierarchical refs sit up to 4
    # frames away and training pans reach ~6 px/frame, so window means
    # of ~8-14 px are legitimate — only a sustained mean near the bound
    # itself (exploded ckpts ran 22-31 px on random batches) is sick.
    flow_limit = (0.6 * cfg.flow_bound
                  if getattr(cfg, "flow_bound", 0.0) > 0 else float("inf"))

    def healthy():
        if len(recent) < recent.maxlen:
            return True
        if recent_flow and (sum(recent_flow) / len(recent_flow)
                            > flow_limit):
            return False
        return not recent or sum(recent) / len(recent) > args.health_psnr

    # EMA shadow params (see --ema): updated every step by a tiny jitted
    # lerp; initialized from the resumed params so early evals are sane.
    ema_params = None
    ema_step = None
    if args.ema > 0.0:
        d = float(args.ema)

        @jax.jit
        def ema_step(e, p):
            return jax.tree.map(
                lambda ev, pv: (d * ev.astype(jnp.float32)
                                + (1.0 - d) * pv.astype(jnp.float32)
                                ).astype(ev.dtype), e, p)

        ema_params = jax.tree.map(lambda x: x, params)

    for step in range(args.step0, args.steps):
        frames_np, idx_rate = futs.popleft().result()
        futs.append(ex.submit(gen, step % workers))
        frames = jnp.asarray(frames_np)
        rng, rng_s = jax.random.split(rng)
        params, opt_state, logs = step_fn(params, opt_state, frames,
                                          idx_rate, rng_s)
        if ema_params is not None:
            ema_params = ema_step(ema_params, params)
        recent.append(float(logs["psnr"]))
        recent_flow.append(float(logs["flow_mag"]))
        if step % args.log_every == 0 or step == args.steps - 1:
            print(f"step {step:5d}  rate_idx {idx_rate}  "
                  f"loss {float(logs['loss']):.4f}  "
                  f"psnr {float(logs['psnr']):.2f}  "
                  f"bpp {float(logs['rate_bpp']):.4f}  "
                  f"gnorm {float(logs['grad_norm']):.2f}  "
                  f"flow {float(logs['flow_mag']):.2f}/"
                  f"{float(logs['flow_max']):.1f}  "
                  f"alpha {float(logs['alpha_mean']):.2f}  "
                  + (f"mskip {int(logs['micro_skipped'])}  "
                     if args.accum > 1 else "")
                  + f"({(time.time() - t0):.0f}s)", flush=True)
        if not healthy():
            print(f"DIVERGED @ step {step}: last-{len(recent)}-step mean "
                  f"psnr {sum(recent) / len(recent):.2f} dB, mean flow "
                  f"{sum(recent_flow) / max(len(recent_flow), 1):.2f} px "
                  f"(limit {flow_limit:.1f}); aborting for supervisor "
                  f"rollback", flush=True)
            return 3
        if args.out and args.save_every and step and step % args.save_every == 0:
            save_checkpoint(args.out, cfg, params)
            (Path(args.out) / "opt_state.msgpack").write_bytes(
                _ser.to_bytes(opt_state))
            print(f"checkpoint @ step {step} -> {args.out}", flush=True)
        if (args.out and args.snapshot_every and step
                and step % args.snapshot_every == 0):
            snap = f"{args.out}-s{step}"
            save_checkpoint(snap, cfg, params)
            # Snapshots carry the optimizer state too: promoted flagships
            # are COPIES of snapshot dirs, and every continuation leg from
            # a promoted checkpoint used to start with fresh Adam mu/nu —
            # the round-3 "resume shock" mode.  All four failed
            # continuation legs from bf16-r5 (r6 / r6p / r7b4 / r7a4)
            # shared that fresh-Adam start; with the state in the
            # snapshot, promotion preserves the gradient-variance memory.
            (Path(snap) / "opt_state.msgpack").write_bytes(
                _ser.to_bytes(opt_state))
            if ema_params is not None:
                save_checkpoint(f"{args.out}-ema-s{step}", cfg, ema_params)
            print(f"snapshot @ step {step} -> {snap}", flush=True)

    if args.out:
        save_checkpoint(args.out, cfg, params)
        (Path(args.out) / "opt_state.msgpack").write_bytes(
            _ser.to_bytes(opt_state))
        if ema_params is not None:
            save_checkpoint(f"{args.out}-ema", cfg, ema_params)
            print(f"saved EMA twin to {args.out}-ema")
        print(f"saved checkpoint to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
