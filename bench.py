"""Benchmark: encode+decode throughput on the flagship 1080p RA config.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Engineered to always land the artifact (round-1 lesson: the driver's
timeout produced rc=124 with no JSON):
  * the first full encode+decode pass (which includes compiles) already
    yields a provisional fps; steady-state reps only improve it;
  * SIGTERM/SIGINT/SIGALRM print the best number so far and exit 0, so
    an external `timeout` still leaves the round with evidence;
  * an internal deadline (BENCH_DEADLINE seconds, default 2100) stops
    rep loops early and prints before any external kill;
  * progress lines go to stderr, never stdout.

Baseline note: the reference publishes no FPS numbers (BASELINE.md — only
per-run log lines).  BASELINE.json's target is >= 2x the reference's
1080p encode FPS on one chip; we take a 1.5 frames/s estimate for the
reference (PyTorch-1.7-era learned video codec at 1080p on a datacenter
GPU), so vs_baseline = fps / 3.0 means >= 1.0 hits the 2x target.
The estimate is grounded in-env (BASELINE.md "measured grounding"):
a reference-shaped torch pipeline (scripts/ref_baseline.py, built from
the reference's own layer classes, entropy coding omitted) measures
0.007 fps at 1080p on this host's CPU vs 0.029 fps for our full
pipeline on the same CPU — so the 1.5 fps GPU figure already grants
the reference ~200x its measured CPU speed.

Env overrides: BENCH_H, BENCH_W, BENCH_GOP, BENCH_MODEL=tiny|base|bf16,
BENCH_CKPT=<dir>|none, BENCH_ENTROPY, BENCH_WAVES, BENCH_REPS,
BENCH_DEADLINE, BENCH_PROFILE.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

T_START = time.time()
DEADLINE = T_START + float(os.environ.get("BENCH_DEADLINE", "2100"))

# Best result so far: filled in as soon as the first pass completes.
_BEST = {"line": None, "printed": False}


def _progress(msg: str) -> None:
    print(f"[bench +{time.time() - T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _emit_and_exit(signum=None, frame=None):
    """Print the best-so-far JSON line exactly once and exit cleanly."""
    if _BEST["printed"]:
        os._exit(0)
    if _BEST["line"] is not None:
        _BEST["printed"] = True
        print(_BEST["line"], flush=True)
        os._exit(0)
    _progress(f"killed (signal {signum}) before any timed pass finished")
    os._exit(1)


for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
    signal.signal(_sig, _emit_and_exit)


def _watchdog():
    """Python signal handlers only run between bytecodes on the main
    thread — a main thread stuck in a multi-minute remote compile would
    ride through SIGTERM.  This daemon thread enforces the internal
    deadline regardless of what the main thread is doing."""
    while True:
        time.sleep(5)
        if time.time() > DEADLINE and _BEST["line"] is not None:
            if not _BEST["printed"]:
                _BEST["printed"] = True
                _progress("watchdog: internal deadline hit; emitting best")
                print(_BEST["line"], flush=True)
            os._exit(0)


import threading  # noqa: E402

threading.Thread(target=_watchdog, daemon=True).start()

if os.environ.get("BENCH_CPU", ""):  # smoke-testing bench.py itself
    jax.config.update("jax_platforms", "cpu")


def _record(fps: float, w: int, h: int, gop_size: int, name: str) -> None:
    _BEST["line"] = json.dumps({
        "metric": f"encode+decode fps, {w}x{h} RA GOP{gop_size}, "
                  f"{name} (1 chip)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 3.0, 3),
    })


def synthetic_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth, slowly-moving content: compressible like natural video.
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    phase = rng.uniform(0, 6.28, size=3)
    for t in range(n):
        y = (
            128
            + 60 * np.sin(xx / 37.0 + 0.12 * t + phase[0])
            + 50 * np.cos(yy / 23.0 - 0.07 * t + phase[1])
        )
        u = 128 + 30 * np.sin((xx + yy) / 51.0 + 0.05 * t + phase[2])
        frames.append({
            "y": np.clip(y, 0, 255).astype(np.uint8),
            "u": np.clip(u[::2, ::2], 0, 255).astype(np.uint8)[: (h + 1) // 2, : (w + 1) // 2],
            "v": np.clip(255 - u[::2, ::2], 0, 255).astype(np.uint8)[: (h + 1) // 2, : (w + 1) // 2],
        })
    return frames


def pick_checkpoint() -> str:
    """The shipped RD flagship, unless BENCH_CKPT overrides.

    Production perf is quoted on the model we'd actually ship (VERDICT
    r1: not the degenerate-motion toy)."""
    ckpt = os.environ.get("BENCH_CKPT", "")
    if ckpt:
        return ckpt
    for cand in ("/root/repo/models_ckpt/flagship",
                 "/root/repo/models_ckpt/bf16-r5",
                 "/root/repo/models_ckpt/bf16-r4m",
                 "/root/repo/models_ckpt/bf16-r3",
                 "/root/repo/models_ckpt/bf16-r2"):
        if os.path.isdir(cand):
            return cand
    return "none"


def main():
    from aivc_tpu.config import CodingConfig, ModelConfig
    from aivc_tpu.models.zoo import BASE_BF16, TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    # Defaults match the BASELINE.json north-star config: 1080p RA GOP32
    # (wave_batch 8 batches each hierarchical-B temporal layer).
    h = int(os.environ.get("BENCH_H", "1080"))
    w = int(os.environ.get("BENCH_W", "1920"))
    gop_size = int(os.environ.get("BENCH_GOP", "32"))
    model_name = os.environ.get("BENCH_MODEL", "bf16")
    wave_batch = int(os.environ.get("BENCH_WAVES", "8"))

    ckpt = pick_checkpoint()
    if ckpt != "none" and os.path.isdir(ckpt):
        from aivc_tpu.utils.checkpoint import load_checkpoint

        cfg, params = load_checkpoint(ckpt)
        _progress(f"checkpoint {ckpt} ({cfg.name})")
    else:
        cfg = {"tiny": TINY, "base": ModelConfig(), "bf16": BASE_BF16}[model_name]
        _, params = init_fullnet(cfg, jax.random.PRNGKey(0), spatial=64)
        _progress(f"random init ({cfg.name})")
    backend = os.environ.get("BENCH_ENTROPY", "device")
    codec = FrameCodec(cfg, params, h, w, entropy_backend=backend)

    n = gop_size + 1
    frames = synthetic_frames(n, h, w)
    coding = CodingConfig(coding_config="RA", gop_size=gop_size,
                          intra_period=gop_size)

    # First pass: compiles + runs everything.  Its wall-clock already
    # yields a provisional (pessimistic) fps so any later kill still has
    # a number to report.
    def materialize(frames_dict):
        """Force the lazy host pull of every decoded plane: DecodedFrame
        fetches its wave's batch on first access, so timing decode_video
        alone measures DISPATCH, not completion (observed: 0.1 s 'decode'
        reps while the real work leaked into the next rep's encode
        window).  Touching each frame inside the timed region makes the
        enc/dec split honest."""
        for _idx, f in frames_dict.items():
            f["y"]
        return frames_dict

    _progress(f"first pass ({w}x{h} GOP{gop_size}, backend={backend}) ...")
    t0 = time.time()
    res = encode_video(codec, frames, coding, wave_batch=wave_batch)
    t_enc = time.time() - t0
    t0 = time.time()
    dec = materialize(decode_video(codec, res.bitstream,
                                   wave_batch=wave_batch))
    t_dec = time.time() - t0
    _record(n / (t_enc + t_dec), w, h, gop_size, cfg.name)
    _progress(f"first pass: enc {t_enc:.1f}s dec {t_dec:.1f}s "
              f"(fps incl. compile: {n / (t_enc + t_dec):.2f})")

    # Sanity: closed loop must hold or the number is meaningless.
    for idx in dec:
        for k in ("y", "u", "v"):
            if not np.array_equal(dec[idx][k], res.decoded_frames[idx][k]):
                raise AssertionError(f"enc/dec drift at frame {idx} plane {k}")

    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # Steady-state reps (best-of-N: the CI TPU sits behind a shared relay
    # with ~±15% run-to-run noise).  Each rep improves the recorded best;
    # the loop stops when the internal deadline nears, using the slowest
    # observed rep as the estimate of the next one's cost.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t_enc = t_dec = float("inf")
    slowest = 0.0
    # Lookahead is enabled mid-loop via process-global env; restore the
    # caller's value on exit and stamp each rep's progress line with the
    # active setting so the artifact shows which reps mixed modes
    # (advisor r3: a best-of-reps number silently mixed lookahead
    # off/on, and the setting leaked to later code in the process).
    la_prior = os.environ.get("AIVC_PIPELINE_LOOKAHEAD")
    try:
        for rep in range(reps):
            if time.time() + max(slowest, 30.0) > DEADLINE:
                _progress(f"deadline near; stopping after {rep} reps")
                break
            if rep == 1 and la_prior is None:
                # Turn the software pipeline on only AFTER a
                # lookahead-free rep has landed a safe number: the relay
                # historically deadlocked on buffered in-flight programs
                # (it tolerates them now, +6% fps), and a wedged rep must
                # not cost the round its artifact — the watchdog emits
                # the best-so-far.
                os.environ["AIVC_PIPELINE_LOOKAHEAD"] = "2"
                _progress("enabling pipeline lookahead 2 for later reps")
            la = os.environ.get("AIVC_PIPELINE_LOOKAHEAD", "0")
            t0 = time.time()
            try:
                res = encode_video(codec, frames, coding,
                                   wave_batch=wave_batch)
                e = time.time() - t0
                t0 = time.time()
                materialize(decode_video(codec, res.bitstream,
                                         wave_batch=wave_batch))
                d = time.time() - t0
            except Exception as exc:
                # A lookahead rep can exhaust HBM (two waves' buffers
                # resident; checkpoint-dependent).  Fall back to
                # lookahead-free reps instead of losing the attempt —
                # the best-so-far number must survive (observed: an
                # OOM at rep 1 burned all three attempts and the
                # artifact recorded the cold rep 0).
                if la != "0" and la_prior is None and \
                        "RESOURCE_EXHAUSTED" in str(exc):
                    _progress("lookahead rep exhausted HBM; disabling "
                              "lookahead for remaining reps")
                    os.environ["AIVC_PIPELINE_LOOKAHEAD"] = "0"
                    continue
                raise
            t_enc, t_dec = min(t_enc, e), min(t_dec, d)
            slowest = max(slowest, e + d)
            _record(n / (t_enc + t_dec), w, h, gop_size, cfg.name)
            _progress(f"rep {rep} (lookahead {la}): enc {e:.1f}s "
                      f"dec {d:.1f}s "
                      f"(best fps {n / (t_enc + t_dec):.2f})")
    finally:
        if la_prior is None:
            os.environ.pop("AIVC_PIPELINE_LOOKAHEAD", None)
        else:
            os.environ["AIVC_PIPELINE_LOOKAHEAD"] = la_prior

    if profile_dir:
        jax.profiler.stop_trace()


if __name__ == "__main__":
    # The CI TPU sits behind a shared relay that occasionally drops a
    # connection mid-compile ("response body closed before all bytes were
    # read"); one such failure must not lose the round's benchmark, so
    # retry while the deadline allows.
    import traceback

    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            traceback.print_exc(file=sys.stderr)
            if attempt == 2 or time.time() > DEADLINE - 120:
                break
            _progress(f"attempt {attempt + 1} failed; retrying")
            time.sleep(15)
    if _BEST["line"] is not None and not _BEST["printed"]:
        _BEST["printed"] = True
        print(_BEST["line"], flush=True)
    elif _BEST["line"] is None:
        sys.exit(1)
