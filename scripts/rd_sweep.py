"""Rate-distortion sweep: encode at every rate index, report RD points.

Covers the BASELINE.md benchmark config "RA GOP32 across all 7 rate
targets (RD sweep)".  With --input absent, a synthetic clip is used.

Rate points are independent (SURVEY.md §2.5 item 4): --procs N fans them
out over worker processes, each encoding its subset with the standard
single-rate path, so every bitstream stays standalone-decodable (batching
rates into one device batch would let the v2 elided format's wave-shared
gather bucket couple the rates' bytes — see pipeline/codec.py:_launch_vr2
— so fan-out happens at process/device granularity, the same axis a
multi-chip mesh would use).

Output: one JSON line per rate point {idx_rate, bpp, psnr, ms_ssim, fps}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="", help="raw .yuv (name_WxH_fps_420.yuv)")
    ap.add_argument("--family", default="",
                    help="use this held-out eval_data family as the clip "
                         "instead of the bench sinusoid (e.g. photowarp)")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--ckpt", default="", help="checkpoint dir (overrides --model)")
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--coding_config", default="RA")
    ap.add_argument("--gop_size", type=int, default=8)
    ap.add_argument("--intra_period", type=int, default=8)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=416)
    ap.add_argument("--rates", default="", help="comma list; default all")
    ap.add_argument("--wave_batch", type=int, default=4)
    ap.add_argument("--compare", default="",
                    help="JSONL of a previous sweep; report BD-rate and "
                         "BD-PSNR of THIS sweep against it")
    ap.add_argument("--procs", type=int, default=0,
                    help="fan rate points out over N worker processes "
                         "(0 = sequential in-process); workers run on CPU "
                         "— a single TPU chip cannot be shared, and on a "
                         "pod each worker would pin its own chips")
    ap.add_argument("--rate_audit", action="store_true",
                    help="also report per-point container overhead: real "
                         "bytes vs analytic bits under the coder's own "
                         "CDFs (BASELINE low-rate flush audit)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.procs > 1:
        import subprocess
        import time as _time

        if args.rates:
            all_rates = [float(r) for r in args.rates.split(",")]
        elif args.ckpt:
            cfg_json = json.loads(
                (Path(args.ckpt) / "config.json").read_text())
            all_rates = [float(i)
                         for i in range(len(cfg_json["lambda_tradeoff"]))]
        else:
            all_rates = [float(i) for i in range(3 if args.model == "tiny"
                                                 else 7)]
        subsets = [all_rates[i::args.procs] for i in range(args.procs)]
        base = [sys.executable, str(Path(__file__).resolve()), "--cpu",
                "--procs", "0"]
        for flag in ("input", "model", "ckpt", "coding_config", "family"):
            base += [f"--{flag}", str(getattr(args, flag))]
        if args.rate_audit:
            base += ["--rate_audit"]
        for flag in ("frames", "gop_size", "intra_period", "h", "w",
                     "wave_batch"):
            base += [f"--{flag}", str(getattr(args, flag))]
        t0 = _time.time()
        procs = [subprocess.Popen(
                    base + ["--rates", ",".join(str(r) for r in sub)],
                    stdout=subprocess.PIPE, text=True)
                 for sub in subsets if sub]
        points = []
        for pr in procs:
            out, _ = pr.communicate()
            if pr.returncode != 0:
                raise RuntimeError(f"sweep worker failed (rc {pr.returncode})")
            points += [json.loads(ln) for ln in out.splitlines()
                       if ln.startswith("{") and "idx_rate" in ln]
        points.sort(key=lambda r: r["idx_rate"])
        for row in points:
            print(json.dumps(row), flush=True)
        print(json.dumps({"sweep_wall_s": round(_time.time() - t0, 2),
                          "procs": args.procs}), flush=True)
        _maybe_compare(args, points)
        return

    from aivc_tpu.config import CodingConfig, ModelConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import encode_video, evaluate_frames
    from aivc_tpu.utils.checkpoint import load_checkpoint
    from bench import synthetic_frames

    if args.ckpt:
        cfg, params = load_checkpoint(args.ckpt)
    else:
        cfg = TINY if args.model == "tiny" else ModelConfig()
        _, params = init_fullnet(cfg)

    if args.input:
        from aivc_tpu.io.yuv import YuvReader

        reader = YuvReader(args.input)
        n = min(args.frames, reader.n_frames)
        frames = [reader.read_frame(i) for i in range(n)]
        h, w = reader.height, reader.width
    elif args.family:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from eval_data import heldout_clips

        h, w = args.h, args.w
        frames = heldout_clips(args.frames, h, w, names=[args.family])[0]
    else:
        h, w = args.h, args.w
        frames = synthetic_frames(args.frames, h, w)

    # RD sweeps favor bytes over speed: rate-priority K policy keeps the
    # per-frame rANS state flush ~1% of the payload at every ladder rate.
    codec = FrameCodec(cfg, params, h, w, rate_priority=True,
                       audit=args.rate_audit)
    n_rates = len(cfg.lambda_tradeoff)
    rates = ([float(r) for r in args.rates.split(",")] if args.rates
             else [float(i) for i in range(n_rates)])

    import time as _time

    n_pix = h * w
    points = []
    # Warm-up: all rate points share ONE compiled program (idx_rate is
    # traced), so a single unrecorded pass over one GOP's worth of frames
    # takes the compile out of every row's enc_fps (VERDICT r3: the idx0
    # row used to read 0.048 fps vs 2.88 steady-state).
    warm = CodingConfig(
        coding_config=args.coding_config, gop_size=args.gop_size,
        intra_period=args.intra_period, idx_rate=rates[0])
    encode_video(codec, frames[:min(len(frames), args.gop_size + 1)],
                 warm, wave_batch=args.wave_batch)
    t0 = _time.time()
    for idx_rate in rates:
        coding = CodingConfig(
            coding_config=args.coding_config, gop_size=args.gop_size,
            intra_period=args.intra_period, idx_rate=idx_rate)
        res = encode_video(codec, frames, coding,
                           wave_batch=args.wave_batch)
        metrics = evaluate_frames(frames, res.decoded_frames)
        row = {
            "idx_rate": idx_rate,
            "bpp": round(res.total_bytes * 8 / (n_pix * len(frames)), 5),
            "bytes": res.total_bytes,
            "psnr": round(float(metrics["psnr"]), 4),
            "ms_ssim": round(float(metrics["ms_ssim"]), 5),
            "ms_ssim_db": round(float(metrics["ms_ssim_db"]), 4),
            "enc_fps": round(res.fps, 3),
        }
        if args.rate_audit:
            analytic = sum(fr.analytic_bits for fr in res.frame_results)
            real = sum(fr.bytes for fr in res.frame_results) * 8.0
            row["analytic_bits"] = round(analytic, 1)
            row["container_overhead_pct"] = round(
                100.0 * (real - analytic) / max(analytic, 1e-9), 3)
        points.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"sweep_wall_s": round(_time.time() - t0, 2),
                      "procs": 1}), flush=True)
    _maybe_compare(args, points)


def _maybe_compare(args, points):
    if not args.compare:
        return
    from aivc_tpu.ops.bd_metrics import bd_psnr, bd_rate

    ref = [json.loads(line) for line in open(args.compare)
           if line.strip().startswith("{") and "idx_rate" in line]
    ref_rd = [(r["bpp"], r["psnr"]) for r in ref]
    test_rd = [(r["bpp"], r["psnr"]) for r in points]
    out = {"bd_rate_pct_vs_ref": round(bd_rate(ref_rd, test_rd), 3),
           "bd_psnr_db_vs_ref": round(bd_psnr(ref_rd, test_rd), 4)}
    ref_ms = [(r["bpp"], r["ms_ssim_db"]) for r in ref]
    test_ms = [(r["bpp"], r["ms_ssim_db"]) for r in points]
    out["bd_msssim_db_vs_ref"] = round(bd_psnr(ref_ms, test_ms), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
