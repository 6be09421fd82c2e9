"""Benchmark matrix: the BASELINE.md tracked configurations.

Runs each config end-to-end (encode + decode + closed-loop check) and
prints one JSON line per config.  Resolutions follow the BASELINE list;
synthetic content is used when no .yuv input is given (the HEVC test
sequences are not redistributable inside this repo).

  1. 416x240  RA GOP16 ip32   (the reference sanity-script config)
  2. 416x240  All-Intra        (image-coding path, batched)
  3. 832x480  LDP intra 8      (sequential P chain)
  4. 1280x720 RA GOP32 rate sweep (3 points)
  5. 1920x1080 RA GOP32        (flagship, also bench.py's config)

Usage: python scripts/bench_matrix.py [--model tiny|base|bf16] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def run_config(label, cfg, params, frames, h, w, coding, wave_batch=4,
               idx_rates=(None,)):
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video

    codec = FrameCodec(cfg, params, h, w)
    for idx_rate in idx_rates:
        import dataclasses

        cc = (coding if idx_rate is None
              else dataclasses.replace(coding, idx_rate=idx_rate))
        # warm-up then timed
        res = encode_video(codec, frames, cc, wave_batch=wave_batch)
        dec = decode_video(codec, res.bitstream, wave_batch=wave_batch)
        t0 = time.time()
        res = encode_video(codec, frames, cc, wave_batch=wave_batch)
        t_enc = time.time() - t0
        t0 = time.time()
        dec = decode_video(codec, res.bitstream, wave_batch=wave_batch)
        t_dec = time.time() - t0
        for idx in dec:
            for k in ("y", "u", "v"):
                assert np.array_equal(dec[idx][k], res.decoded_frames[idx][k]), \
                    f"{label}: enc/dec drift"
        n = len(frames)
        print(json.dumps({
            "config": label,
            "idx_rate": cc.idx_rate,
            "frames": n,
            "bpp": round(res.total_bytes * 8 / (h * w * n), 5),
            "enc_fps": round(n / t_enc, 3),
            "dec_fps": round(n / t_dec, 3),
            "e2e_fps": round(n / (t_enc + t_dec), 3),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=["tiny", "base", "bf16"])
    ap.add_argument("--quick", action="store_true",
                    help="skip the 720p/1080p rows")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aivc_tpu.config import CodingConfig, ModelConfig
    from aivc_tpu.models.zoo import BASE_BF16, TINY, init_fullnet
    from bench import synthetic_frames

    cfg = {"tiny": TINY, "base": ModelConfig(), "bf16": BASE_BF16}[args.model]
    _, params = init_fullnet(cfg)

    # 1. sanity-style RA (reference sanity run: RA GOP16 intra period 32,
    # src/sanity_script.sh:5-14)
    f = synthetic_frames(33, 240, 416)
    run_config("240p RA GOP16 ip32", cfg, params, f, 240, 416,
               CodingConfig(coding_config="RA", gop_size=16,
                            intra_period=32))
    # 2. All-Intra (batched image coding)
    run_config("240p AI batched", cfg, params, f, 240, 416,
               CodingConfig(coding_config="AI"))
    # 3. LDP P-chain
    f = synthetic_frames(9, 480, 832)
    run_config("480p LDP ip8", cfg, params, f, 480, 832,
               CodingConfig(coding_config="LDP", intra_period=8))
    if args.quick:
        return
    # 4. 720p RD sweep (3 rate points; baseline config: RA GOP32)
    f = synthetic_frames(33, 720, 1280)
    n_rates = len(cfg.lambda_tradeoff)
    run_config("720p RA GOP32 sweep", cfg, params, f, 720, 1280,
               CodingConfig(coding_config="RA", gop_size=32,
                            intra_period=32),
               idx_rates=(0.0, (n_rates - 1) / 2, float(n_rates - 1)),
               wave_batch=8)
    # 5. flagship 1080p (bench.py's config)
    f = synthetic_frames(33, 1080, 1920)
    run_config("1080p RA GOP32", cfg, params, f, 1080, 1920,
               CodingConfig(coding_config="RA", gop_size=32,
                            intra_period=32), wave_batch=8)


if __name__ == "__main__":
    main()
