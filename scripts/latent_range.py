"""Measure a checkpoint's coded-latent range over held-out content.

Decides whether a model can declare a narrower entropy-coding alphabet
(ModelConfig.ac_max_val): if every quantized latent magnitude across the
held-out suite and the whole rate ladder stays well inside +-A, setting
ac_max_val = A shrinks every CDF table and TPU one-hot lookup by
512 / (2A) with no reconstruction change (clipping never engages) and a
slight RATE IMPROVEMENT (no probability mass wasted on unused tails).

Usage:
  python scripts/latent_range.py --ckpt models_ckpt/bf16-r3 [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="models_ckpt/bf16-r5")
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=416)
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--rates", default="0,2,4,6")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from eval_data import heldout_clips, FAMILIES

    from aivc_tpu.config import CodingConfig, FRAME_I
    from aivc_tpu.gop import generate_gop_struct
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import wave_groups
    from aivc_tpu.utils.checkpoint import load_checkpoint

    cfg, params = load_checkpoint(args.ckpt)
    codec = FrameCodec(cfg, params, args.h, args.w)
    clips = heldout_clips(args.frames, args.h, args.w)

    max_y = max_z = 0
    hist = np.zeros(10, np.int64)  # counts with |q| in 2^i buckets
    for r in [float(x) for x in args.rates.split(",")]:
        coding = CodingConfig(coding_config="RA", gop_size=8,
                              intra_period=8, idx_rate=r)
        gop = generate_gop_struct(coding.gop_struct_name())
        for frames in clips:
            decoded = {}
            for ftype, specs in wave_groups(gop, 4):
                handles = codec.encode_frames_launch(
                    [frames[s.idx] for s in specs],
                    [decoded.get(s.prev_ref) for s in specs],
                    [decoded.get(s.next_ref) for s in specs],
                    ftype, r)
                for spec, dec in zip(specs, handles["decoded"]):
                    decoded[spec.idx] = dec.ref
                for key in ("y_cqm", "y_cqc"):
                    if handles.get(key) is not None:
                        q = np.abs(np.asarray(handles[key][0]))
                        max_y = max(max_y, int(q.max()))
                        for i in range(10):
                            hist[i] += int((q >= (1 << i)).sum())
                for key in ("z_qm", "z_qc"):
                    if handles.get(key) is not None:
                        z = np.abs(np.asarray(handles[key]))
                        max_z = max(max_z, int(z.max()))
                # release host entropy-coding work: we only need latents
                handles.clear()
    out = {
        "ckpt": args.ckpt,
        "max_abs_y": max_y,
        "max_abs_z": max_z,
        "n_families": len(FAMILIES),
        "count_ge_pow2": {str(1 << i): int(hist[i]) for i in range(10)},
        "safe_ac_max": int(max(32, 1 << int(np.ceil(np.log2(
            max(max_y, max_z, 16) + 1)) + 1))),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
