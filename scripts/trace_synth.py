"""Op-level profile of the synthesis/analysis stage programs.

Runs the flagship's staged jit programs (mof_synth_maps, cod_synth,
analyses) at 1080p wave-8, captures a perfetto trace, and prints the
top device ops by total duration — the ground truth for the <10% MXU
question (VERDICT r3 item 3): whether the time is in the conv GEMMs
themselves, layout/transpose fusions, or something else.

Usage:
  python scripts/trace_synth.py [--ckpt models_ckpt/bf16-r4m]
      [--h 1088] [--w 1920] [--batch 8] [--stage mof_synth|cod_synth|all]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def parse_perfetto(trace_dir: str, top: int = 25):
    """Aggregate device-track slice durations by op name."""
    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print(f"no perfetto trace found under {trace_dir}")
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # device tracks: pid names containing 'TPU'/'Device' — fall back to
    # aggregating everything with a duration.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name][0] += e["dur"]
        agg[name][1] += 1
        total += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"\n-- top {top} device ops ({len(agg)} distinct, "
          f"total {total / 1e3:.1f} ms across tracks) --")
    for name, (dur, cnt) in rows:
        print(f"  {dur / 1e3:9.2f} ms  x{cnt:<4d}  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="models_ckpt/bf16-r5")
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--stage", default="all",
                    choices=["mof_synth", "cod_synth", "analyses", "all"])
    ap.add_argument("--out", default="/tmp/trace_synth")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from aivc_tpu.config import FRAME_B
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.utils.checkpoint import load_checkpoint

    cfg, params = load_checkpoint(args.ckpt)
    codec = FrameCodec(cfg, params, args.h, args.w)
    B, H, W = args.batch, codec.hp, codec.wp
    hy, wy = codec.hy, codec.wy
    hz, wz = codec.hz, codec.wz
    rng = np.random.default_rng(0)
    rate = jnp.float32(3.0)

    frame = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    prev = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    nxt = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    p = codec.params
    # Produce real intermediates once (also warms the compile cache).
    y_m, z_qm = codec._mof_analyze(p, frame, prev, nxt, rate, ftype=FRAME_B)
    mu_m, bins_m = codec._mof_hyper(p, z_qm)
    y_cqm = codec._y_quant(y_m, mu_m)[0]
    mof = codec._mof_synth(p, y_cqm, mu_m, prev, nxt, rate, ftype=FRAME_B)
    y_c, z_qc = codec._cod_analyze(p, frame, mof["pred"], rate, ftype=FRAME_B)
    mu_c, bins_c = codec._cod_hyper(p, z_qc)
    y_cqc = codec._y_quant(y_c, mu_c)[0]

    def run_mof_synth():
        return codec._mof_synth_maps(p, y_cqm, mu_m, prev, nxt, rate,
                                     ftype=FRAME_B)

    def run_cod_synth():
        return codec._cod_synth(p, y_cqc, mu_c, mof["pred"], mof["skip"],
                                rate, ftype=FRAME_B)

    def run_analyses():
        a = codec._mof_analyze(p, frame, prev, nxt, rate, ftype=FRAME_B)
        b = codec._cod_analyze(p, frame, mof["pred"], rate, ftype=FRAME_B)
        return a, b

    stages = {"mof_synth": run_mof_synth, "cod_synth": run_cod_synth,
              "analyses": run_analyses}
    run = (list(stages.values()) if args.stage == "all"
           else [stages[args.stage]])

    def drain(o):
        return jax.tree.map(
            lambda x: np.asarray(x).ravel()[0]
            if hasattr(x, "block_until_ready") else x, o)

    for fn in run:
        drain(fn())  # warm
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out, create_perfetto_trace=True):
        for _ in range(args.reps):
            for fn in run:
                drain(fn())
    print(f"traced {args.reps} reps in "
          f"{(time.perf_counter() - t0) * 1e3:.0f} ms -> {args.out}")
    parse_perfetto(args.out)


if __name__ == "__main__":
    main()
