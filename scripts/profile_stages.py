"""Per-stage wall-clock profile of the frame codec on the current backend.

Times each compiled stage (steady state, after warm-up), the host range
coder, and host<->device transfers separately, so optimization targets the
actual bottleneck (SURVEY.md §5: the reference has no per-stage timers).

Usage:
  python scripts/profile_stages.py [--model tiny|base] [--h 240] [--w 416]
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


def _block(out):
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)


def timeit(fn, n=10):
    _block(fn())  # warm-up / compile, fully drained
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _block(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=416)
    args = ap.parse_args()

    from aivc_tpu.config import FRAME_P, ModelConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from bench import synthetic_frames

    cfg = TINY if args.model == "tiny" else ModelConfig()
    _, params = init_fullnet(cfg)
    codec = FrameCodec(cfg, params, args.h, args.w)
    p = params

    frames = synthetic_frames(2, args.h, args.w)
    frame = codec.ref_to_444(frames[0])
    prev = codec.ref_to_444(frames[1])
    rate = jnp.float32(0.0)

    rows = []

    def add(name, secs):
        rows.append((name, secs * 1e3))

    add("ref_to_444 (incl. transfer)",
        timeit(lambda: codec.ref_to_444(frames[0])))

    y_m, z_qm = codec._mof_analyze(p, frame, prev, prev, rate, ftype=FRAME_P)
    add("mof_analyze[P]",
        timeit(lambda: codec._mof_analyze(p, frame, prev, prev, rate,
                                          ftype=FRAME_P)))
    mu_m, bins_m = codec._mof_hyper(p, z_qm)
    add("mof_hyper", timeit(lambda: codec._mof_hyper(p, z_qm)))
    y_cqm = codec._y_quant(y_m, mu_m)
    add("y_quant(mof)", timeit(lambda: codec._y_quant(y_m, mu_m)))
    mof = codec._mof_synth(p, y_cqm, mu_m, frame, prev, rate, ftype=FRAME_P)
    add("mof_synth[P]",
        timeit(lambda: codec._mof_synth(p, y_cqm, mu_m, frame, prev, rate,
                                        ftype=FRAME_P)))
    pred, skip = mof["pred"], mof["skip"]
    y_c, z_qc = codec._cod_analyze(p, frame, pred, rate, ftype=FRAME_P)
    add("cod_analyze[P]",
        timeit(lambda: codec._cod_analyze(p, frame, pred, rate, ftype=FRAME_P)))
    mu_c, bins_c = codec._cod_hyper(p, z_qc)
    add("cod_hyper", timeit(lambda: codec._cod_hyper(p, z_qc)))
    y_cqc = codec._y_quant(y_c, mu_c)
    add("cod_synth[P] (incl. cast)",
        timeit(lambda: codec._cod_synth(p, y_cqc, mu_c, pred, skip, rate,
                                        ftype=FRAME_P)))

    # Transfers
    t0 = time.perf_counter()
    y_np = np.asarray(y_cqc)
    add("pull y_cq (int16)", time.perf_counter() - t0)
    t0 = time.perf_counter()
    b_np = np.asarray(bins_c)
    add("pull bins (uint8)", time.perf_counter() - t0)
    z_np = np.asarray(z_qc, np.int32)

    # Host range coder
    from aivc_tpu.coding import bitstream as bs

    t0 = time.perf_counter()
    cy = bs.encode_y_chunk(y_np[0], b_np[0], codec.laplace_rows)
    add("rANS encode y (host)", time.perf_counter() - t0)
    t0 = time.perf_counter()
    bs.decode_y_chunk(cy, y_np[0].shape, b_np[0], codec.laplace_rows)
    add("rANS decode y (host)", time.perf_counter() - t0)
    t0 = time.perf_counter()
    cz = bs.encode_z_chunk(z_np[0], codec.z_rows["codecnet"])
    add("rANS encode z (host)", time.perf_counter() - t0)

    print(f"\nstage profile: model={cfg.name} {args.w}x{args.h} "
          f"backend={jax.default_backend()}")
    for name, ms in rows:
        print(f"  {name:<32} {ms:9.2f} ms")


if __name__ == "__main__":
    main()
