"""Microbenchmark: XLA gather warp vs Pallas tile-decomposed warp.

Forces real completion with a scalar reduction pulled to host (the remote
relay acks block_until_ready early; a host pull is the only trustworthy
sync — docs/STATUS.md).

Usage: python scripts/warp_bench.py [--h 1088] [--w 1920] [--b 4]
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


def timed(fn, n=6):
    float(np.asarray(fn()))  # compile + drain
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(fn()))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--b", type=int, default=4)
    args = ap.parse_args()

    from aivc_tpu.ops.warp import pack_yuv_u32, warp, warp_packed

    B, H, W, C = args.b, args.h, args.w, 3
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (B, H, W, C)).astype(np.uint8)
    x = jnp.asarray(u8.astype(np.float32) / 255.0)
    fl = rng.uniform(-8, 8, (B, H, W, 2)).astype(np.float32)
    fl[0, :, :16, :16] = 300.0  # exercise border clamping
    flow = jnp.asarray(fl)

    xla_warp = jax.jit(lambda a, f: jnp.sum(warp(a, f)))
    t_xla = timed(lambda: xla_warp(x, flow))
    print(f"xla gather warp   {B}x{H}x{W}x{C}: {t_xla * 1e3:8.2f} ms")

    packed = jax.jit(pack_yuv_u32)(x)
    pk_warp = jax.jit(lambda p, f: jnp.sum(warp_packed(p, f)))
    t_pk = timed(lambda: pk_warp(packed, flow))
    print(f"packed u32 warp   {B}x{H}x{W}x{C}: {t_pk * 1e3:8.2f} ms")

    a = np.asarray(jax.jit(warp)(x, flow))
    b = np.asarray(jax.jit(warp_packed)(packed, flow))
    print(f"max |xla - packed| = {np.abs(a - b).max():.3e}")


if __name__ == "__main__":
    main()
