"""Micro-probe: why do the synthesis/analysis convs run at <10% MXU?

Times ONE conv at the real stage shapes of the flagship (BASE_BF16) at
1080p under several formulations, reporting achieved TFLOP/s and % of
the v5e bf16 peak (~197 TFLOP/s).  The round-3 profile showed
mof_synth_maps at 269 ms wave-8 where the FLOP count says ~26 ms
(docs/STATUS.md round-3 profile); this isolates where the 10x goes:
the replication_pad materialization, the conv layout itself, the dtype,
or the lowering.

Variants per shape:
  pad_conv   replication_pad + VALID conv (what ConvBlock/UpBlock run)
  same_conv  zero-pad SAME conv (isolates the pad materialization)
  nchw       SAME conv in NCHW dimension numbers
  fold_h     batch folded into H ([1, B*H, W, C]) SAME conv (perf-only:
             halo across batch boundaries is wrong; measures whether the
             batch dim is the layout problem)
  dot25      k*k shifted [BHW, Cin] x [Cin, Cout] dots, accumulated —
             the conv as explicit MXU GEMMs, no conv lowering at all

Each timed rep pulls a 1-element reduction to host: the relay acks
block_until_ready without real completion (round-1 hardware lesson), so
only a device->host pull is a trustworthy fence.

Usage: python scripts/conv_probe.py [--h 1088] [--w 1920] [--batch 8]
       [--reps 5] [--stages s1,s2,s3,s4,ga1] [--variants ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def replication_pad(x, pad):
    x = jnp.concatenate([x[:, :1].repeat(pad, 1), x,
                         x[:, -1:].repeat(pad, 1)], axis=1)
    x = jnp.concatenate([x[:, :, :1].repeat(pad, 2), x,
                        x[:, :, -1:].repeat(pad, 2)], axis=2)
    return x


def conv_flops(B, H, W, cin, cout, k, stride=1):
    return 2.0 * B * (H // stride) * (W // stride) * k * k * cin * cout


@partial(jax.jit, static_argnames=("k", "stride", "mode"))
def run_conv(x, w, k: int, stride: int, mode: str):
    """x [B,H,W,Cin] (bf16 unless mode says f32), w [k,k,Cin,Cout]."""
    dn = ("NHWC", "HWIO", "NHWC")
    if mode == "pad_conv":
        xp = replication_pad(x, k // 2)
        out = jax.lax.conv_general_dilated(
            xp, w, (stride, stride), "VALID", dimension_numbers=dn)
    elif mode in ("same_conv", "f32"):
        out = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=dn)
    elif mode == "nchw":
        xt = jnp.transpose(x, (0, 3, 1, 2))
        wt = jnp.transpose(w, (3, 2, 0, 1))
        out = jax.lax.conv_general_dilated(
            xt, wt, (stride, stride), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out = jnp.transpose(out, (0, 2, 3, 1))
    elif mode == "fold_h":
        B, H, W, C = x.shape
        xf = x.reshape(1, B * H, W, C)
        out = jax.lax.conv_general_dilated(
            xf, w, (stride, stride), "SAME", dimension_numbers=dn)
        out = out.reshape(B, H // stride, W // stride, -1)
    elif mode == "packed":
        # Lane-packed head (ops/layers.py:LanePackedConv): G output
        # columns into lanes via a wider strided kernel.
        B, H, W, C = x.shape
        cout = w.shape[-1]
        G = 1
        while 2 * G * cout <= 128 and (W % (2 * G)) == 0:
            G *= 2
        p = k // 2
        xp = replication_pad(x, p)
        wide = jnp.zeros((k, k + G - 1, C, G, cout), x.dtype)
        for g in range(G):
            wide = wide.at[:, g:g + k, :, g, :].set(w)
        wide = wide.reshape(k, k + G - 1, C, G * cout)
        out = jax.lax.conv_general_dilated(
            xp, wide, (1, G), "VALID", dimension_numbers=dn)
        out = out.reshape(B, H, W // G, G, cout).reshape(B, H, W, cout)
    elif mode == "dot25":
        # stride-1 only: accumulate k*k shifted GEMMs on zero-padded x.
        B, H, W, C = x.shape
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        cout = w.shape[-1]
        acc = jnp.zeros((B, H, W, cout), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                xs = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (B, H, W, C))
                acc = acc + jax.lax.dot_general(
                    xs.reshape(B * H * W, C), w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(B, H, W, cout)
        out = acc
    else:
        raise ValueError(mode)
    return jnp.sum(out.astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nb_ft", type=int, default=128)
    ap.add_argument("--stages", default="s2,s3,s4,ga1")
    ap.add_argument("--variants",
                    default="pad_conv,same_conv,f32,nchw,fold_h,dot25")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    B, H, W, F = args.batch, args.h, args.w, args.nb_ft
    # (label, in_h, in_w, cin, cout, k, stride) — g_s runs at /16 /8 /4 /2
    # of frame res with conv-to-4C + depth_to_space; g_a stage 1 runs at
    # full res with stride 2.
    stages = {
        "s1": ("g_s up1 (/16)", H // 16, W // 16, F + 32, 4 * F, 5, 1),
        "s2": ("g_s up2 (/8)", H // 8, W // 8, F, 4 * F, 5, 1),
        "s3": ("g_s up3 (/4)", H // 4, W // 4, F, 4 * F, 5, 1),
        "s4": ("g_s up4 (/2)", H // 2, W // 2, F, 4 * 6, 5, 1),
        "ga1": ("g_a conv1 (full, s2)", H, W, 9, F, 5, 2),
    }
    rng = np.random.default_rng(0)
    for key in args.stages.split(","):
        label, h, w, cin, cout, k, stride = stages[key]
        gflop = conv_flops(B, h, w, cin, cout, k, stride) / 1e9
        print(f"\n== {key}: {label}  [{B},{h},{w},{cin}]->"
              f"[{cout}] k{k} s{stride}  {gflop:.1f} GFLOP")
        for mode in args.variants.split(","):
            if mode == "dot25" and stride != 1:
                continue
            dt = jnp.float32 if mode == "f32" else jnp.bfloat16
            x = jnp.asarray(rng.standard_normal((B, h, w, cin)), dt)
            wgt = jnp.asarray(
                rng.standard_normal((k, k, cin, cout)) * 0.01, dt)
            try:
                float(run_conv(x, wgt, k, stride, mode))  # compile
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(run_conv(x, wgt, k, stride, mode))
                    times.append(time.perf_counter() - t0)
                t = min(times)
                tf = gflop / 1e3 / t
                print(f"  {mode:10s} {t * 1e3:8.2f} ms  {tf:7.2f} TF/s "
                      f"({100 * tf / PEAK_TFLOPS:5.1f}% peak)")
            except Exception as e:
                print(f"  {mode:10s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
