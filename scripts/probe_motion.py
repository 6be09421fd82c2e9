"""Probe a checkpoint's motion maps: flow magnitudes + alpha/beta logits.

Decides whether flipping ModelConfig.flow_bound on (softsign-bounded
flows + sigmoid alpha/beta, see models/fullnet.py:_mofnet_maps) is a
near-identity config change for already-trained params: if |raw flow|
stays well below the bound and the alpha/beta logits are small, the
bounded maps are close to the linear/clip maps the params were trained
under, so inference can route through the windowed Pallas warp kernel
(2.9x on the top 1080p encode stage) at negligible RD cost and training
adapts the rest.

Usage: python scripts/probe_motion.py --ckpt models_ckpt/bf16-r4-cand --cpu
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="models_ckpt/bf16-r4-cand")
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=416)
    ap.add_argument("--rates", default="0,3,6")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from eval_data import heldout_clips

    from aivc_tpu.config import FRAME_B
    from aivc_tpu.models.fullnet import FullNet
    from aivc_tpu.ops.layers import yuv420_to_444
    from aivc_tpu.utils.checkpoint import load_checkpoint

    cfg, params = load_checkpoint(args.ckpt)
    print(f"ckpt {args.ckpt}: flow_bound={cfg.flow_bound} "
          f"ac_max_val={cfg.ac_max_val} gdn_clamp={cfg.mofnet.gdn_clamp}")
    model = FullNet(cfg)

    def pad64(x):
        H, W = x.shape[1:3]
        ph, pw = (-H) % 64, (-W) % 64
        return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

    @jax.jit
    def mof_b(frame, prev, nxt, idx_rate):
        def run(m):
            mof_in = jnp.concatenate([frame, prev, nxt], axis=-1)
            shortcut = jnp.concatenate([prev, nxt], axis=-1)
            out6, _ = m.mofnet(mof_in, shortcut, idx_rate, FRAME_B, False,
                               None)
            return out6
        return model.apply(params, method=run)

    stats = {"raw_flow": [], "logit_a": [], "logit_b": []}
    for clip in heldout_clips(5, args.h, args.w)[:4]:
        f444 = [pad64(yuv420_to_444(fr["y"][None, ..., None],
                                    fr["u"][None, ..., None],
                                    fr["v"][None, ..., None]))
                for fr in clip]
        prev, cur, nxt = f444[0], f444[2], f444[4]
        for r in [float(x) for x in args.rates.split(",")]:
            out6 = np.asarray(mof_b(cur, prev, nxt, r), np.float32)
            stats["logit_a"].append(np.abs(out6[..., 0]).ravel())
            stats["logit_b"].append(np.abs(out6[..., 1]).ravel())
            stats["raw_flow"].append(np.abs(out6[..., 2:6]).ravel())
    for k, chunks in stats.items():
        v = np.concatenate(chunks)
        q = np.percentile(v, [50, 90, 99, 99.9, 100])
        print(f"{k:9s} p50 {q[0]:.3f}  p90 {q[1]:.3f}  p99 {q[2]:.3f}  "
              f"p99.9 {q[3]:.3f}  max {q[4]:.3f}")


if __name__ == "__main__":
    main()
