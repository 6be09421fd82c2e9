"""One-time checkpoint surgery: revive a dead motion path.

Round-3 finding: checkpoints trained with the reference's unbounded
linear flow outputs ended with EVERY flow element ~1e32 — the
border-clamped warp has zero gradient outside the frame, so flows that
escaped early could never return, and motion compensation silently
degraded to warped border pixels (see aivc_tpu/models/fullnet.py:
_mofnet_maps).  The saturating parameterization (ModelConfig.flow_bound)
fixes the gradient, but weights already producing ~1e33 raw outputs sit
so deep in softsign saturation that recovery is numerically impossible.

This script:
  * sets flow_bound (and optionally ac_max_val) in the checkpoint config,
  * zeroes the v_prev/v_next output channels of MOFNet's final g_s conv
    (alpha/beta channels keep their trained values), so raw flows restart
    at exactly 0 — identity warp, live gradients.

Usage:
  python scripts/reset_flow_head.py --ckpt models_ckpt/bf16-r3 \
      --out models_ckpt/bf16-r3m --flow_bound 32 [--ac_max 128]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--flow_bound", type=float, default=32.0)
    ap.add_argument("--ac_max", type=int, default=0,
                    help="also set ModelConfig.ac_max_val (0 = leave)")
    ap.add_argument("--gdn_clamp", type=float, default=16.0,
                    help="GDN multiplier clamp for BOTH subnets (healthy "
                         "nets run ~0.8-1.2 so 16 never engages; it only "
                         "removes the runaway amplification fixed point)")
    args = ap.parse_args()

    from aivc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg, params = load_checkpoint(args.ckpt)
    changes = {"flow_bound": args.flow_bound}
    if args.ac_max:
        changes["ac_max_val"] = args.ac_max
    cfg = dataclasses.replace(cfg, **changes)
    if args.gdn_clamp:
        cfg = dataclasses.replace(
            cfg,
            mofnet=dataclasses.replace(cfg.mofnet,
                                       gdn_clamp=args.gdn_clamp),
            codecnet=dataclasses.replace(cfg.codecnet,
                                         gdn_clamp=args.gdn_clamp))
        changes["gdn_clamp"] = args.gdn_clamp

    # The WHOLE g_s trunk must be reinitialized, not just the head:
    # probing showed trunk activations ~1e33 (the 1e33 raw flows came
    # from upstream, the head weights were only ~0.07), so alpha/beta
    # logits were saturated binary and every gradient through the
    # synthesis was dead.  Analysis (g_a), hyper (h_a/h_s) and the pdf/
    # gain parameters keep their trained values.
    import jax as _jax

    from aivc_tpu.models.zoo import init_fullnet

    _, fresh = init_fullnet(cfg, _jax.random.PRNGKey(17), spatial=64)
    old_gs = params["params"]["mofnet"]["g_s"]
    mag = float(max(np.abs(np.asarray(v)).max()
                    for v in _jax.tree.leaves(old_gs)))
    params["params"]["mofnet"]["g_s"] = fresh["params"]["mofnet"]["g_s"]
    # g_a_ref feeds the synthesis shortcut and its trained features sat at
    # ~1e3 (the seed of the IGDN cascade); only g_s consumes it, so a
    # fresh start is safe for everything else.
    params["params"]["mofnet"]["g_a_ref"] = (
        fresh["params"]["mofnet"]["g_a_ref"])

    # Zero the v/alpha/beta head on TOP of the fresh init so the first
    # steps start from exact identity motion (v = 0, alpha = beta = 0.5
    # under the sigmoid maps): conv outputs feed depth-to-space with
    # layout (ry, rx, c), c fastest (ops/layers.py:depth_to_space2).
    out_c = cfg.mofnet.out_c
    assert out_c == 6, "MOFNet must output alpha/beta/v_prev/v_next"
    last = params["params"]["mofnet"]["g_s"]["UpBlock_3"]["Conv_0"]
    kern = np.asarray(last["kernel"]).copy()
    bias = np.asarray(last["bias"]).copy()
    v_idx = [g * out_c + c for g in range(4) for c in range(2, 6)]
    kern[..., v_idx] = 0.0
    bias[v_idx] = 0.0
    last["kernel"] = kern
    last["bias"] = bias

    save_checkpoint(args.out, cfg, params)
    print(f"reinitialized mofnet g_s (old max |w| {mag:.3g}) and zeroed "
          f"{len(v_idx)} flow-head channels; config: {changes} -> {args.out}")


if __name__ == "__main__":
    main()
