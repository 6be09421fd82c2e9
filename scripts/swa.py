"""Stochastic weight averaging over shelved training snapshots.

The long-leg trajectories oscillate +-1-2 dB between 1k-step snapshots
(round-4 finding: a leg resumed from the eval-promoted peak regressed
~3 dB immediately and never re-entered the peak), which means promotion
by held-out eval has been selecting OUTLIER draws of an oscillating
process rather than a converged state.  Averaging the snapshots targets
the center of the oscillation basin, which classically sits lower on
the loss surface than any single draw (Izmailov et al., SWA) — the
reference ships no training loop at all (SURVEY §2.3), so this
subsystem is net-new capability.

Usage:
  python scripts/swa.py --out models_ckpt/bf16-r6-swa \
      models_ckpt/bf16-r6-s4000 models_ckpt/bf16-r6-s6000 ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+",
                    help="snapshot dirs to average (uniform weights)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from aivc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg0 = None
    acc = None
    for ck in args.ckpts:
        cfg, params = load_checkpoint(ck)
        if cfg0 is None:
            cfg0 = cfg
        elif cfg.to_json() != cfg0.to_json():
            raise SystemExit(f"config mismatch: {ck} differs from "
                             f"{args.ckpts[0]} — refusing to average "
                             f"across model configs")
        # Accumulate in float64 on host: averaging N bf16/f32 trees in
        # their own dtype loses the low bits the average exists to find.
        flat = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        acc = flat if acc is None else jax.tree.map(np.add, acc, flat)
        print(f"  + {ck}")
    n = len(args.ckpts)
    _, tmpl = load_checkpoint(args.ckpts[0])
    avg = jax.tree.map(
        lambda s, t: jnp.asarray(s / n, t.dtype), acc, tmpl)
    save_checkpoint(args.out, cfg0, avg)
    print(f"averaged {n} snapshots -> {args.out}")


if __name__ == "__main__":
    main()
