"""Gain-ladder smoothing surgery: rebuild selected gain rows from their
neighbours' geometric mean.

Why: the multi-rate gain rows are trained independently per ladder index
(reference ships 7 separate models instead — README.md:25,213 — so its
ladder is monotone by construction; our single-model ladder can leave an
undertrained row).  The promoted bf16-r5 has one MS-SSIM inversion left:
idx1 (0.8655) sits below BOTH neighbours (idx0 0.8915, idx2 0.8890) on
the held-out suite, i.e. row 1 of the gain matrices is a worse operating
point than the model's own geometric interpolation between rows 0 and 2
— which is exactly the continuously-variable-rate contract the gain
parameterisation guarantees (ops/gain.py, after Cui et al. G-VAE).
Replacing row r with sqrt(|row r-1| * |row r+1|) moves that index onto
the interpolation path; rate/quality land between the neighbours and the
inversion disappears without touching any other index.

Usage:
  python scripts/gain_smooth.py --ckpt models_ckpt/bf16-r5 \
      --out models_ckpt/bf16-r5-gs --rows 1
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def smooth_rows(tree, rows):
    """Return a copy of the param tree with each [N, C] *_gain leaf's
    selected rows replaced by the geometric mean of their neighbours."""
    n_patched = 0

    def visit(d):
        nonlocal n_patched
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = visit(v)
            elif k.endswith("_gain"):
                g = np.abs(np.asarray(v, np.float32))
                for r in rows:
                    if not 0 < r < g.shape[0] - 1:
                        raise ValueError(f"row {r} has no two neighbours")
                    g[r] = np.sqrt(g[r - 1] * g[r + 1])
                out[k] = g.astype(np.asarray(v).dtype)
                n_patched += 1
            else:
                out[k] = v
        return out

    return visit(tree), n_patched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", default="1",
                    help="comma-separated ladder rows to rebuild")
    args = ap.parse_args()

    from aivc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    rows = [int(r) for r in args.rows.split(",")]
    cfg, params = load_checkpoint(args.ckpt)
    params, n = smooth_rows(params, rows)
    if n == 0:
        raise SystemExit("no *_gain leaves found — wrong checkpoint?")
    save_checkpoint(args.out, cfg, params)
    print(f"patched rows {rows} in {n} gain matrices -> {args.out}")


if __name__ == "__main__":
    main()
