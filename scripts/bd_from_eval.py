"""Bjontegaard deltas between two eval_ckpt.py runs.

Reads two files of eval_ckpt.py JSON lines (the per-rate summary rows:
{"ckpt", "idx_rate", "bpp", "psnr", "ms_ssim"}), treats each as an RD
curve over the shared rate indices, and prints BD-rate / BD-PSNR /
BD-MS-SSIM(dB) of TEST vs REF.  Lets checkpoint promotion be decided on
the same held-out content eval_ckpt measures, without a second sweep.

Usage:
  python scripts/bd_from_eval.py --ref v3_eval.jsonl --test r2_eval.jsonl
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_rows(path: str, ckpt: str = ""):
    """Per-rate summary rows for ONE checkpoint.

    Evidence files may hold rows from several checkpoints (eval_ckpt runs
    append); concatenating two models' points into one 'curve' would
    produce silently wrong BD deltas, so a file with multiple 'ckpt'
    values requires an explicit selector.
    """
    rows = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        if "idx_rate" in r and "bpp" in r and "clip" not in r:
            rows.append(r)
    ckpts = sorted({r.get("ckpt", "") for r in rows})
    if ckpt:
        rows = [r for r in rows if r.get("ckpt", "") == ckpt]
        if not rows:
            raise SystemExit(
                f"no rows for ckpt={ckpt!r} in {path} (has: {ckpts})")
    elif len(ckpts) > 1:
        raise SystemExit(
            f"{path} mixes rows from {len(ckpts)} checkpoints {ckpts}; "
            f"pick one with --ref_ckpt/--test_ckpt")
    if not rows:
        raise SystemExit(f"no per-rate summary rows in {path}")
    # Multiple rows per idx_rate (re-runs appended): keep the LAST.
    by_idx = {}
    for r in rows:
        by_idx[r["idx_rate"]] = r
    return [by_idx[i] for i in sorted(by_idx)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True)
    ap.add_argument("--test", required=True)
    ap.add_argument("--ref_ckpt", default="",
                    help="select this 'ckpt' value when --ref mixes runs")
    ap.add_argument("--test_ckpt", default="",
                    help="select this 'ckpt' value when --test mixes runs")
    args = ap.parse_args()

    from aivc_tpu.ops.bd_metrics import bd_psnr, bd_rate

    ref = load_rows(args.ref, args.ref_ckpt)
    test = load_rows(args.test, args.test_ckpt)

    def msssim_db(r):
        return -10.0 * math.log10(max(1.0 - r["ms_ssim"], 1e-12))

    try:
        bdr = round(bd_rate(
            [(r["bpp"], r["psnr"]) for r in ref],
            [(r["bpp"], r["psnr"]) for r in test]), 3)
    except ValueError as e:
        # Curves with disjoint quality ranges have no BD-rate integral —
        # one curve dominates outright; BD-PSNR (over the shared bpp
        # range) below still quantifies by how much.
        bdr = f"undefined ({e})"
    out = {
        "bd_rate_pct_vs_ref": bdr,
        "bd_psnr_db_vs_ref": round(bd_psnr(
            [(r["bpp"], r["psnr"]) for r in ref],
            [(r["bpp"], r["psnr"]) for r in test]), 4),
        "bd_msssim_db_vs_ref": round(bd_psnr(
            [(r["bpp"], msssim_db(r)) for r in ref],
            [(r["bpp"], msssim_db(r)) for r in test]), 4),
        "ref": ref[0].get("ckpt", args.ref),
        "test": test[0].get("ckpt", args.test),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
