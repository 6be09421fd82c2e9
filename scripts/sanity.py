"""Sanity run: the reference sanity_script.sh equivalent.

Two modes:

* structural (default): encodes/decodes/evaluates a deterministic
  synthetic clip end-to-end with the tiny model and checks the
  invariants that must always hold (bitstream non-trivial, decode
  consumes only the bitstream and matches the encoder's closed loop
  bit-exactly, per-chunk entropy coding lossless, metrics finite).

* golden (--golden [--update]): the committed regression pin the
  reference keeps in sanity_script.sh (reference: src/sanity_script.sh:
  5-14 pins PSNR 26.72133 / MS-SSIM 0.93531 / 28429 bytes for its
  pretrained model, README.md:155-171).  Runs the FLAGSHIP checkpoint
  on a fixed held-out clip (photowarp, 416x240, RA GOP16 intra-period
  32 — the reference sanity coding config) and compares byte count
  EXACTLY and metrics to 1e-3 against docs/golden_sanity.json.
  --update rewrites the golden (only on deliberate promotion).
  The golden is pinned on the CPU backend: CPU runs are reproducible
  on the CI box, TPU-vs-CPU bf16 differences would make a TPU golden
  unverifiable in CI (tests/test_golden.py runs the comparison).

Usage: python scripts/sanity.py [--cpu] [--golden [--update]]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

GOLDEN_PATH = REPO / "docs" / "golden_sanity.json"
# Mirrors the reference sanity coding config (RA, GOP 16, intra period
# 32 — src/sanity_script.sh:9-11) on the held-out photowarp clip.
GOLDEN_CFG = dict(ckpt="models_ckpt/bf16-r5", h=240, w=416, frames=33,
                  gop_size=16, intra_period=32, idx_rate=4.0)

# Multi-config golden suite (VERDICT r3 item 9): the flagship pinned
# across coding structures and resolutions so quality regressions are
# caught by CI, not by ad-hoc eval scripts.  All pins are CPU-backend
# (reproducible on the CI box); the 720p row runs in the slow tier.
SUITE_PATH = REPO / "docs" / "golden_suite.json"
SUITE_CFGS = {
    "ra_240p": dict(coding="RA", h=240, w=416, frames=17, gop_size=8,
                    intra_period=16, idx_rate=4.0, family="photowarp"),
    "ldp_240p": dict(coding="LDP", h=240, w=416, frames=9, gop_size=0,
                     intra_period=8, idx_rate=4.0, family="parallax"),
    "ai_240p": dict(coding="AI", h=240, w=416, frames=3, gop_size=0,
                    intra_period=0, idx_rate=4.0, family="rotpan"),
    "ra_720p": dict(coding="RA", h=720, w=1280, frames=9, gop_size=8,
                    intra_period=8, idx_rate=4.0, family="photowarp",
                    slow=True),
}


def run_golden_config(cfg: dict) -> dict:
    """Encode+decode the golden clip; returns measured {bytes, psnr,
    ms_ssim}.  Deterministic per backend."""
    from eval_data import heldout_clips

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import (decode_video, encode_video,
                                         evaluate_frames)
    from aivc_tpu.utils.checkpoint import load_checkpoint

    frames = heldout_clips(cfg["frames"], cfg["h"], cfg["w"],
                           names=["photowarp"])[0]
    mcfg, params = load_checkpoint(str(REPO / cfg["ckpt"]))
    codec = FrameCodec(mcfg, params, cfg["h"], cfg["w"])
    coding = CodingConfig(coding_config="RA", gop_size=cfg["gop_size"],
                          intra_period=cfg["intra_period"],
                          idx_rate=cfg["idx_rate"])
    res = encode_video(codec, frames, coding, wave_batch=4)
    dec = decode_video(codec, res.bitstream)
    m = evaluate_frames(frames, dec)
    return {"bytes": int(res.total_bytes),
            "psnr": round(float(m["psnr"]), 5),
            "ms_ssim": round(float(m["ms_ssim"]), 5)}


def run_suite_config(name: str, cfg: dict, ckpt: str) -> dict:
    """One suite pin: encode+decode a fixed held-out clip, return
    {bytes, psnr, ms_ssim}."""
    from eval_data import heldout_clips

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import (decode_video, encode_video,
                                         evaluate_frames)
    from aivc_tpu.utils.checkpoint import load_checkpoint

    frames = heldout_clips(cfg["frames"], cfg["h"], cfg["w"],
                           names=[cfg["family"]])[0]
    mcfg, params = load_checkpoint(str(REPO / ckpt))
    codec = FrameCodec(mcfg, params, cfg["h"], cfg["w"])
    kw = dict(coding_config=cfg["coding"], idx_rate=cfg["idx_rate"])
    if cfg["coding"] == "RA":
        kw.update(gop_size=cfg["gop_size"], intra_period=cfg["intra_period"])
    elif cfg["coding"] == "LDP":
        kw.update(intra_period=cfg["intra_period"])
    coding = CodingConfig(**kw)
    res = encode_video(codec, frames, coding, wave_batch=4)
    dec = decode_video(codec, res.bitstream)
    m = evaluate_frames(frames, dec)
    return {"bytes": int(res.total_bytes),
            "psnr": round(float(m["psnr"]), 5),
            "ms_ssim": round(float(m["ms_ssim"]), 5)}


def suite(update: bool, ckpt: str = GOLDEN_CFG["ckpt"],
          include_slow: bool = False) -> int:
    data = (json.loads(SUITE_PATH.read_text())
            if SUITE_PATH.exists() and not update else
            {"ckpt": ckpt, "backend": "cpu", "pins": {}})
    rc = 0
    dirty = False
    for name, cfg in SUITE_CFGS.items():
        if cfg.get("slow") and not include_slow:
            continue
        got = run_suite_config(name, cfg, data["ckpt"])
        if update or name not in data["pins"]:
            data["pins"][name] = {"config": cfg, "expect": got}
            dirty = True
            print(f"[SUITE] {name}: pinned {got}")
            continue
        expect = data["pins"][name]["expect"]
        ok = (got["bytes"] == expect["bytes"]
              and abs(got["psnr"] - expect["psnr"]) < 1e-3
              and abs(got["ms_ssim"] - expect["ms_ssim"]) < 1e-3)
        print(f"[SUITE] {name}: "
              f"{'OK ' + str(got) if ok else f'REGRESSION! {got} != {expect}'}")
        rc = rc if ok else 1
    if dirty:
        SUITE_PATH.write_text(json.dumps(data, indent=1))
    return rc


def golden(update: bool) -> int:
    cfg = dict(GOLDEN_CFG)
    if GOLDEN_PATH.exists() and not update:
        cfg.update({k: v for k, v in json.loads(
            GOLDEN_PATH.read_text())["config"].items()})
    got = run_golden_config(cfg)
    print(f"[GOLDEN] ckpt                  : {cfg['ckpt']}")
    print(f"[GOLDEN] bitstream bytes       : {got['bytes']}")
    print(f"[GOLDEN] psnr                  : {got['psnr']:.5f} dB")
    print(f"[GOLDEN] ms-ssim               : {got['ms_ssim']:.5f}")
    if update or not GOLDEN_PATH.exists():
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(
            {"config": cfg, "expect": got, "backend": "cpu"}, indent=1))
        print(f"[GOLDEN] written -> {GOLDEN_PATH}")
        return 0
    expect = json.loads(GOLDEN_PATH.read_text())["expect"]
    ok = (got["bytes"] == expect["bytes"]
          and abs(got["psnr"] - expect["psnr"]) < 1e-3
          and abs(got["ms_ssim"] - expect["ms_ssim"]) < 1e-3)
    print(f"[GOLDEN] {'OK' if ok else f'REGRESSION! expected {expect}'}")
    return 0 if ok else 1


def structural():
    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import (decode_video, encode_video,
                                         evaluate_frames)
    from aivc_tpu.utils.debug import check_md5_manifest, write_md5_manifest
    from bench import synthetic_frames

    h, w, n = 240, 416, 9
    frames = synthetic_frames(n, h, w, seed=1234)
    _, params = init_fullnet(TINY, jax.random.PRNGKey(0))
    codec = FrameCodec(TINY, params, h, w, debug=True)

    coding = CodingConfig(coding_config="RA", gop_size=8, intra_period=8)
    res = encode_video(codec, frames, coding)
    assert res.total_bytes > 100, "suspiciously small bitstream"

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        manifest = Path(td) / "m.json"
        write_md5_manifest(res.decoded_frames, manifest)
        decoded = decode_video(codec, res.bitstream)
        assert check_md5_manifest(decoded, manifest, verbose=False), \
            "encoder/decoder drift!"

    m = evaluate_frames(frames, decoded)
    assert np.isfinite(m["psnr"])
    print(f"[SANITY] frames                : {n}")
    print(f"[SANITY] bitstream bytes       : {res.total_bytes}")
    print(f"[SANITY] rate bpp              : "
          f"{res.total_bytes * 8 / (h * w * n):.4f}")
    print(f"[SANITY] psnr                  : {m['psnr']:.5f} dB")
    print(f"[SANITY] ms-ssim               : {m['ms_ssim']:.5f}")
    print(f"[SANITY] enc/dec               : bit-exact")
    print("[SANITY] OK")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--golden", action="store_true")
    ap.add_argument("--suite", action="store_true",
                    help="multi-config golden suite (docs/golden_suite.json)")
    ap.add_argument("--slow", action="store_true",
                    help="include the slow (720p) suite rows")
    ap.add_argument("--update", action="store_true",
                    help="rewrite the golden from this run (promotion)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.suite:
        return suite(args.update, include_slow=args.slow)
    return golden(args.update) if args.golden else structural()


if __name__ == "__main__":
    sys.exit(main())
