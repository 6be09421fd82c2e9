"""Dump the optimized HLO of the mof_synth_maps stage and summarize the
copy/fusion ops by shape — identifies what the relayout copies in the
trace actually move (companion to trace_synth.py)."""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="models_ckpt/bf16-r5")
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--stage", default="mof_synth_maps",
                    choices=["mof_synth_maps", "cod_synth"])
    ap.add_argument("--out", default="/tmp/synth_hlo.txt")
    args = ap.parse_args()

    from aivc_tpu.config import FRAME_B
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.utils.checkpoint import load_checkpoint

    cfg, params = load_checkpoint(args.ckpt)
    codec = FrameCodec(cfg, params, args.h, args.w)
    B, H, W = args.batch, codec.hp, codec.wp
    rng = np.random.default_rng(0)
    rate = jnp.float32(3.0)
    frame = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    prev = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    nxt = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    p = codec.params
    y_m, z_qm = codec._mof_analyze(p, frame, prev, nxt, rate, ftype=FRAME_B)
    mu_m, bins_m = codec._mof_hyper(p, z_qm)
    y_cqm = codec._y_quant(y_m, mu_m)[0]

    if args.stage == "mof_synth_maps":
        lowered = codec._mof_synth_maps.lower(
            p, y_cqm, mu_m, prev, nxt, rate, ftype=FRAME_B)
    else:
        mof = codec._mof_synth(p, y_cqm, mu_m, prev, nxt, rate,
                               ftype=FRAME_B)
        lowered = codec._cod_synth.lower(
            p, y_cqm, mu_m, mof["pred"], mof["skip"], rate, ftype=FRAME_B)
    compiled = lowered.compile()
    txt = compiled.as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {len(txt)} bytes -> {args.out}")

    # Summarize copy ops: name = copy(shape{layout} <- shape{layout})
    for line in txt.splitlines():
        m = re.search(r"(%?\S*copy\S*) = (\S+) copy\((\S+) (\S+)\)", line)
        if m:
            print(f"  {m.group(1)[:40]:40s} {m.group(2)} <- operand")
    # fusion roots are harder; just print lines defining big fusions
    for line in txt.splitlines():
        if re.search(r" = \S+ fusion\(", line) and "kind=kLoop" in line:
            pass


if __name__ == "__main__":
    main()
