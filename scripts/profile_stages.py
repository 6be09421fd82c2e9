"""Per-stage wall-clock profile of the frame codec on the current backend.

Times each compiled stage (steady state, after warm-up), the entropy
backends, and host<->device transfers separately, so optimization targets
the actual bottleneck (SURVEY.md §5: the reference has no per-stage
timers).

Usage:
  python scripts/profile_stages.py [--model tiny|base|bf16|ckpt:<dir>]
                                   [--h 1080] [--w 1920] [--batch 4]
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


def timeit(fn, n=6):
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
    ap.add_argument("--batch", type=int, default=1,
                    help="wave batch size to profile the B stages at")
    args = ap.parse_args()

    from aivc_tpu.config import FRAME_B, FRAME_P, ModelConfig
    from aivc_tpu.models.zoo import BASE_BF16, TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from bench import synthetic_frames

    if args.model.startswith("ckpt:"):
        from aivc_tpu.utils.checkpoint import load_checkpoint

        cfg, params = load_checkpoint(args.model[5:])
    else:
        cfg = {"tiny": TINY, "base": ModelConfig(), "bf16": BASE_BF16}[
            args.model]
        _, params = init_fullnet(cfg, jax.random.PRNGKey(0), spatial=64)
    codec = FrameCodec(cfg, params, args.h, args.w)
    p = codec.params
    k = args.batch

    frames = synthetic_frames(k + 1, args.h, args.w)
    frame = jnp.concatenate(
        [codec.ref_to_444(frames[i]) for i in range(k)], axis=0)
    prev = jnp.concatenate([codec.ref_to_444(frames[-1])] * k, axis=0)
    rate = jnp.float32(0.0)
    ftype = FRAME_B if k > 1 else FRAME_P

    rows = []

    def add(name, secs):
        rows.append((name, secs * 1e3))
        print(f"  {name:<34} {secs * 1e3:9.2f} ms", flush=True)

    print(f"stage profile: model={cfg.name} {args.w}x{args.h} "
          f"batch={k} ftype={ftype} backend={jax.default_backend()}",
          flush=True)

    add("ref_to_444 (incl. transfer)",
        timeit(lambda: codec.ref_to_444(frames[0])))

    y_m, z_qm = codec._mof_analyze(p, frame, prev, prev, rate, ftype=ftype)
    add("mof_analyze",
        timeit(lambda: codec._mof_analyze(p, frame, prev, prev, rate,
                                          ftype=ftype)))
    mu_m, bins_m = codec._mof_hyper(p, z_qm)
    add("mof_hyper", timeit(lambda: codec._mof_hyper(p, z_qm)))
    y_cqm = codec._y_quant(y_m, mu_m)
    add("y_quant(mof)", timeit(lambda: codec._y_quant(y_m, mu_m)))
    add("mof_synth_maps",
        timeit(lambda: codec._mof_synth_maps(p, y_cqm[0], mu_m, frame, prev,
                                             rate, ftype=ftype)))
    maps = codec._mof_synth_maps(
        p, y_cqm[0], mu_m, frame, prev, rate, ftype=ftype)
    if codec.cfg.mofnet.maps_cm:
        add("motion_comp (warp)",
            timeit(lambda: codec._motion_comp(frame, prev, maps,
                                              ftype=ftype)))
    else:
        alpha, beta, v_prev, v_next = maps
        add("motion_comp (warp)",
            timeit(lambda: codec._motion_comp(frame, prev, alpha, beta,
                                              v_prev, v_next,
                                              ftype=ftype)))
    mof = codec._mof_synth(p, y_cqm[0], mu_m, frame, prev, rate, ftype=ftype)
    pred, skip = mof["pred"], mof["skip"]
    y_c, z_qc = codec._cod_analyze(p, frame, pred, rate, ftype=ftype)
    add("cod_analyze",
        timeit(lambda: codec._cod_analyze(p, frame, pred, rate, ftype=ftype)))
    mu_c, bins_c = codec._cod_hyper(p, z_qc)
    add("cod_hyper", timeit(lambda: codec._cod_hyper(p, z_qc)))
    y_cqc = codec._y_quant(y_c, mu_c)
    add("cod_synth (incl. cast)",
        timeit(lambda: codec._cod_synth(p, y_cqc[0], mu_c, pred, skip, rate,
                                        ftype=ftype)))
    planes_dev, _ = codec._cod_synth(p, y_cqc[0], mu_c, pred, skip, rate,
                                     ftype=ftype)

    # ---- device entropy backend (vrans fused stream) ----
    kk = codec._pick_k(ftype)
    add(f"vrans enc fused (K={kk}, xla)",
        timeit(lambda: codec._vrenc_fused_pb(
            z_qm, y_cqm[0], bins_m, z_qc, y_cqc[0], bins_c,
            codec.vr_enc, k=kk)))
    n_total, _ = codec._fused_n(ftype, kk)
    if codec._use_pallas_enc(n_total, kk):
        # the route production actually takes on TPU
        add(f"vrans enc fused (K={kk}, pallas)",
            timeit(lambda: codec._vrenc_fused_pb_pal(
                z_qm, y_cqm[0], bins_m, z_qc, y_cqc[0], bins_c,
                codec.vr_dec.cdf512_f32, k=kk)))
    res = codec._vrenc_fused_pb(z_qm, y_cqm[0], bins_m, z_qc, y_cqc[0],
                                bins_c, codec.vr_enc, k=kk)
    handles = {"k": k, "frame_type": ftype,
               "vr": {"res": res, "k": kk, "fmt": "xla",
                      "cols": [0, 1, 2, 3]},
               "mof": mof, "decoded": [],
               "z_qm": z_qm, "y_cqm": y_cqm, "bins_m": bins_m,
               "z_qc": z_qc, "y_cqc": y_cqc, "bins_c": bins_c}

    buf, states, totals, segw = res
    totals_np = np.asarray(totals)
    mmax = int(totals_np.max())
    from aivc_tpu.coding import vrans

    m = vrans.bucket(mmax, buf.shape[1])

    def pull_words():
        return np.asarray(codec._prefix_cols(buf, m=m))

    t = timeit(pull_words, n=3)
    add(f"pull words ({k}x{m} u16)", t)

    fbs, _, _ = codec.encode_frames_finish(dict(handles))
    add("frame bytes", sum(len(fb) for fb in fbs) / 1e6 / 1000)  # MB row

    # decode path (staged)
    prev_refs = [frames[-1]] * k

    def dec():
        return codec.decode_frames_batch(
            fbs, [codec.ref_to_444(f) for f in prev_refs],
            [codec.ref_to_444(f) for f in prev_refs], ftype, 0.0)

    decs = dec()
    add("decode_frames_batch (full)",
        timeit(lambda: dec(), n=3))

    t0 = time.perf_counter()
    _ = decs[0].planes
    add("pull decoded planes (wave)", time.perf_counter() - t0)

    # host entropy backend for comparison
    z_np = np.asarray(z_qc, np.int32)
    y_np = np.asarray(y_cqc[0], np.int16)
    b_np = np.asarray(bins_c)
    from aivc_tpu.coding import bitstream as bs

    t0 = time.perf_counter()
    cy = bs.encode_y_chunk(y_np[0], b_np[0], codec.laplace_rows)
    add("host rANS encode y (1 frame)", time.perf_counter() - t0)
    t0 = time.perf_counter()
    bs.decode_y_chunk(cy, y_np[0].shape, b_np[0], codec.laplace_rows)
    add("host rANS decode y (1 frame)", time.perf_counter() - t0)

    print("\nsummary (min over reps):")
    for name, ms in rows:
        print(f"  {name:<34} {ms:9.2f} ms")


if __name__ == "__main__":
    main()
