"""Microbenchmark of the device rANS encode/decode programs.

The shared-relay TPU backend acks block_until_ready before work completes;
a scalar device->host pull is the only reliable sync (see
scripts/warp_bench.py), so every rep ends by pulling the word-count
scalar / the first symbol.

Usage:
  python scripts/vrans_bench.py [--n 1900544] [--k 1024] [--reps 5]
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


def main():
    ap = argparse.ArgumentParser()
    # default n: one B-frame's fused stream at 1080p for the base config
    # (z_m 24480 + y_m 783360 + z_c 32640 + y_c 1044480, each padded to K)
    ap.add_argument("--n", type=int, default=1900544)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rows", type=int, default=176,
                    help="CDF row count (z channels + sigma bins)")
    args = ap.parse_args()

    from aivc_tpu.coding import vrans
    from aivc_tpu.coding.cdf import build_laplace_table

    rng = np.random.default_rng(0)
    lap = build_laplace_table(scale=vrans.PROB_SCALE)  # [64, 513]
    reps_rows = -(-args.rows // lap.shape[0])
    cdf = np.concatenate([lap] * reps_rows, axis=0)[: args.rows]
    enc_t = vrans.make_enc_tables(cdf)
    dec_t = vrans.make_dec_tables(cdf)

    n, k, b = args.n, args.k, args.batch
    # Laplace-ish symbols centred on 256 (mostly near-zero residuals)
    sym = np.clip(np.round(rng.laplace(0, 3.0, size=(b, n))), -255, 255
                  ).astype(np.int32) + 256
    rows = rng.integers(0, args.rows, size=(b, n), dtype=np.int32)
    sym_d = jnp.asarray(sym)
    rows_d = jnp.asarray(rows)

    import functools

    @functools.partial(jax.jit,
                       static_argnames=("n", "k", "n_sym", "pad_sym"))
    def enc(sym, rows, pack, cdf_f32, n, k, n_sym, pad_sym):
        # Table ARRAYS ride as jit arguments (closure capture commits
        # them as device buffers and blocks scan optimizations — see
        # vrans.py note); the int fields must stay STATIC, so the
        # NamedTuple is rebuilt inside from split-out parts.
        t = vrans.EncTables(pack=pack, cdf_f32=cdf_f32, pad_sym=pad_sym,
                            n_symbols=n_sym)
        return jax.vmap(lambda s, r: vrans.encode_impl(
            s, r, t, n=n, k=k, n_sym=n_sym, pad_sym=pad_sym))(sym, rows)

    def run_enc():
        buf, states, total = enc(sym_d, rows_d, enc_t.pack, enc_t.cdf_f32,
                                 n, k, enc_t.n_symbols, enc_t.pad_sym)
        t = np.asarray(total)  # forced pull = real sync
        return buf, states, t

    # warm-up + correctness vs chunk decode
    buf, states, total = run_enc()
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_enc()
        times.append(time.perf_counter() - t0)
    print(f"encode fused  n={n} k={k} b={b}: {min(times)*1e3:9.2f} ms "
          f"({min(times)*1e3/b:.2f} ms/chunk, {int(total.max())} words max)")

    # Pallas encode kernel (same stream bytes; VMEM-resident)
    if vrans._enc_pallas_ok(n, k):
        cdf512 = enc_t.cdf_f32[:, 1:]

        @functools.partial(jax.jit, static_argnames=("n", "k"))
        def enc_pal(sym, rows, cdf512, n, k):
            return vrans.encode_pallas_batch(sym, rows, cdf512, n=n, k=k,
                                             pad_sym=enc_t.pad_sym)

        def run_enc_pal():
            buf_p, st_p, seg_g, g0 = enc_pal(sym_d, rows_d, cdf512, n, k)
            gmin = np.asarray(seg_g)  # forced pull = real sync
            return buf_p, st_p, gmin, int(g0)

        try:
            buf_p, st_p, seg_g, g0 = run_enc_pal()
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                run_enc_pal()
                times.append(time.perf_counter() - t0)
            print(f"encode pallas n={n} k={k} b={b}: {min(times)*1e3:9.2f} ms "
                  f"({min(times)*1e3/b:.2f} ms/chunk)")
            # exactness vs the XLA stream
            bp = np.asarray(buf_p)
            tot = np.asarray(total)
            bx = np.asarray(buf)
            for i in range(b):
                w_pal = bp[i, int(seg_g[i, 0]):g0]
                assert np.array_equal(w_pal, bx[i, :int(tot[i])]), \
                    f"pallas/xla stream mismatch at {i}"
            assert np.array_equal(np.asarray(st_p), np.asarray(states))
            print("pallas == xla stream: ok")
        except Exception as e:  # Mosaic lowering may fail on some toolchains
            print(f"encode pallas FAILED: {type(e).__name__}: {e}")

    # decode: words on device, forced pull of one symbol
    _, n_pad = vrans.plan(n, k)
    m = vrans.bucket(int(total.max()), n_pad)
    wb = np.asarray(buf)[:, :m]
    words_d = jnp.asarray(wb)
    states_d = jnp.asarray(np.asarray(states))

    def run_dec():
        syms = vrans.decode_batch(words_d, states_d, rows_d, dec_t, n=n, k=k)
        return np.asarray(syms[:, :1])

    run_dec()
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_dec()
        times.append(time.perf_counter() - t0)
    print(f"decode fused  n={n} k={k} b={b}: {min(times)*1e3:9.2f} ms "
          f"({min(times)*1e3/b:.2f} ms/chunk)")

    # lossless check
    syms = np.asarray(vrans.decode_batch(words_d, states_d, rows_d, dec_t,
                                         n=n, k=k))
    assert np.array_equal(syms, sym), "round trip mismatch"
    print("lossless: ok")


if __name__ == "__main__":
    main()
