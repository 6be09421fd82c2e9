"""Device-side vectorized rANS: entropy coding that runs ON the TPU.

The reference keeps entropy coding on the host (torchac C++ symbol loop,
reference: src/real_life/bitstream.py:281,454) and ships every latent plus
its per-element CDF parameters across the PCIe/host boundary.  The host
backend here (coding/range_coder.py) mirrors that split and inherits its
cost: at 1080p each coded frame moves several MB of quantized latents and
scale-bin indices host<->device, which dominates the pipeline on real
hardware (docs/STATUS.md).

This module removes the boundary: an interleaved K-stream rANS coder
written as jit-compiled JAX integer ops, so the *only* per-frame traffic
is the compressed bytes themselves.

Design (the TPU-native analogue of multi-stream GPU entropy coders):

* K independent rANS streams, symbol i assigned to (step i // K, lane
  i % K) — a [S, K] strided layout, so each scan step consumes one
  contiguous vector of K symbols.  K is chosen from n alone and recorded
  in the chunk header.
* Word-based rANS: 32-bit state x in [2^16, 2^32), 16-bit renormalization,
  PROB_BITS = 16.  One conditional emission per symbol per step (encode)
  and one conditional read (decode), the standard single-renorm invariant.
* Encode scans steps in REVERSE (rANS is LIFO), recording a (word, flag)
  pair per (step, lane); a cumsum + scatter compacts the flagged words
  into the exact byte order the decoder consumes: steps ascending, lanes
  ascending within a step.  The decoder's renorm condition reproduces the
  flags, so no per-stream sizes or offsets are stored — only the K final
  states (the information content of the streams) and the word count.
* All arithmetic is uint32/int32: XLA integer ops are exact and
  deterministic on every backend, so encoder and decoder agree bit-for-bit
  across chips — the integer analogue of the reference's determinism
  contract (reference: src/func_util/cluster_mngt.py:27-37).

Chunk wire format (payload of one coded latent chunk):

  [1B  log2(K)]
  [4B  BE word count W]
  [K*4B BE final states]
  [W*2B BE words]

Tables: integer CDF rows quantized to PROB_SCALE = 2^16 (coding/cdf.py
quantize_pmf with scale=PROB_SCALE), packed for single-gather access:

  enc_pack[r, s]    = start | freq << 16          (u32, [R, 512])
  dec_sym[r, slot]  = symbol                     (i32, [R, 65536], CPU)
  dec_pack[r, slot] = start | freq << 16        (u32, [R, 65536], CPU)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROB_BITS = 16            # CDF quantization: min symbol cost 2^-16
# 16 matches the reference's torchac CDF resolution (PROBA_MIN = 2^-16,
# reference: src/func_util/math_func.py:20-24): near-deterministic rows
# (zero latents under a tiny sigma) cost ~0.011 bits/symbol instead of
# the ~0.045 a 14-bit table floors at — several KB/frame at 1080p.
# Exactness everywhere still holds: CDF values < 2^16 < 2^24 are exact
# in f32, and the encode division uses base-256 chunks (remainder
# accumulators < freq * 256 < 2^24).
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 16          # state lower bound; emit/read 16-bit words
K_MIN = 8
# 2048 = the 16-sublane Pallas width: halves the sequential rANS step
# count at 1080p.  The CDF lookup is tiled to 8-sublane blocks
# (_cdf_dec_lookup8), so the 16-sublane kernels fit scoped VMEM with
# real tables, and the per-width runtime probe still gates the route;
# the XLA fallback handles any K.  K rides in the chunk header, so the
# policy cap can move without breaking old bitstreams.
K_MAX = 2048

_U32 = jnp.uint32
# NOTE: these must stay plain Python ints.  A module-level jnp scalar is a
# committed device buffer; closure-capturing one into a jit turns it into a
# runtime parameter that blocks XLA's scan optimizations — measured 400x
# slower on TPU for the encode core.
_MASK16 = 0xFFFF
_SLOT_MASK = PROB_SCALE - 1


def pick_k(n: int) -> int:
    """Stream count for an n-symbol chunk: the largest power of two with
    ~512+ symbols per stream, in [K_MIN, K_MAX].  Recorded in the chunk
    header, so the policy can change without breaking old bitstreams."""
    if n <= 0:
        return K_MIN
    k = K_MIN
    while k < K_MAX and (n >> 1) // k >= 256:
        k *= 2
    return k


def plan(n: int, k: int) -> Tuple[int, int]:
    """(S, n_pad) for an n-symbol chunk over k streams."""
    s = max(1, -(-n // k))
    return s, s * k


class EncTables(NamedTuple):
    """Device-side tables for encoding against one CDF-row family."""

    pack: jax.Array      # u32 [R * N_SYMBOLS] start | freq << 16
    cdf_f32: jax.Array   # f32 [R, N_SYMBOLS + 1] (exact: values < 2^24)
    pad_sym: int         # most probable symbol of row 0 (pads the tail)
    n_symbols: int


class DecTables(NamedTuple):
    """Device-side tables for decoding.

    sym/pack are the slot-indexed inverse CDF used only by the 'gather'
    method (CPU); at PROB_SCALE = 2^16 they are [R, 65536] — built only
    when the default backend is not TPU (TPU decodes via the comparison
    method / the Pallas kernel, which need just the CDF rows)."""

    sym: Optional[jax.Array]       # i32 [R * PROB_SCALE] | None
    pack: Optional[jax.Array]      # u32 [R * PROB_SCALE] | None
    cdf_f32: jax.Array   # f32 [R, N_SYMBOLS + 1]
    cdf512_f32: jax.Array  # f32 [R, N_SYMBOLS] = cdf_f32[:, 1:] (pallas)
    n_symbols: int


def make_enc_tables(cdf_rows: np.ndarray) -> EncTables:
    """cdf_rows: [R, N_SYMBOLS + 1] uint32 with cdf[:, -1] == PROB_SCALE."""
    cdf_rows = np.asarray(cdf_rows, dtype=np.uint32)
    if cdf_rows[:, -1].max() != PROB_SCALE or cdf_rows[:, -1].min() != PROB_SCALE:
        raise ValueError(f"CDF rows must be quantized to {PROB_SCALE}")
    start = cdf_rows[:, :-1]
    freq = np.diff(cdf_rows.astype(np.int64), axis=1).astype(np.uint32)
    if freq.min() < 1:
        raise ValueError("zero-frequency symbol in CDF row")
    pack = (start | (freq << 16)).astype(np.uint32)
    pad_sym = int(np.argmax(freq[0]))
    return EncTables(
        pack=jnp.asarray(pack.reshape(-1)),
        cdf_f32=jnp.asarray(cdf_rows.astype(np.float32)),
        pad_sym=pad_sym,
        n_symbols=cdf_rows.shape[1] - 1,
    )


def make_dec_tables(cdf_rows: np.ndarray,
                    inverse: Optional[bool] = None) -> DecTables:
    cdf_rows = np.asarray(cdf_rows, dtype=np.uint32)
    n_sym = cdf_rows.shape[1] - 1
    cdf_f32 = cdf_rows.astype(np.float32)
    if inverse is None:
        inverse = jax.default_backend() != "tpu"
    sym_j = pack_j = None
    if inverse:
        start = cdf_rows[:, :-1]
        freq = np.diff(cdf_rows.astype(np.int64), axis=1).astype(np.uint32)
        # inverse CDF: slot -> symbol, per row (via searchsorted)
        slots = np.arange(PROB_SCALE, dtype=np.uint32)
        sym = np.empty((cdf_rows.shape[0], PROB_SCALE), dtype=np.int32)
        for r in range(cdf_rows.shape[0]):
            sym[r] = np.searchsorted(cdf_rows[r], slots, side="right") - 1
        rows = np.arange(cdf_rows.shape[0])[:, None]
        pack = (start[rows, sym] | (freq[rows, sym] << 16)).astype(np.uint32)
        sym_j = jnp.asarray(sym.reshape(-1))
        pack_j = jnp.asarray(pack.reshape(-1))
    return DecTables(
        sym=sym_j,
        pack=pack_j,
        cdf_f32=jnp.asarray(cdf_f32),
        cdf512_f32=jnp.asarray(np.ascontiguousarray(cdf_f32[:, 1:])),
        n_symbols=n_sym,
    )


# ---------------------------------------------------------------------------
# Table lookup strategies
# ---------------------------------------------------------------------------
# 'gather': direct dynamic gathers — fast on CPU, slow on TPU (random
#   HBM gathers don't vectorize).
# 'matmul': one-hot [K, R] x cdf [R, 513] matmul (MXU) + comparison/
#   masked-reduce selects, no gathers.  EXACTNESS: one operand is exactly
#   {0, 1} and CDF values are integers <= 2^16 < 2^24, so every product and the
#   single-nonzero accumulation are exact in f32 at HIGHEST precision.
#   Both strategies therefore produce IDENTICAL bitstreams; the choice is
#   per-platform and never recorded in the stream.

def _default_method() -> str:
    return "matmul" if jax.default_backend() == "tpu" else "gather"


def _row_cdf(r: jax.Array, cdf_f32: jax.Array) -> jax.Array:
    """[K] row indices -> [K, 513] exact f32 CDF rows via one-hot matmul."""
    n_rows = cdf_f32.shape[0]
    oh = (r[:, None] == jnp.arange(n_rows, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    return jnp.dot(oh, cdf_f32, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# jit cores (shapes static per (n, K); integer-exact on every backend)
# ---------------------------------------------------------------------------

def encode_impl(sym: jax.Array, rows: jax.Array, tables: EncTables,
                n: int, k: int, n_sym: int, pad_sym: int,
                method: str = "auto", segment_steps: tuple = ()):
    """sym, rows: i32 [n] (symbol in [0, n_sym), CDF row per element).

    Returns (words u16 [n_pad], states u32 [K], total i32 scalar): the
    compacted word stream in decode order, final stream states, and the
    real word count (words[total:] is garbage).  Traceable (not jitted):
    callers fuse it into larger programs or vmap it over a batch.

    segment_steps: optional static step counts partitioning the stream
    (sum == S).  When given, a fourth output reports the word count of
    each segment — used by the frame-fused format, where one stream
    carries several chunks decoded in stages.
    """
    if method == "auto":
        method = _default_method()
    s_steps, n_pad = plan(n, k)
    sym = jnp.pad(sym.astype(jnp.int32), (0, n_pad - n),
                  constant_values=pad_sym)
    rows = jnp.pad(rows.astype(jnp.int32), (0, n_pad - n), constant_values=0)

    # The (start, freq) lookup is state-independent, so it is hoisted OUT
    # of the sequential scan and done for all n_pad elements at once —
    # the scan body is then pure u32 arithmetic, which XLA runs at full
    # VPU rate (the in-scan variants are HBM-bound on TPU).
    if method == "gather":
        pk = tables.pack[rows * n_sym + sym]
        start_all, freq_all = pk & _MASK16, pk >> 16
    else:
        CH = 8192
        pad2 = (-n_pad) % CH
        s3 = jnp.pad(sym, (0, pad2)).reshape(-1, CH)
        r3 = jnp.pad(rows, (0, pad2)).reshape(-1, CH)
        iota_r = jnp.arange(tables.cdf_f32.shape[0], dtype=jnp.int32)
        edges = jnp.arange(n_sym + 1, dtype=jnp.int32)

        def lk(_, inp):
            s, r = inp
            oh = (r[:, None] == iota_r[None, :]).astype(jnp.float32)
            rc = jnp.dot(oh, tables.cdf_f32,
                         precision=jax.lax.Precision.HIGHEST)
            oh_s = (edges[None, :] == s[:, None]).astype(jnp.float32)
            oh_s1 = (edges[None, :] == (s + 1)[:, None]).astype(jnp.float32)
            start = jnp.sum(rc * oh_s, axis=1)
            nxt = jnp.sum(rc * oh_s1, axis=1)
            return 0, (start, nxt - start)

        _, (st3, fr3) = jax.lax.scan(lk, 0, (s3, r3))
        start_all = st3.reshape(-1)[:n_pad].astype(_U32)
        freq_all = fr3.reshape(-1)[:n_pad].astype(_U32)

    start2 = start_all.reshape(s_steps, k)
    freq2 = freq_all.reshape(s_steps, k)

    def step(x, inp):
        start, freq = inp
        # x_max = ((RANS_L >> PROB_BITS) << 16) * freq; freq <= 2^16 - 511 so the
        # u32 shift cannot overflow.
        x_max = freq << (32 - PROB_BITS)
        emit = x >= x_max
        word = (x & _MASK16).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        q = x // freq
        x = (q << PROB_BITS) + (x - q * freq) + start
        return x, (word, emit)

    # The scan bodies are a handful of [K]-wide integer ops — per-step
    # fixed overhead (loop bookkeeping, buffer threading) dominates, so
    # unroll several steps per loop iteration.  Unrolling changes no
    # values, only scheduling: bitstreams are unchanged.
    unroll = 8 if s_steps >= 64 else 1
    x0 = jnp.full((k,), RANS_L, dtype=_U32)
    states, (words, flags) = jax.lax.scan(step, x0, (start2, freq2),
                                          reverse=True, unroll=unroll)

    # Compact flagged words into decode order (steps ascending, lanes
    # ascending within a step) with a second forward scan: each step packs
    # its <= K flagged words to the front of a K-slot row (small in-step
    # scatter) and appends it at the running offset with a full-width
    # dynamic_update_slice — the garbage tail of one append is overwritten
    # by the next, so no global scatter is ever needed (a global
    # [n_pad]-scatter is ~300x slower on TPU).
    def pack_step(carry, inp):
        out, g = carry
        w, f = inp
        fi = f.astype(jnp.int32)
        rank = jnp.cumsum(fi) - fi
        idx = jnp.where(f, rank, k)
        packed = jnp.zeros((k + 1,), jnp.uint16).at[idx].set(
            w, mode="drop")[:k]
        out = jax.lax.dynamic_update_slice(out, packed, (g,))
        return (out, g + fi.sum()), None

    out0 = jnp.zeros((n_pad + k,), jnp.uint16)
    (buf, total), _ = jax.lax.scan(pack_step, (out0, jnp.int32(0)),
                                   (words, flags), unroll=unroll)
    if segment_steps:
        if sum(segment_steps) != s_steps:
            raise ValueError("segment_steps must sum to the step count")
        per_step = flags.astype(jnp.int32).sum(axis=1)
        seg_words = []
        pos = 0
        for ss in segment_steps:
            seg_words.append(per_step[pos:pos + ss].sum())
            pos += ss
        return buf[:n_pad], states, total, jnp.stack(seg_words)
    return buf[:n_pad], states, total


_encode_core = jax.jit(
    encode_impl,
    static_argnames=("n", "k", "n_sym", "pad_sym", "method",
                     "segment_steps"))


def decode_impl(words: jax.Array, states: jax.Array, rows: jax.Array,
                tables: DecTables, n: int, k: int, n_sym: int,
                method: str = "auto", g0=0, return_carry: bool = False):
    """words: u16 [>= total]; states: u32 [K]; rows: i32 [n].

    Returns symbols i32 [n] (plus (states, g) when return_carry, for
    staged decoding of a fused stream: each stage resumes where the
    previous one stopped).  Traceable (not jitted); see encode_impl.
    """
    if method == "auto":
        method = _default_method()
    s_steps, n_pad = plan(n, k)
    rows = jnp.pad(rows.astype(jnp.int32), (0, n_pad - n), constant_values=0)
    rows2 = rows.reshape(s_steps, k)

    def lookup(slot, r):
        if method == "gather":
            idx = r * PROB_SCALE + slot.astype(jnp.int32)
            s = tables.sym[idx]
            pk = tables.pack[idx]
            return s, pk & _MASK16, pk >> 16
        # Comparison-based inverse CDF on the MXU-produced exact rows:
        # sym = #{j >= 1 : cdf[j] <= slot}; start = max cdf[j] <= slot;
        # next = min cdf[j] > slot.  No 16K-wide inverse table needed.
        rc = _row_cdf(r, tables.cdf_f32)                   # [K, 513]
        slot_f = slot.astype(jnp.float32)[:, None]
        le = rc <= slot_f
        s = jnp.sum(le[:, 1:], axis=1).astype(jnp.int32)
        start = jnp.max(jnp.where(le, rc, 0.0), axis=1)
        nxt = jnp.min(jnp.where(le, jnp.float32(np.inf), rc), axis=1)
        return s, start.astype(_U32), (nxt - start).astype(_U32)

    def step(carry, r):
        x, g = carry
        slot = x & _SLOT_MASK
        s, start, freq = lookup(slot, r)
        x = freq * (x >> PROB_BITS) + slot - start
        need = x < RANS_L
        need_i = need.astype(jnp.int32)
        rank = jnp.cumsum(need_i) - need_i
        w = words[(g + rank).astype(jnp.int32)].astype(_U32)
        x = jnp.where(need, (x << 16) | w, x)
        return (x, g + need_i.sum()), s

    (xf, gf), syms = jax.lax.scan(
        step, (states, jnp.asarray(g0, jnp.int32)), rows2,
        unroll=8 if s_steps >= 64 else 1)
    syms = syms.reshape(n_pad)[:n]
    if return_carry:
        return syms, xf, gf
    return syms


_decode_core = jax.jit(
    decode_impl,
    static_argnames=("n", "k", "n_sym", "method", "return_carry"))


# ---------------------------------------------------------------------------
# Pallas TPU decode kernel
# ---------------------------------------------------------------------------
# XLA cannot run the decode loop fast: the table lookup sits on the
# sequential critical path and every step round-trips [K, 513]
# intermediates through HBM (~45 us/step measured on v5e).  This kernel
# keeps the words, the CDF table and the stream states resident in VMEM
# and expresses both data-dependent lookups as one-hot contractions on
# the MXU:
#
#   * slot -> (sym, start, freq): rc = onehot(rows) @ cdf  ([8,128,512]),
#     sym by counting rc <= slot, start/next by one-hot selects — exact
#     in f32 (values <= 2^16 < 2^24, one-hot operands are {0,1}).
#   * word feed: a 128-aligned dynamic window of the word stream is
#     sliced per step and distributed to the lanes that renormalize via a
#     (window-row one-hot) x (window-lane one-hot) contraction — exact in
#     f32 (words < 2^16 < 2^24).
#
# Lane order is k = sublane * 128 + lane, matching the [S, K] row-major
# reshape of the XLA paths, so all three methods are bit-identical.

_SUB = 8          # default sublanes per state tile; K = sub * 128
_SUBS = (8, 16)   # supported sublane counts (K = 1024 or 2048)


def _win_rows(sub: int) -> int:
    """Decode window rows: >= sub + 16, padded to the u16 sublane tile."""
    w = sub + 16
    return w + (-w) % 8


def _split_hi_lo(vals_f32):
    """f32 integer values < 2^16 -> (hi, lo) f32 byte planes.

    Each plane's values sit in [0, 256] and are therefore EXACT in bf16
    (8-bit mantissa): a DEFAULT-precision f32 dot against a one-hot
    operand runs as ONE bf16 MXU pass with f32 accumulation and is still
    exact — vs the ~6 passes of precision=HIGHEST the un-split 16-bit
    values need.  Two single-pass dots beat one six-pass dot ~3x on the
    lookup matmuls, which dominate the per-step kernel cost."""
    hi = jnp.floor(vals_f32 * (1.0 / 256.0))
    return hi, vals_f32 - hi * 256.0


def _onehot_dot(oh, hi, lo):
    """Exact one-hot contraction of 16-bit integer values via two
    DEFAULT-precision (single-MXU-pass) dots over byte planes."""
    num = (((oh.ndim - 1,), (0,)), ((), ()))
    rh = jax.lax.dot_general(oh, hi, dimension_numbers=num,
                             preferred_element_type=jnp.float32)
    rl = jax.lax.dot_general(oh, lo, dimension_numbers=num,
                             preferred_element_type=jnp.float32)
    return rh * 256.0 + rl


def _cdf_dec_lookup8(r8, slot8, hi_ref, lo_ref):
    """One 8-sublane tile of the decode lookup: [8, 128] (row, slot) ->
    (sym i32, start u32, freq u32) via the comparison-based inverse CDF.

    Kept at 8 sublanes regardless of the kernel's K so the [8, 128, 512]
    f32 intermediates stay VMEM-bounded: at 16 sublanes the un-tiled
    lookup alone exceeded the 16 MB scoped-VMEM limit with a real
    (many-row) CDF table (hardware compile OOM at 20.5 MB)."""
    n_rows = hi_ref.shape[0]
    oh_r = (r8[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (8, 128, n_rows), 2)).astype(jnp.float32)
    # rc[s, l, j] = cdf[r[s,l], j + 1]  (column 0 of the true CDF is 0
    # and is dropped so the table is exactly [R, 512])
    rc = _onehot_dot(oh_r, hi_ref[:], lo_ref[:])     # [8, 128, 512] exact
    # Mosaic has no u32<->f32 casts; all values fit int32, so hop via it.
    slot_f = slot8.astype(jnp.int32).astype(jnp.float32)
    le = rc <= slot_f[:, :, None]
    s = jnp.sum(le.astype(jnp.int32), axis=2)        # [8, 128] symbol
    # start/next via masked max/min on the monotone rows (same selects as
    # the XLA decode path, exact in f32) — one-hot select tensors would
    # add ~6 MB of VMEM stack per tile.
    start = jnp.max(jnp.where(le, rc, 0.0), axis=2).astype(
        jnp.int32).astype(jnp.uint32)                    # 0 when s==0
    nxt = jnp.min(jnp.where(le, jnp.float32(np.inf), rc), axis=2).astype(
        jnp.int32).astype(jnp.uint32)
    return s, start, nxt - start


def _cdf_enc_lookup8(r8, s8, hi_ref, lo_ref):
    """One 8-sublane tile of the encode lookup: [8, 128] (row, symbol) ->
    (start_f, freq_f) as exact f32 integers.  See _cdf_dec_lookup8 for
    why the tile is fixed at 8 sublanes."""
    n_rows = hi_ref.shape[0]
    n_sym = hi_ref.shape[1]
    oh_r = (r8[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (8, 128, n_rows), 2)).astype(jnp.float32)
    rc = _onehot_dot(oh_r, hi_ref[:], lo_ref[:])  # [8, 128, n_sym] exact
    # cdf[s] = max of the monotone row over columns <= s - 1 (column j of
    # rc holds cdf[j + 1]); masked maxes replace one-hot select tensors,
    # saving ~6 MB of VMEM stack per tile.  Exact in f32.
    e512 = jax.lax.broadcasted_iota(jnp.int32, (8, 128, n_sym), 2)
    m0 = e512 <= (s8 - 1)[:, :, None]
    m1 = e512 <= s8[:, :, None]
    start_f = jnp.max(jnp.where(m0, rc, 0.0), axis=2)    # 0 when s == 0
    nxt_f = jnp.max(jnp.where(m1, rc, 0.0), axis=2)
    return start_f, nxt_f - start_f


def _tiled8(fn, get_a, get_b, cdf_hi_ref, cdf_lo_ref, sub, scratch):
    """Apply an 8-sublane lookup tile-by-tile over [sub, 128] operands.

    get_a/get_b(off) load one [8, 128] tile at sublane offset `off`
    (ref slices, not value slices — Mosaic handles dynamic ref indexing).
    At sub == 8 this is a straight call.  At sub == 16 the two tiles run
    in a fori_loop whose results land in VMEM scratch refs: Mosaic does
    NOT reuse stack across statically unrolled tiles (two unrolled
    lookups measured 26.5 MB of scoped VMEM on v5e — over the 16 MB
    limit), but a real loop body's stack is reused across iterations."""
    if sub == 8:
        return fn(get_a(0), get_b(0), cdf_hi_ref, cdf_lo_ref)

    def tile(i, _):
        off = pl.multiple_of(i * 8, 8)
        outs = fn(get_a(off), get_b(off), cdf_hi_ref, cdf_lo_ref)
        for ref, val in zip(scratch, outs):
            ref[pl.ds(off, 8), :] = val
        return 0

    jax.lax.fori_loop(0, sub // 8, tile, 0)
    return tuple(ref[:] for ref in scratch)


def _decode_pallas_kernel(sub, rows_ref, words_ref, states_ref, g0_ref,
                          cdf_hi_ref, cdf_lo_ref, out_ref, states_out_ref,
                          g_out_ref, x_ref, g_ref, *lk_refs):
    t = pl.program_id(1)

    bb = pl.program_id(0)
    win_rows = _win_rows(sub)

    @pl.when(t == 0)
    def _():
        x_ref[:] = states_ref[0]
        g_ref[0] = g0_ref[bb, 0]

    x = x_ref[:]                                     # [sub, 128] u32
    slot = x & _SLOT_MASK

    s, start, freq = _tiled8(
        _cdf_dec_lookup8,
        lambda off: rows_ref[0, pl.ds(off, 8), :],
        lambda off: x_ref[pl.ds(off, 8), :] & _SLOT_MASK,
        cdf_hi_ref, cdf_lo_ref, sub, lk_refs)

    x = freq * (x >> PROB_BITS) + slot - start
    # x < 2^16 as a sign-free test: Mosaic compares of uint32 can go
    # through signed lanes, so avoid ordered comparison on full-range u32.
    need = (x >> 16) == 0
    need_i = need.astype(jnp.int32)

    # rank = exclusive prefix count in lane order (row-major [8, 128]).
    # Mosaic has no cumsum; prefix sums become lower-triangular matmuls
    # (exact in f32: 0/1 operands, sums <= 1024).
    need_f = need_i.astype(jnp.float32)
    lt128 = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
             <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
             ).astype(jnp.float32)
    row_c = jax.lax.dot_general(
        need_f, lt128, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [8, 128] inclusive
    row_tot = row_c[:, 127:128]                      # [sub, 1]
    lt_s = (jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
            ).astype(jnp.float32)
    row_off = jax.lax.dot_general(
        row_tot.reshape(1, sub), lt_s,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(sub, 1) - row_tot
    rank = (row_off + row_c).astype(jnp.int32) - need_i  # [sub, 128]

    # 128-aligned window of the word stream covering [g, g + K]
    g = g_ref[0]
    row0 = pl.multiple_of((g // 2048) * 16, 16)
    # The u16 window may be sign-extended on load (Mosaic treats it as
    # i16); & 0xFFFF recovers the unsigned word bits before the byte
    # split (_split_hi_lo needs non-negative values).
    win_i = words_ref[0, pl.ds(row0, win_rows), :].astype(jnp.int32) & 0xFFFF
    win_hi, win_lo = _split_hi_lo(win_i.astype(jnp.float32))
    idx = (g - row0 * 128) + rank                    # in [0, win_rows*128)
    wr = idx // 128
    wl = idx % 128
    oh_wr = (wr[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (sub, 128, win_rows), 2)).astype(jnp.float32)
    tmp = _onehot_dot(oh_wr, win_hi, win_lo)         # [8, 128, 128] exact
    oh_wl = (wl[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (sub, 128, 128), 2)).astype(jnp.float32)
    wv = jnp.sum(tmp * oh_wl, axis=2).astype(jnp.int32).astype(jnp.uint32)

    x = jnp.where(need, (x << 16) | wv, x)
    x_ref[:] = x
    g_ref[0] = g + jnp.sum(need_i)
    out_ref[0] = s

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        states_out_ref[0] = x_ref[:]
        g_out_ref[bb, 0] = g_ref[0]


def _pallas_ok(n: int, k: int) -> bool:
    # Both widths are auto-eligible: the CDF lookup is tiled to 8-sublane
    # blocks (_cdf_dec_lookup8), so the 16-sublane kernels no longer blow
    # the scoped-VMEM limit.  The runtime probe (below, with a real-sized
    # CDF table) still gates each width on this toolchain.
    if k % 128 or k // 128 not in _SUBS:
        return False
    _, n_pad = plan(n, k)
    # words VMEM footprint (u16) + headroom for the [sub,128,512] f32
    # intermediates; beyond this fall back to the XLA matmul method.
    return n_pad * 2 <= 6 * 1024 * 1024


def decode_batch(words: jax.Array, states: jax.Array, rows: jax.Array,
                 tables: DecTables, n: int, k: int,
                 method: str = "auto", g0: Optional[jax.Array] = None,
                 return_carry: bool = False):
    """Decode a batch of chunks: words [B, >= needed] u16, states [B, K],
    rows [B, n] i32 -> symbols i32 [B, n].

    method 'auto' picks the Pallas kernel on TPU when the chunk fits in
    VMEM, the XLA matmul scan otherwise, and gathers on CPU.  All methods
    are bit-identical.  g0/return_carry support staged decoding of a
    fused frame stream (see decode_impl).
    """
    if method == "auto":
        if (jax.default_backend() == "tpu" and _pallas_ok(n, k)
                and tables.cdf512_f32.shape[0] <= PROBE_ROWS
                and pallas_runtime_ok("dec", k // 128,
                                      tables.cdf512_f32.shape[1])):
            method = "pallas"
        else:
            method = _default_method()
    if method == "pallas":
        return decode_pallas_batch(words, states, rows, tables.cdf512_f32,
                                   n=n, k=k, g0=g0,
                                   return_carry=return_carry)
    if g0 is None:
        g0 = jnp.zeros((words.shape[0],), jnp.int32)
    return jax.vmap(lambda w, st, r, g: decode_impl(
        w, st, r, tables, n=n, k=k, n_sym=tables.n_symbols,
        method=method, g0=g, return_carry=return_carry)
    )(words, states, rows, jnp.asarray(g0, jnp.int32))


def decode_pallas_batch(words: jax.Array, states: jax.Array,
                        rows: jax.Array, cdf512_f32: jax.Array,
                        n: int, k: int, interpret: bool = False,
                        g0: Optional[jax.Array] = None,
                        return_carry: bool = False):
    """Batched Pallas decode: words [B, >= n_pad words from offset 0] u16,
    states [B, K] u32, rows [B, n] i32 -> symbols i32 [B, n].

    g0 [B] i32: per-stream-set word offset (staged fused decoding);
    return_carry additionally returns (states_out [B, K], g_out [B])."""
    if k % 128 or k // 128 not in _SUBS:
        raise ValueError(f"pallas decode requires K/128 in {_SUBS}")
    sub = k // 128
    win_rows = _win_rows(sub)
    s_steps, n_pad = plan(n, k)
    b = words.shape[0]
    # Word buffer padded so any 16-row-aligned window read stays in range.
    n_words = words.shape[1]
    wr_rows = -(-n_words // 128) + 2 * win_rows
    wr_rows += (-wr_rows) % 16
    w3 = jnp.zeros((b, wr_rows, 128), jnp.uint16)
    wpad = jnp.pad(words, ((0, 0), (0, (-n_words) % 128)))
    w3 = w3.at[:, :wpad.shape[1] // 128, :].set(
        wpad.reshape(b, -1, 128))
    rows_p = jnp.pad(rows.astype(jnp.int32), ((0, 0), (0, n_pad - n)))
    rows3 = rows_p.reshape(b, s_steps * sub, 128)
    states3 = states.astype(jnp.uint32).reshape(b, sub, 128)
    if g0 is None:
        g0 = jnp.zeros((b,), jnp.int32)
    g02 = jnp.asarray(g0, jnp.int32).reshape(b, 1)

    out, states_o, g_o = pl.pallas_call(
        functools.partial(_decode_pallas_kernel, sub),
        grid=(b, s_steps),
        in_specs=[
            pl.BlockSpec((1, sub, 128), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wr_rows, 128), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda bb, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(cdf512_f32.shape,
                         lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cdf512_f32.shape,
                         lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda bb, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_steps * sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, sub, 128), jnp.uint32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ] + ([pltpu.VMEM((sub, 128), jnp.int32),
              pltpu.VMEM((sub, 128), jnp.uint32),
              pltpu.VMEM((sub, 128), jnp.uint32)] if sub > 8 else []),
        interpret=interpret,
    )(rows3, w3, states3, g02, *_split_hi_lo(cdf512_f32))
    syms = out.reshape(b, n_pad)[:, :n]
    if return_carry:
        return syms, states_o.reshape(b, k), g_o.reshape(b)
    return syms


# ---------------------------------------------------------------------------
# Pallas TPU encode kernel
# ---------------------------------------------------------------------------
# The XLA encode path is two sequential scans (rANS arithmetic + word
# compaction) whose per-step work is a handful of [K]-wide integer ops —
# wall clock is dominated by per-step loop overhead even with unrolling.
# This kernel runs the whole encode in one pass with everything resident
# in VMEM, using the same building blocks as the decode kernel: one-hot
# MXU contractions for the (start, freq) lookup, triangular-matmul prefix
# sums for lane ranks, and one-hot shift matmuls for word placement.
#
# Key idea — descending write cursor: rANS encodes steps in REVERSE, but
# the decoder consumes words with steps ASCENDING.  Instead of a second
# forward compaction pass, the kernel writes step t's words at
# [g - W_t, g) with a cursor g that starts at the buffer END and
# decreases; the finished stream is buf_flat[g_final:g0], already in
# decode order.  Exact u32 division by freq (the one primitive decode
# does not need) is schoolbook base-512 long division in f32: every
# intermediate is an exact integer < 2^23.
#
# Segment word counts (the fused-frame format's per-chunk byte split)
# fall out of cursor snapshots at the (static) segment-start steps.

_WIN_W = 32       # RMW window rows per step: >= 8 (K/128) + 1 + 15 align


def _enc_div_u32(x, freq_f):
    """Exact (q, rem) = divmod(x, freq) for u32 x, freq < 2^PROB_BITS.

    Base-256 long division; remainders stay < freq <= 2^16 so every f32
    intermediate is an exact integer < 2^24.  TPU f32 division is
    reciprocal-based (NOT correctly rounded, either direction), but each
    chunk quotient is < 256 so the error is far below one unit: one
    fixup in each direction restores exactness.
    """
    chunks = ((x >> 24).astype(jnp.int32),
              ((x >> 16) & 0xFF).astype(jnp.int32),
              ((x >> 8) & 0xFF).astype(jnp.int32),
              (x & 0xFF).astype(jnp.int32))
    rem = jnp.zeros(x.shape, jnp.float32)
    q = jnp.zeros(x.shape, _U32)
    for c in chunks:
        r = rem * 256.0 + c.astype(jnp.float32)      # < freq * 256 < 2^24
        qd = jnp.floor(r / freq_f)
        rem = r - qd * freq_f
        over = rem < 0.0
        qd = jnp.where(over, qd - 1.0, qd)
        rem = jnp.where(over, rem + freq_f, rem)
        under = rem >= freq_f
        qd = jnp.where(under, qd + 1.0, qd)
        rem = jnp.where(under, rem - freq_f, rem)
        q = (q << 8) | qd.astype(jnp.int32).astype(_U32)
    return q, rem.astype(jnp.int32).astype(_U32)


def _encode_pallas_kernel(seg_ts, sub, sym_ref, rows_ref, cdf_hi_ref,
                          cdf_lo_ref, words_ref, states_out_ref, segg_ref,
                          x_ref, g_ref, *lk_refs):
    t = pl.program_id(1)
    bb = pl.program_id(0)
    wrb = words_ref.shape[1]
    g0 = (wrb - _WIN_W) * 128

    @pl.when(t == 0)
    def _():
        x_ref[:] = jnp.full((sub, 128), RANS_L, _U32)
        g_ref[0] = g0
        words_ref[0] = jnp.zeros((wrb, 128), jnp.uint16)

    # (start, freq) lookup — identical scheme to the decode kernel,
    # tiled to 8-sublane blocks (see _cdf_enc_lookup8).
    start_f, freq_f = _tiled8(
        _cdf_enc_lookup8,
        lambda off: rows_ref[0, pl.ds(off, 8), :],
        lambda off: sym_ref[0, pl.ds(off, 8), :],
        cdf_hi_ref, cdf_lo_ref, sub, lk_refs)
    start = start_f.astype(jnp.int32).astype(_U32)

    # rANS step (reverse order: the grid index map feeds blocks reversed).
    x = x_ref[:]
    # emit iff x >= freq << (32 - PROB_BITS); after the shift both sides
    # are < 2^PROB_BITS <= 2^16, so the i32 comparison is sign-safe.
    emit = ((x >> (32 - PROB_BITS)).astype(jnp.int32)
            >= freq_f.astype(jnp.int32))
    word = (x & _MASK16).astype(jnp.int32)           # captured pre-renorm
    x = jnp.where(emit, x >> 16, x)
    q, rem = _enc_div_u32(x, freq_f)
    x_ref[:] = (q << PROB_BITS) + rem + start

    # Lane ranks in row-major (sublane, lane) order — triangular matmuls.
    emit_i = emit.astype(jnp.int32)
    emit_f = emit_i.astype(jnp.float32)
    lt128 = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
             <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
             ).astype(jnp.float32)
    row_c = jax.lax.dot_general(
        emit_f, lt128, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [8, 128] inclusive
    row_tot = row_c[:, 127:128]                    # [sub, 1] per-sublane
    lt_s = (jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
            ).astype(jnp.float32)
    base_excl = jax.lax.dot_general(
        row_tot.reshape(1, sub), lt_s,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(sub, 1) - row_tot
    # inclusive in-row count minus emit = exclusive rank WITHIN the row;
    # non-emitting lanes get rank -1 (matches no one-hot column) so the
    # pack mask below is a single i32 comparison — Mosaic cannot reshape
    # 1-D i1 vectors ("minor dim insertion only for 32-bit types"), so
    # the bool mask must never be sliced per sublane.
    local_rank = jnp.where(emit, row_c.astype(jnp.int32) - emit_i,
                           jnp.int32(-1))

    w_t = jnp.sum(emit_i)
    g_new = g_ref[0] - w_t
    p0 = g_new
    r0a = pl.multiple_of(((p0 // 128) // 16) * 16, 16)

    # Per-sublane consecutive runs: sublane s's flagged words occupy
    # [p0 + base_s, p0 + base_s + cnt_s) in lane order.  Compact each row,
    # lane-shift it to its global offset, and accumulate a [WIN, 128]
    # contribution via one-hot outer products.
    word_f = word.astype(jnp.float32)
    e128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    e128b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ewin = jax.lax.broadcasted_iota(jnp.int32, (_WIN_W, 1), 0)
    contrib = jnp.zeros((_WIN_W, 128), jnp.float32)
    base_i = base_excl.astype(jnp.int32)             # [sub, 1]
    for srow in range(sub):
        # oh_pack[l, j] = (local_rank[l] == j); non-emitting lanes carry
        # rank -1 and match nothing.
        oh_pack = (e128b == local_rank[srow][:, None]).astype(jnp.float32)
        packed = jax.lax.dot_general(
            word_f[srow].reshape(1, 128), oh_pack,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [1, 128]
        pos_s = p0 + base_i[srow, 0]
        qs = pos_s % 128
        rs = pos_s // 128 - r0a
        sh_lo = ((e128b == e128 + qs)).astype(jnp.float32)
        sh_hi = ((e128b == e128 + qs - 128)).astype(jnp.float32)
        # Every dot whose non-one-hot operand carries WORD VALUES (up to
        # 2^16) must run at HIGHEST precision: the MXU's default f32 mode
        # multiplies bf16-truncated operands, which zeroes the low 8 bits
        # of the words (caught on hardware; interpret mode is full f32).
        low = jax.lax.dot_general(
            packed, sh_lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        high = jax.lax.dot_general(
            packed, sh_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        oh_lo = (ewin == rs).astype(jnp.float32)      # [WIN, 1]
        oh_hi = (ewin == rs + 1).astype(jnp.float32)
        contrib = contrib + jax.lax.dot_general(
            oh_lo, low, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        contrib = contrib + jax.lax.dot_general(
            oh_hi, high, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    win = (words_ref[0, pl.ds(r0a, _WIN_W), :].astype(jnp.int32)
           & 0xFFFF)
    win = win + contrib.astype(jnp.int32)
    words_ref[0, pl.ds(r0a, _WIN_W), :] = win.astype(jnp.uint16)
    g_ref[0] = g_new

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        states_out_ref[0] = x_ref[:]

    # Cursor snapshots at (static) segment-start steps: segment i's words
    # start where the cursor sits after its FIRST real step is encoded.
    for i, t_i in enumerate(seg_ts):
        @pl.when(t == t_i)
        def _(i=i):
            segg_ref[bb, i] = g_ref[0]


def encode_pallas_batch(sym: jax.Array, rows: jax.Array,
                        cdf512_f32: jax.Array, n: int, k: int,
                        pad_sym: int, segment_steps: tuple = (),
                        interpret: bool = False):
    """Batched Pallas encode: sym/rows i32 [B, n] -> (buf u16 [B, WRB*128],
    states u32 [B, K], seg_g i32 [B, NSEG], g0 int).

    The word stream of batch element b is buf[b, seg_g[b, 0]:g0] (decode
    order); segment i's words are buf[b, seg_g[b, i]:seg_g[b, i + 1]]
    with seg_g[b, NSEG] == g0.  Bit-identical to encode_impl.
    """
    if k % 128 or k // 128 not in _SUBS:
        raise ValueError(f"pallas encode requires K/128 in {_SUBS}")
    sub = k // 128
    s_steps, n_pad = plan(n, k)
    b = sym.shape[0]
    sym_p = jnp.pad(sym.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
                    constant_values=pad_sym)
    rows_p = jnp.pad(rows.astype(jnp.int32), ((0, 0), (0, n_pad - n)))
    sym3 = sym_p.reshape(b, s_steps * sub, 128)
    rows3 = rows_p.reshape(b, s_steps * sub, 128)

    wr = -(-n_pad // 128)
    wr += (-wr) % 16
    wrb = wr + _WIN_W

    segs = segment_steps if segment_steps else (s_steps,)
    if sum(segs) != s_steps:
        raise ValueError("segment_steps must sum to the step count")
    starts = np.cumsum((0,) + tuple(segs))[:-1]      # real step of seg start
    seg_ts = tuple(int(s_steps - 1 - st) for st in starts)

    kern = functools.partial(_encode_pallas_kernel, seg_ts, sub)
    buf, states_o, seg_g = pl.pallas_call(
        kern,
        grid=(b, s_steps),
        in_specs=[
            pl.BlockSpec((1, sub, 128),
                         lambda bb, t: (bb, s_steps - 1 - t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128),
                         lambda bb, t: (bb, s_steps - 1 - t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cdf512_f32.shape,
                         lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cdf512_f32.shape,
                         lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, wrb, 128), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, len(seg_ts)), lambda bb, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, wrb, 128), jnp.uint16),
            jax.ShapeDtypeStruct((b, sub, 128), jnp.uint32),
            jax.ShapeDtypeStruct((b, len(seg_ts)), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sub, 128), _U32),
            pltpu.SMEM((1,), jnp.int32),
        ] + ([pltpu.VMEM((sub, 128), jnp.float32),
              pltpu.VMEM((sub, 128), jnp.float32)] if sub > 8 else []),
        interpret=interpret,
    )(sym3, rows3, *_split_hi_lo(cdf512_f32))
    g0 = (wrb - _WIN_W) * 128
    return buf.reshape(b, wrb * 128), states_o.reshape(b, k), seg_g, g0


def _enc_pallas_ok(n: int, k: int) -> bool:
    if k % 128 or k // 128 not in _SUBS:   # see _pallas_ok
        return False
    _, n_pad = plan(n, k)
    return n_pad * 2 <= 6 * 1024 * 1024


# One-time runtime probes: Mosaic lowering depends on the toolchain, so
# "compiles in interpret mode" does not guarantee "lowers on this TPU"
# (a 1-D i1 reshape and default-precision word matmuls both bit us on
# hardware).  Auto mode probe-compiles each kernel once per process and
# quietly falls back to the bit-identical XLA route on ANY failure — a
# kernel regression must never take down encoding itself.
_PALLAS_PROBE: dict = {}

# Probe-table height.  The probe result is cached per (kind, sub) for the
# whole process, so auto mode must only trust it for production tables no
# taller than what was actually probed: VMEM compile OOMs scale with the
# CDF row count (ADVICE r1).  Tables taller than this route through XLA in
# auto mode (explicit AIVC_VRANS_ENC=pallas still forces the kernel).
PROBE_ROWS = 192


def pallas_runtime_ok(kind: str, sub: int = _SUB,
                      n_sym: int = 512) -> bool:
    got = _PALLAS_PROBE.get((kind, sub, n_sym))
    if got is None:
        k = sub * 128
        try:
            # The probe table is sized like a REAL fused table (z channels
            # + sigma bins ~ 176 rows for the flagship): VMEM compile OOMs
            # scale with the row count AND the alphabet width, so a 1-row
            # probe would pass while production tables fail (exactly the
            # 16-sublane hardware OOM mode this probe exists to catch).
            n_rows = PROBE_ROWS
            cdf = np.tile(np.arange(n_sym + 1, dtype=np.uint32) * (
                PROB_SCALE // n_sym), (n_rows, 1))
            cdf[:, -1] = PROB_SCALE
            cdf512 = jnp.asarray(cdf[:, 1:].astype(np.float32))
            if kind == "enc":
                out = encode_pallas_batch(
                    jnp.zeros((1, k), jnp.int32), jnp.zeros((1, k), jnp.int32),
                    cdf512, n=k, k=k, pad_sym=0)
                jax.block_until_ready(out[1])
            else:
                out = decode_pallas_batch(
                    jnp.zeros((1, 4096), jnp.uint16),
                    jnp.full((1, k), RANS_L, jnp.uint32),
                    jnp.zeros((1, k), jnp.int32), cdf512, n=k, k=k)
                jax.block_until_ready(out)
            got = True
        except Exception as e:  # noqa: BLE001 — any lowering/compile error
            import warnings

            warnings.warn(f"pallas {kind} kernel (K={k}) unavailable; "
                          f"using the XLA path ({type(e).__name__})")
            got = False
        _PALLAS_PROBE[(kind, sub, n_sym)] = got
    return got


# ---------------------------------------------------------------------------
# Host-facing chunk API
# ---------------------------------------------------------------------------

def encode_launch(vals_dev: jax.Array, rows_dev: jax.Array,
                  tables: EncTables, n: int, k: int | None = None):
    """Queue the device encode of one chunk; no host sync.

    vals_dev: i32 [n] symbols (already shifted to [0, n_symbols)).
    rows_dev: i32 [n] CDF row per element.
    Returns opaque handles for encode_finish.
    """
    if k is None:
        k = pick_k(n)
    buf, states, total = _encode_core(vals_dev, rows_dev, tables,
                                      n=n, k=k, n_sym=tables.n_symbols,
                                      pad_sym=tables.pad_sym)
    return {"buf": buf, "states": states, "total": total, "k": k, "n": n}


@functools.partial(jax.jit, static_argnames=("m",))
def _prefix(buf, m: int):
    return buf[:m]


def bucket(total: int, n_pad: int) -> int:
    """Round a word count up to a power-of-two bucket (min 4096), capped at
    n_pad — bounds the number of compiled prefix/pad programs."""
    m = 4096
    while m < total:
        m *= 2
    return min(m, n_pad)


def serialize_chunk(k: int, states: np.ndarray, words: np.ndarray) -> bytes:
    """[1B log2 K][4B BE word count][K*4B BE states][words BE]."""
    out = bytearray()
    out.append(int(k).bit_length() - 1)
    out.extend(int(words.size).to_bytes(4, "big"))
    out.extend(np.asarray(states).astype(">u4").tobytes())
    out.extend(np.asarray(words).astype(">u2").tobytes())
    return bytes(out)


# Format v2 (high bit of the K byte): the fused frame stream elides
# all-zero y feature maps (the device analogue of the reference's
# zero-feature-map elision, reference: src/real_life/bitstream.py:237-255).
# Per-frame channel bitmaps ride in the chunk; the wave-shared gather
# bucket is DERIVED from the bitmaps on both sides, so batched waves
# keep one compiled program per (bucket, K) and enc/dec stay bit-exact.
CHUNK_V2 = 0x80


def serialize_chunk_v2(k: int, states: np.ndarray, words: np.ndarray,
                       bitmaps) -> bytes:
    """[1B log2 K | 0x80][1B n_bitmaps]([1B len][bitmap])* then the v1
    tail: [4B BE word count][K*4B BE states][words BE]."""
    out = bytearray()
    out.append((int(k).bit_length() - 1) | CHUNK_V2)
    out.append(len(bitmaps))
    for bm in bitmaps:
        out.append(len(bm))
        out.extend(bm)
    out.extend(int(words.size).to_bytes(4, "big"))
    out.extend(np.asarray(states).astype(">u4").tobytes())
    out.extend(np.asarray(words).astype(">u2").tobytes())
    return bytes(out)


def chan_bitmap(mask: np.ndarray) -> bytes:
    """bool [C] -> little-endian-bit channel bitmap bytes."""
    return np.packbits(np.asarray(mask, bool), bitorder="little").tobytes()


def bitmap_channels(bm: bytes, c: int) -> np.ndarray:
    """bitmap bytes -> int32 indices of set channels (sorted)."""
    bits = np.unpackbits(np.frombuffer(bm, np.uint8), count=c,
                         bitorder="little")
    return np.nonzero(bits)[0].astype(np.int32)


def elide_bucket(c_max: int, c_total: int) -> int:
    """Wave-shared gather width: the smallest level in
    {0, C/8, C/4, C/2, C} covering the wave's largest kept-channel
    count.  STATIC python on both sides (part of the format)."""
    for lvl in sorted({0, -(-c_total // 8), -(-c_total // 4),
                       -(-c_total // 2), c_total}):
        if lvl >= c_max:
            return lvl
    return c_total


def encode_finish(handles) -> bytes:
    """Pull the compressed chunk (sync point) and serialize it."""
    k, n = handles["k"], handles["n"]
    _, n_pad = plan(n, k)
    total = int(handles["total"])
    states = np.asarray(handles["states"])
    if total > 0:
        m = bucket(total, n_pad)
        words = np.asarray(_prefix(handles["buf"], m))[:total]
    else:
        words = np.empty(0, np.uint16)
    return serialize_chunk(k, states, words)


def parse_chunk(payload: bytes, n: int):
    """Chunk bytes -> (words u16 [total], states u32 [K], k).  Host-only.
    v1 chunks only; v2 (elided) chunks go through parse_chunk_v2."""
    if payload[0] & CHUNK_V2:
        words, states, k, _ = parse_chunk_v2(payload)
        return words, states, k
    k = 1 << payload[0]
    total = int.from_bytes(payload[1:5], "big")
    pos = 5
    states = np.frombuffer(payload, dtype=">u4", count=k, offset=pos)
    pos += 4 * k
    words = np.frombuffer(payload, dtype=">u2", count=total, offset=pos)
    if pos + 2 * total != len(payload):
        raise ValueError("vrans chunk size mismatch")
    return words.astype(np.uint16), states.astype(np.uint32), k


def parse_chunk_v2(payload: bytes):
    """v2 chunk bytes -> (words, states, k, bitmaps list | None).

    Returns bitmaps=None for a v1 chunk (dense)."""
    first = payload[0]
    if not (first & CHUNK_V2):
        w, s, k = parse_chunk(payload, 0)
        return w, s, k, None
    k = 1 << (first & 0x7F)
    nbm = payload[1]
    pos = 2
    bitmaps = []
    for _ in range(nbm):
        ln = payload[pos]
        pos += 1
        bitmaps.append(payload[pos:pos + ln])
        pos += ln
    total = int.from_bytes(payload[pos:pos + 4], "big")
    pos += 4
    states = np.frombuffer(payload, dtype=">u4", count=k, offset=pos)
    pos += 4 * k
    words = np.frombuffer(payload, dtype=">u2", count=total, offset=pos)
    if pos + 2 * total != len(payload):
        raise ValueError("vrans v2 chunk size mismatch")
    return (words.astype(np.uint16), states.astype(np.uint32), k, bitmaps)


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _pad_words(words, n_pad: int):
    return jnp.pad(words, (0, n_pad - words.shape[0]))


def decode_device(payload: bytes, rows_dev: jax.Array, tables: DecTables,
                  n: int) -> jax.Array:
    """Decode one chunk fully on device; returns symbols i32 [n] (async).

    Only the compressed words + K states cross the host->device boundary;
    rows (e.g. sigma bins) stay on device.
    """
    words, states, k = parse_chunk(payload, n)
    _, n_pad = plan(n, k)
    m = bucket(max(len(words), 1), n_pad)
    w = np.zeros(m, np.uint16)
    w[:len(words)] = words
    words_dev = _pad_words(jnp.asarray(w), n_pad)
    return _decode_core(words_dev, jnp.asarray(states), rows_dev, tables,
                        n=n, k=k, n_sym=tables.n_symbols)


def encode_chunk(vals: np.ndarray, rows: np.ndarray,
                 tables: EncTables) -> bytes:
    """Synchronous convenience wrapper (tests, debug)."""
    n = int(np.asarray(vals).size)
    h = encode_launch(jnp.asarray(np.asarray(vals).reshape(-1), jnp.int32),
                      jnp.asarray(np.asarray(rows).reshape(-1), jnp.int32),
                      tables, n)
    return encode_finish(h)


def decode_chunk(payload: bytes, rows: np.ndarray,
                 tables: DecTables) -> np.ndarray:
    """Synchronous convenience wrapper (tests, debug)."""
    rows = np.asarray(rows).reshape(-1)
    out = decode_device(payload, jnp.asarray(rows, jnp.int32), tables,
                        int(rows.size))
    return np.asarray(out)
