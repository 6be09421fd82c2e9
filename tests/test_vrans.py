"""Device-side vectorized rANS: losslessness, rate, format properties."""

import numpy as np
import pytest

from aivc_tpu.coding import vrans
from aivc_tpu.coding.cdf import N_SYMBOLS, build_laplace_table, quantize_pmf


def _rand_cdf_rows(rng, n_rows, scale=vrans.PROB_SCALE, skew=1.0):
    """Random quantized CDF rows; skew > 1 concentrates mass."""
    pmf = rng.random((n_rows, N_SYMBOLS)) ** skew
    return quantize_pmf(pmf, scale)


def _roundtrip(vals, rows, cdf_rows):
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    payload = vrans.encode_chunk(vals, rows, enc)
    out = vrans.decode_chunk(payload, rows, dec)
    return payload, out


@pytest.mark.parametrize("n", [1, 7, 8, 63, 257, 4096, 10000])
def test_roundtrip_uniform_random(n):
    rng = np.random.default_rng(n)
    cdf_rows = _rand_cdf_rows(rng, 5)
    vals = rng.integers(0, N_SYMBOLS, size=n).astype(np.int32)
    rows = rng.integers(0, 5, size=n).astype(np.int32)
    payload, out = _roundtrip(vals, rows, cdf_rows)
    np.testing.assert_array_equal(out, vals)


def test_roundtrip_extreme_skew():
    """Rows where one symbol holds nearly all mass and the rest are at the
    minimum frequency 1 — the adversarial case for renorm logic."""
    rng = np.random.default_rng(0)
    pmf = np.full((3, N_SYMBOLS), 1e-12)
    pmf[0, 0] = 1.0
    pmf[1, N_SYMBOLS - 1] = 1.0
    pmf[2, 123] = 1.0
    cdf_rows = quantize_pmf(pmf, vrans.PROB_SCALE)
    n = 5000
    # Code mostly rare symbols (freq == 1): worst-case emission rate.
    vals = rng.integers(0, N_SYMBOLS, size=n).astype(np.int32)
    rows = rng.integers(0, 3, size=n).astype(np.int32)
    payload, out = _roundtrip(vals, rows, cdf_rows)
    np.testing.assert_array_equal(out, vals)
    # freq-1 symbols cost PROB_BITS bits each; total must stay near that.
    assert len(payload) < n * 2.5 + 8 * vrans.pick_k(n)


def test_roundtrip_most_probable_only():
    """All symbols maximally probable: output should be tiny."""
    pmf = np.full((1, N_SYMBOLS), 1e-12)
    pmf[0, 42] = 1.0
    cdf_rows = quantize_pmf(pmf, vrans.PROB_SCALE)
    n = 8192
    vals = np.full(n, 42, np.int32)
    rows = np.zeros(n, np.int32)
    payload, out = _roundtrip(vals, rows, cdf_rows)
    np.testing.assert_array_equal(out, vals)
    k = vrans.pick_k(n)
    # ~0.045 bits/sym + per-stream state overhead
    assert len(payload) < n * 0.05 / 8 + 4 * k + 64 + 2 * k


def test_rate_close_to_entropy():
    """Compressed size within a few percent of the coded entropy."""
    rng = np.random.default_rng(7)
    cdf_rows = build_laplace_table(scale=vrans.PROB_SCALE)
    n = 1 << 16
    rows = rng.integers(20, 40, size=n).astype(np.int32)
    freq = np.diff(cdf_rows.astype(np.int64), axis=1)
    # Sample symbols from each row's true coded distribution.
    vals = np.empty(n, np.int32)
    for r in np.unique(rows):
        m = rows == r
        p = freq[r] / freq[r].sum()
        vals[m] = rng.choice(N_SYMBOLS, size=m.sum(), p=p)
    payload, out = _roundtrip(vals, rows, cdf_rows)
    np.testing.assert_array_equal(out, vals)
    h_bits = -np.log2(freq[rows, vals] / float(vrans.PROB_SCALE)).sum()
    k = vrans.pick_k(n)
    overhead = 4 * k + 5
    assert len(payload) - overhead < h_bits / 8 * 1.02 + 2 * k


def test_k_policy_and_header():
    assert vrans.pick_k(0) == vrans.K_MIN
    assert vrans.pick_k(100) == vrans.K_MIN
    assert vrans.pick_k(1 << 20) == vrans.K_MAX
    ks = [vrans.pick_k(n) for n in range(1, 200000, 4096)]
    assert all(k & (k - 1) == 0 for k in ks)
    assert ks == sorted(ks)  # monotone in n

    rng = np.random.default_rng(3)
    cdf_rows = _rand_cdf_rows(rng, 2)
    vals = rng.integers(0, N_SYMBOLS, size=999).astype(np.int32)
    rows = rng.integers(0, 2, size=999).astype(np.int32)
    enc = vrans.make_enc_tables(cdf_rows)
    payload = vrans.encode_chunk(vals, rows, enc)
    words, states, k = vrans.parse_chunk(payload, 999)
    assert k == vrans.pick_k(999)
    assert states.shape == (k,)
    assert len(payload) == 5 + 4 * k + 2 * len(words)


def test_truncated_chunk_raises():
    rng = np.random.default_rng(4)
    cdf_rows = _rand_cdf_rows(rng, 2)
    vals = rng.integers(0, N_SYMBOLS, size=500).astype(np.int32)
    rows = np.zeros(500, np.int32)
    enc = vrans.make_enc_tables(cdf_rows)
    payload = vrans.encode_chunk(vals, rows, enc)
    with pytest.raises(ValueError):
        vrans.parse_chunk(payload[:-3], 500)


def test_explicit_k_override_roundtrips():
    """Any power-of-two K in range must roundtrip (policy independence)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    cdf_rows = _rand_cdf_rows(rng, 4, skew=3.0)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    n = 3000
    vals = rng.integers(0, N_SYMBOLS, size=n).astype(np.int32)
    rows = rng.integers(0, 4, size=n).astype(np.int32)
    for k in (8, 64, 512):
        h = vrans.encode_launch(jnp.asarray(vals), jnp.asarray(rows),
                                enc, n, k=k)
        payload = vrans.encode_finish(h)
        out = vrans.decode_chunk(payload, rows, dec)
        np.testing.assert_array_equal(out, vals)


def test_laplace_table_parity_with_host_scale():
    """The vrans-scale Laplace table stays a valid distribution per row."""
    t = build_laplace_table(scale=vrans.PROB_SCALE)
    assert t.shape[1] == N_SYMBOLS + 1
    assert (t[:, -1] == vrans.PROB_SCALE).all()
    assert (np.diff(t.astype(np.int64), axis=1) >= 1).all()


def test_gather_and_matmul_methods_bit_identical():
    """The one-hot-matmul lookup and the gather lookup must produce
    IDENTICAL bitstreams and decodes (platform choice never changes bits)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    cdf_rows = _rand_cdf_rows(rng, 7, skew=2.0)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    n = 5000
    vals = rng.integers(0, N_SYMBOLS, size=n).astype(np.int32)
    rows = rng.integers(0, 7, size=n).astype(np.int32)
    k = vrans.pick_k(n)

    payloads = {}
    for method in ("gather", "matmul"):
        buf, states, total = vrans._encode_core(
            jnp.asarray(vals), jnp.asarray(rows), enc,
            n=n, k=k, n_sym=N_SYMBOLS, pad_sym=enc.pad_sym, method=method)
        payloads[method] = vrans.serialize_chunk(
            k, np.asarray(states), np.asarray(buf)[:int(total)])
    assert payloads["gather"] == payloads["matmul"]

    words, states, kk = vrans.parse_chunk(payloads["gather"], n)
    _, n_pad = vrans.plan(n, kk)
    w = np.zeros(n_pad, np.uint16)
    w[:len(words)] = words
    for method in ("gather", "matmul"):
        out = vrans._decode_core(
            jnp.asarray(w), jnp.asarray(states), jnp.asarray(rows), dec,
            n=n, k=kk, n_sym=N_SYMBOLS, method=method)
        np.testing.assert_array_equal(np.asarray(out), vals)


def test_pallas_kernel_interpret_matches_gather():
    """The Pallas decode kernel (interpret mode, runs on CPU) must produce
    the same symbols as the gather method — validates the kernel logic
    (one-hot matmul lookup, window word feed, rank prefix sums) without
    TPU hardware."""
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    cdf_rows = build_laplace_table(scale=vrans.PROB_SCALE)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    n = 4000
    k = vrans._SUB * 128
    vals = rng.integers(180, 332, size=n).astype(np.int32)
    rows = rng.integers(0, cdf_rows.shape[0], size=n).astype(np.int32)
    h = vrans.encode_launch(jnp.asarray(vals), jnp.asarray(rows), enc, n, k=k)
    payload = vrans.encode_finish(h)
    words, states, kk = vrans.parse_chunk(payload, n)
    assert kk == k
    _, n_pad = vrans.plan(n, k)
    w = np.zeros((1, n_pad), np.uint16)
    w[0, :words.size] = words
    out = vrans.decode_pallas_batch(
        jnp.asarray(w), jnp.asarray(states)[None], jnp.asarray(rows)[None],
        dec.cdf512_f32, n=n, k=k, interpret=True)
    np.testing.assert_array_equal(np.asarray(out)[0], vals)


def test_pallas_batched_staged_decode_matches_xla():
    """The batched-in-step decode kernel (batch on the SUBLANE axis, one
    grid step per rANS step of ALL elements) must be bit-identical to the
    per-element XLA route, including per-element cursors (different
    payload sizes), staged fused decoding (g0 + carry), and per-element
    pad tails."""
    import jax.numpy as jnp

    rng = np.random.default_rng(47)
    cdf_rows = _rand_cdf_rows(rng, 12, skew=3.0)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    k = vrans._SUB * 128
    b = 3
    n1, n2 = 2 * k, 3 * k
    n = n1 + n2
    _, n_pad = vrans.plan(n, k)
    segs = (n1 // k, n2 // k)

    vals = np.stack([rng.integers(0, N_SYMBOLS, size=n).astype(np.int32)
                     * (1 if i else 0)  # element 0: all-pad_sym-ish lows
                     for i in range(b)])
    rows = np.stack([rng.integers(0, 12, size=n).astype(np.int32)
                     for _ in range(b)])
    bufs, states, totals, seg_w = [], [], [], []
    for i in range(b):
        buf, st, tot, sw = vrans.encode_impl(
            jnp.asarray(vals[i]), jnp.asarray(rows[i]), enc, n=n, k=k,
            n_sym=enc.n_symbols, pad_sym=enc.pad_sym, method="gather",
            segment_steps=segs)
        bufs.append(np.asarray(buf))
        states.append(np.asarray(st))
        totals.append(int(tot))
        seg_w.append(np.asarray(sw))
    m = max(vrans.bucket(t, n_pad) for t in totals)
    w = np.zeros((b, m), np.uint16)
    for i in range(b):
        w[i, :totals[i]] = bufs[i][:totals[i]]
    w_d = jnp.asarray(w)
    st_d = jnp.asarray(np.stack(states))
    r_d = jnp.asarray(rows)

    # whole-stream decode
    out = vrans.decode_pallas_batch(w_d, st_d, r_d, dec.cdf512_f32,
                                    n=n, k=k, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), vals)

    # staged decode with carry: segment 1 then segment 2, per-element g0
    s1, st1, g1 = vrans.decode_pallas_batch(
        w_d, st_d, r_d[:, :n1], dec.cdf512_f32, n=n1, k=k,
        interpret=True, return_carry=True)
    np.testing.assert_array_equal(np.asarray(s1), vals[:, :n1])
    np.testing.assert_array_equal(np.asarray(g1),
                                  np.stack(seg_w)[:, 0])
    s2 = vrans.decode_pallas_batch(
        w_d, jnp.asarray(st1), r_d[:, n1:], dec.cdf512_f32, n=n2, k=k,
        g0=g1, interpret=True)
    np.testing.assert_array_equal(np.asarray(s2), vals[:, n1:])


def _pad_seg(vals, rows, k, pad_sym, pad_row):
    """Pad a segment to a multiple of k with deterministic filler."""
    pad = (-len(vals)) % k
    return (np.concatenate([vals, np.full(pad, pad_sym, np.int32)]),
            np.concatenate([rows, np.full(pad, pad_row, np.int32)]))


@pytest.mark.parametrize("method", ["gather", "matmul"])
def test_fused_stream_staged_decode(method):
    """One rANS stream carrying two segments with different row families,
    decoded in two stages with (states, offset) carried between — the
    mechanism behind the frame-fused chunk format."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    cdf_rows = _rand_cdf_rows(rng, 10, skew=2.0)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    k = 64
    n1, n2 = 1000, 1500
    v1 = rng.integers(0, N_SYMBOLS, size=n1).astype(np.int32)
    r1 = rng.integers(0, 5, size=n1).astype(np.int32)
    v2 = rng.integers(0, N_SYMBOLS, size=n2).astype(np.int32)
    r2 = rng.integers(5, 10, size=n2).astype(np.int32)
    v1p, r1p = _pad_seg(v1, r1, k, 7, 0)
    v2p, r2p = _pad_seg(v2, r2, k, 9, 5)
    sym = np.concatenate([v1p, v2p])
    rows = np.concatenate([r1p, r2p])
    n = sym.size
    segs = (len(v1p) // k, len(v2p) // k)

    buf, states, total, seg_words = vrans._encode_core(
        jnp.asarray(sym), jnp.asarray(rows), enc, n=n, k=k,
        n_sym=N_SYMBOLS, pad_sym=enc.pad_sym, method=method,
        segment_steps=segs)
    total = int(total)
    assert int(seg_words.sum()) == total
    words = np.asarray(buf)[:total]

    wb = jnp.asarray(words[None])  # [1, total]
    st = jnp.asarray(np.asarray(states)[None])
    s1, st1, g1 = vrans.decode_batch(
        wb, st, jnp.asarray(r1p[None]), dec, n=len(v1p), k=k,
        method=method, return_carry=True)
    np.testing.assert_array_equal(np.asarray(s1)[0][:n1], v1)
    assert int(np.asarray(g1)[0]) == int(np.asarray(seg_words)[0])
    s2 = vrans.decode_batch(
        wb, st1, jnp.asarray(r2p[None]), dec, n=len(v2p), k=k,
        method=method, g0=g1)
    np.testing.assert_array_equal(np.asarray(s2)[0][:n2], v2)


def test_fused_stream_staged_decode_pallas_interpret():
    """Same staged mechanism through the Pallas kernel (interpret mode)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(33)
    cdf_rows = _rand_cdf_rows(rng, 6, skew=2.0)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    k = vrans._SUB * 128
    n1, n2 = 2000, 1200
    v1 = rng.integers(0, N_SYMBOLS, size=n1).astype(np.int32)
    r1 = rng.integers(0, 3, size=n1).astype(np.int32)
    v2 = rng.integers(0, N_SYMBOLS, size=n2).astype(np.int32)
    r2 = rng.integers(3, 6, size=n2).astype(np.int32)
    v1p, r1p = _pad_seg(v1, r1, k, 5, 0)
    v2p, r2p = _pad_seg(v2, r2, k, 6, 3)
    sym = np.concatenate([v1p, v2p])
    rows = np.concatenate([r1p, r2p])
    n = sym.size

    buf, states, total = vrans._encode_core(
        jnp.asarray(sym), jnp.asarray(rows), enc, n=n, k=k,
        n_sym=N_SYMBOLS, pad_sym=enc.pad_sym, method="gather")
    words = np.asarray(buf)[:int(total)]
    wb = jnp.asarray(words[None])
    st = jnp.asarray(np.asarray(states)[None])
    s1, st1, g1 = vrans.decode_pallas_batch(
        wb, st, jnp.asarray(r1p[None]), dec.cdf512_f32, n=len(v1p), k=k,
        interpret=True, return_carry=True)
    np.testing.assert_array_equal(np.asarray(s1)[0][:n1], v1)
    s2 = vrans.decode_pallas_batch(
        wb, st1, jnp.asarray(r2p[None]), dec.cdf512_f32, n=len(v2p), k=k,
        interpret=True, g0=g1)
    np.testing.assert_array_equal(np.asarray(s2)[0][:n2], v2)


def test_encode_pallas_interpret_matches_xla():
    """The Pallas ENCODE kernel (interpret mode) must produce the exact
    word stream, final states and per-segment word counts of encode_impl —
    validates the descending-cursor write, the base-512 exact division and
    the one-hot placement matmuls without TPU hardware."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(33)
    cdf_rows = build_laplace_table(scale=vrans.PROB_SCALE)
    enc = vrans.make_enc_tables(cdf_rows)
    dec = vrans.make_dec_tables(cdf_rows)
    k = vrans._SUB * 128
    n = 3 * k + 517                      # pad case; S = 4 steps
    s_steps, n_pad = vrans.plan(n, k)
    segs = (1, s_steps - 1)
    b = 2
    # Full symbol range incl. tails (freq == 1 stresses the division) and
    # high-sigma rows.
    vals = np.clip(np.round(rng.laplace(0, 40.0, size=(b, n))), -255, 255
                   ).astype(np.int32) + 256
    rows = rng.integers(0, cdf_rows.shape[0], size=(b, n)).astype(np.int32)

    ref_buf, ref_states, ref_total, ref_segw = jax.vmap(
        lambda s, r: vrans.encode_impl(
            s, r, enc, n=n, k=k, n_sym=enc.n_symbols,
            pad_sym=enc.pad_sym, segment_steps=segs)
    )(jnp.asarray(vals), jnp.asarray(rows))

    buf, states, seg_g, g0 = vrans.encode_pallas_batch(
        jnp.asarray(vals), jnp.asarray(rows), enc.cdf_f32[:, 1:],
        n=n, k=k, pad_sym=enc.pad_sym, segment_steps=segs, interpret=True)

    buf = np.asarray(buf)
    seg_g = np.asarray(seg_g)
    states = np.asarray(states)
    for i in range(b):
        total = int(np.asarray(ref_total)[i])
        words_ref = np.asarray(ref_buf)[i, :total]
        words_pal = buf[i, seg_g[i, 0]:g0]
        np.testing.assert_array_equal(words_pal, words_ref)
        np.testing.assert_array_equal(states[i], np.asarray(ref_states)[i])
        bounds = np.concatenate([seg_g[i], [g0]])
        np.testing.assert_array_equal(np.diff(bounds),
                                      np.asarray(ref_segw)[i])
        # and the stream decodes
        _, n_pad = vrans.plan(n, k)
        w = np.zeros((1, n_pad), np.uint16)
        w[0, :words_pal.size] = words_pal
        out = vrans.decode_batch(jnp.asarray(w), jnp.asarray(states[i])[None],
                                 jnp.asarray(rows[i])[None], dec, n=n, k=k,
                                 method="gather")
        np.testing.assert_array_equal(np.asarray(out)[0], vals[i])


def test_pallas_probe_fallback(monkeypatch):
    """A kernel that fails to lower must quietly disable the pallas route
    (auto mode falls back to the bit-identical XLA path) instead of
    crashing encoding."""
    import warnings

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic lowering failure")

    monkeypatch.setattr(vrans, "encode_pallas_batch", boom)
    monkeypatch.setattr(vrans, "decode_pallas_batch", boom)
    monkeypatch.setattr(vrans, "_PALLAS_PROBE", {})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert vrans.pallas_runtime_ok("enc") is False
        assert vrans.pallas_runtime_ok("dec") is False
    assert any("unavailable" in str(x.message) for x in w)
    # cached: a second call must not re-probe (boom would raise through)
    assert vrans.pallas_runtime_ok("enc") is False


@pytest.mark.parametrize("k", [1024, 2048])
def test_pallas_kernels_sub16_interpret(k):
    """K = 2048 (16 sublanes) kernels must stay bit-identical to the XLA
    route — halving the sequential step count for large 1080p chunks."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    R = 6
    pmf = rng.integers(1, 90, size=(R, N_SYMBOLS)).astype(np.float64)
    cdfs = quantize_pmf(pmf, scale=vrans.PROB_SCALE)
    cdf512 = jnp.asarray(cdfs[:, 1:].astype(np.float32))
    et = vrans.make_enc_tables(cdfs)

    n = k * 3 + 37
    sym = rng.integers(0, N_SYMBOLS, size=(2, n)).astype(np.int32)
    rows = rng.integers(0, R, size=(2, n)).astype(np.int32)
    bx, sx, tx = jax.vmap(lambda s, r: vrans.encode_impl(
        s, r, et, n=n, k=k, n_sym=N_SYMBOLS, pad_sym=3))(
        jnp.asarray(sym), jnp.asarray(rows))
    buf, st, seg_g, g0 = vrans.encode_pallas_batch(
        jnp.asarray(sym), jnp.asarray(rows), cdf512, n=n, k=k, pad_sym=3,
        interpret=True)
    _, n_pad = vrans.plan(n, k)
    wbuf = np.zeros((2, n_pad), np.uint16)
    for i in range(2):
        t = int(np.asarray(tx)[i])
        wp = np.asarray(buf)[i, int(np.asarray(seg_g)[i, 0]):g0]
        np.testing.assert_array_equal(wp, np.asarray(bx)[i, :t])
        np.testing.assert_array_equal(np.asarray(st)[i], np.asarray(sx)[i])
        wbuf[i, :t] = np.asarray(bx)[i, :t]
    out = vrans.decode_pallas_batch(
        jnp.asarray(wbuf), jnp.asarray(np.asarray(sx)), jnp.asarray(rows),
        cdf512, n=n, k=k, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), sym)
