"""Range coder + CDF quantization tests: losslessness is the contract
(the reference's runtime self-check, src/real_life/bitstream.py:332-350,
becomes a real property test here)."""

import numpy as np
import pytest

from aivc_tpu.coding import range_coder
from aivc_tpu.coding.cdf import (
    NBINS,
    N_SYMBOLS,
    build_laplace_table,
    cdf_rows_from_edge_values,
    quantize_pmf,
    sigma_bin_centers,
    sigma_to_bin_np,
    symbol_edges,
)
from aivc_tpu.coding.range_coder import PROB_SCALE


def test_native_library_builds():
    assert range_coder.native_available(), "C++ range coder failed to build"


def _random_cdf(n_rows, rng):
    pmf = rng.gamma(0.3, 1.0, size=(n_rows, N_SYMBOLS))
    return quantize_pmf(pmf)


@pytest.mark.parametrize("n", [1, 7, 1000, 20000])
def test_roundtrip_random_symbols(n):
    rng = np.random.default_rng(n)
    cdf = _random_cdf(4, rng)
    syms = rng.integers(0, N_SYMBOLS, size=n).astype(np.uint16)
    rows = rng.integers(0, 4, size=n).astype(np.int32)
    data = range_coder.encode(syms, cdf, rows)
    out = range_coder.decode(data, n, cdf, rows)
    np.testing.assert_array_equal(out, syms)


def test_roundtrip_skewed_distribution_compresses():
    rng = np.random.default_rng(0)
    # Laplace-like very peaky pmf: near-zero symbols dominate
    sigma = 0.8
    edges = symbol_edges()
    b = sigma / np.sqrt(2)
    cdfv = np.where(edges < 0, 0.5 * np.exp(edges / b), 1 - 0.5 * np.exp(-edges / b))
    cdf = cdf_rows_from_edge_values(cdfv[None, :])
    n = 50000
    vals = np.clip(np.round(rng.laplace(0, b, size=n)), -256, 255)
    syms = (vals + 256).astype(np.uint16)
    rows = np.zeros(n, dtype=np.int32)
    data = range_coder.encode(syms, cdf, rows)
    out = range_coder.decode(data, n, cdf, rows)
    np.testing.assert_array_equal(out, syms)
    # Entropy of Laplace(b=0.57) ~ 1.9 bits/symbol; we should be well under
    # 8 bits and within ~2% of the empirical entropy.
    bits_per_sym = len(data) * 8 / n
    assert bits_per_sym < 2.5


def test_rate_close_to_entropy():
    rng = np.random.default_rng(1)
    pmf = rng.gamma(1.0, 1.0, size=(1, N_SYMBOLS))
    cdf = quantize_pmf(pmf)
    freq = np.diff(cdf[0].astype(np.int64))
    p = freq / PROB_SCALE
    n = 100000
    syms = rng.choice(N_SYMBOLS, size=n, p=p).astype(np.uint16)
    rows = np.zeros(n, dtype=np.int32)
    data = range_coder.encode(syms, cdf, rows)
    entropy = -(p * np.log2(p)).sum()
    bits_per_sym = len(data) * 8 / n
    assert bits_per_sym < entropy * 1.02 + 0.01


def test_python_and_native_bitstreams_identical():
    rng = np.random.default_rng(2)
    cdf = _random_cdf(3, rng)
    syms = rng.integers(0, N_SYMBOLS, size=500).astype(np.uint16)
    rows = rng.integers(0, 3, size=500).astype(np.int32)
    native = range_coder.encode(syms, cdf, rows)
    py = range_coder._py_encode(syms, cdf, rows)
    assert native == py
    out = range_coder._py_decode(native, 500, cdf, rows)
    np.testing.assert_array_equal(out, syms)


def test_adversarial_extreme_symbols():
    # All-edge symbols (tails) with an extremely peaky CDF still roundtrip
    # thanks to the >=1 frequency floor.
    sigma = 0.01
    edges = symbol_edges()
    b = sigma / np.sqrt(2)
    cdfv = np.where(edges < 0, 0.5 * np.exp(edges / b), 1 - 0.5 * np.exp(-edges / b))
    cdf = cdf_rows_from_edge_values(cdfv[None, :])
    syms = np.array([0, N_SYMBOLS - 1, 0, N_SYMBOLS - 1, 256], dtype=np.uint16)
    rows = np.zeros(5, dtype=np.int32)
    data = range_coder.encode(syms, cdf, rows)
    out = range_coder.decode(data, 5, cdf, rows)
    np.testing.assert_array_equal(out, syms)


def test_quantized_cdf_properties():
    rng = np.random.default_rng(3)
    cdf = _random_cdf(8, rng)
    assert (cdf[:, 0] == 0).all()
    assert (cdf[:, -1] == PROB_SCALE).all()
    assert (np.diff(cdf.astype(np.int64), axis=1) >= 1).all()


def test_empty_input():
    cdf = quantize_pmf(np.ones((1, N_SYMBOLS)))
    assert range_coder.encode(np.empty(0, np.uint16), cdf,
                              np.empty(0, np.int32)) == b""
    out = range_coder.decode(b"", 0, cdf, np.empty(0, np.int32))
    assert out.size == 0


def test_sigma_binning_consistency():
    sig = np.float32(np.exp(np.random.default_rng(4).uniform(-4, 5, 1000)))
    bins = sigma_to_bin_np(sig)
    assert bins.min() >= 0 and bins.max() < NBINS
    # jnp version must agree exactly
    import jax.numpy as jnp
    from aivc_tpu.coding.cdf import sigma_to_bin_jnp

    jbins = np.asarray(sigma_to_bin_jnp(jnp.asarray(sig)))
    np.testing.assert_array_equal(bins, jbins)


def test_laplace_table_shape_and_monotone():
    table = build_laplace_table()
    assert table.shape == (NBINS, N_SYMBOLS + 1)
    assert (np.diff(table.astype(np.int64), axis=1) >= 1).all()
    centers = sigma_bin_centers()
    assert centers[0] < centers[-1]


def test_corrupted_stream_decodes_without_crashing():
    """Bit flips in the rANS payload must not crash the decoder (it
    produces wrong symbols, which upper layers detect via md5 manifests);
    out-of-range reads are impossible because every CDF row covers the
    full symbol alphabet with nonzero frequency."""
    rng = np.random.default_rng(5)
    cdf = _random_cdf(2, rng)
    syms = rng.integers(0, N_SYMBOLS, size=2000).astype(np.uint16)
    rows = rng.integers(0, 2, size=2000).astype(np.int32)
    data = bytearray(range_coder.encode(syms, cdf, rows))
    for flip in (0, len(data) // 2, len(data) - 1):
        bad = bytearray(data)
        bad[flip] ^= 0xFF
        out = range_coder.decode(bytes(bad), 2000, cdf, rows)
        assert out.shape == (2000,)
        assert (out < N_SYMBOLS).all()
