"""Deterministic integer CDF construction for range coding.

The reference evaluates float CDFs per element and leans on torchac's
internal normalisation (reference: src/real_life/bitstream.py:82-154,
281, 454) — a [B,C,H,W,514]-float tensor per latent, flagged in the survey
as the memory- and transfer-dominant step.  The TPU-native design replaces
it with small integer tables:

* z (hyper-latent): one CDF row per channel, built once per model load
  from the learned FactorizedPrior (mirroring _precompute_z_cdf).
* y (main latent): sigma is quantized to NBINS log-spaced scale bins and
  one CDF row per bin is built once; per-element data shrinks to an int
  bin index.  Both encoder and decoder recompute bin indices from the same
  decoded z with the same compiled function, so indices agree exactly —
  the integer analogue of the reference's determinism contract
  (reference: src/func_util/cluster_mngt.py:27-37).

All quantization is plain integer numpy — bit-exact across hosts.
Symbols are latent values shifted by +AC_MAX_VAL into [0, 511].
"""

from __future__ import annotations

import numpy as np

from aivc_tpu.config import AC_MAX_VAL
from aivc_tpu.coding.range_coder import PROB_SCALE

# Default alphabet (the reference's +-256); per-model narrower alphabets
# pass ac_max explicitly (ModelConfig.ac_max_val) — every function below
# that touches symbol geometry takes the row width from its inputs.
N_SYMBOLS = 2 * AC_MAX_VAL          # 512 values in [-256, 255]
N_EDGES = N_SYMBOLS + 1

# Laplace scale-bin table
NBINS = 64
SIGMA_MIN = 0.05
SIGMA_MAX = 160.0
_LOG_SMIN = float(np.log(SIGMA_MIN))
_LOG_SMAX = float(np.log(SIGMA_MAX))


def symbol_edges(ac_max: int = AC_MAX_VAL) -> np.ndarray:
    """Half-integer bin edges [-ac_max-0.5, ..., ac_max-0.5]
    (2*ac_max + 1 points; [-256.5, ..., 255.5] at the default)."""
    return np.arange(2 * ac_max + 1, dtype=np.float64) - ac_max - 0.5


def quantize_pmf(pmf: np.ndarray, scale: int = PROB_SCALE) -> np.ndarray:
    """Quantize pmf rows to integer CDFs summing exactly to ``scale``.

    Args:
      pmf: [n_rows, N_SYMBOLS] nonnegative float64.
      scale: total integer frequency (2^16 for both backends).
    Returns:
      [n_rows, N_SYMBOLS + 1] uint32 with cdf[:,0]=0, cdf[:,-1]=scale,
      every symbol frequency >= 1 (so any clamped symbol stays codable).
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if pmf.ndim != 2:
        raise ValueError("pmf must be [n_rows, n_symbols]")
    n_sym = pmf.shape[1]
    pmf = np.maximum(pmf, 0.0)
    total = pmf.sum(axis=1, keepdims=True)
    total[total == 0] = 1.0
    pmf = pmf / total

    budget = scale - n_sym
    if budget <= 0:
        raise ValueError(f"scale {scale} too small for {n_sym} symbols")
    freq = np.floor(pmf * budget).astype(np.int64) + 1
    # Distribute the integer remainder onto each row's most probable symbol
    # (deterministic argmax tie-break: lowest index).
    short = scale - freq.sum(axis=1)
    rows = np.arange(pmf.shape[0])
    freq[rows, pmf.argmax(axis=1)] += short

    cdf = np.zeros((pmf.shape[0], n_sym + 1), dtype=np.uint32)
    cdf[:, 1:] = np.cumsum(freq, axis=1).astype(np.uint32)
    return cdf


def cdf_rows_from_edge_values(edge_cdf: np.ndarray,
                              scale: int = PROB_SCALE) -> np.ndarray:
    """Integer CDF rows from float CDF values at the 513 symbol edges.

    Tail mass is folded into the edge symbols (the encoder clamps latents
    to [-AC_MAX_VAL, AC_MAX_VAL - 1], so edge symbols absorb the tails).
    """
    edge_cdf = np.asarray(edge_cdf, dtype=np.float64)
    if edge_cdf.ndim != 2 or edge_cdf.shape[1] % 2 != 1:
        raise ValueError("edge_cdf must be [n_rows, n_symbols + 1]")
    edge_cdf = edge_cdf.copy()
    edge_cdf[:, 0] = 0.0
    edge_cdf[:, -1] = 1.0
    pmf = np.diff(edge_cdf, axis=1)
    return quantize_pmf(pmf, scale)


# ---------------------------------------------------------------------------
# Laplace scale-bin table for y
# ---------------------------------------------------------------------------

def sigma_bin_centers() -> np.ndarray:
    """[NBINS] log-spaced sigma values."""
    return np.exp(np.linspace(_LOG_SMIN, _LOG_SMAX, NBINS))


def build_laplace_table(scale: int = PROB_SCALE,
                        ac_max: int = AC_MAX_VAL) -> np.ndarray:
    """[NBINS, 2*ac_max + 1] integer CDF rows for zero-mean Laplace,
    scale b = sigma / sqrt(2) (reference: bitstream.py:127-154).  Tail
    mass beyond +-ac_max folds into the edge symbols (the encoder clamps
    latents to the alphabet)."""
    sigmas = sigma_bin_centers()
    edges = symbol_edges(ac_max)[None, :]                # [1, n_sym + 1]
    b = (sigmas / np.sqrt(2.0))[:, None]                 # [NBINS, 1]
    half_tail = 0.5 * np.exp(-np.abs(edges) / b)
    cdf = np.where(edges < 0, half_tail, 1.0 - half_tail)
    return cdf_rows_from_edge_values(cdf, scale)


def sigma_to_bin_np(sigma: np.ndarray) -> np.ndarray:
    """Map sigma values to scale-bin indices (numpy, float32 in/int32 out).

    Must match sigma_to_bin_jnp bit-for-bit: both round
    (log(sigma) - log_smin) * scale at float32 precision.
    """
    s = np.maximum(np.asarray(sigma, dtype=np.float32), np.float32(1e-9))
    t = (np.log(s) - np.float32(_LOG_SMIN)) * np.float32(
        (NBINS - 1) / (_LOG_SMAX - _LOG_SMIN)
    )
    return np.clip(np.round(t), 0, NBINS - 1).astype(np.int32)


def sigma_to_bin_jnp(sigma):
    """jit-friendly version of sigma_to_bin_np (same float32 arithmetic)."""
    import jax.numpy as jnp

    s = jnp.maximum(sigma.astype(jnp.float32), 1e-9)
    t = (jnp.log(s) - np.float32(_LOG_SMIN)) * np.float32(
        (NBINS - 1) / (_LOG_SMAX - _LOG_SMIN)
    )
    return jnp.clip(jnp.round(t), 0, NBINS - 1).astype(jnp.int32)


def binned_sigma_jnp(sigma):
    """Per-element sigma snapped to its bin center (for decode-side parity
    checks and rate estimation against the real coded distribution)."""
    import jax.numpy as jnp

    centers = jnp.asarray(sigma_bin_centers(), dtype=jnp.float32)
    return centers[sigma_to_bin_jnp(sigma)]


def expected_bits(symbols: np.ndarray, row_idx: np.ndarray,
                  cdf_rows: np.ndarray) -> float:
    """Exact expected codelength of symbols under the quantized coded
    distribution — the analytic side of the estimated-vs-real rate
    cross-check (reference: src/real_life/bitstream.py:307-329)."""
    freq = np.diff(cdf_rows.astype(np.int64), axis=1)
    f = freq[row_idx.reshape(-1), symbols.reshape(-1).astype(np.int64)]
    return float(np.sum(-np.log2(f / float(PROB_SCALE))))


# ---------------------------------------------------------------------------
# z table from a FactorizedPrior
# ---------------------------------------------------------------------------

def build_z_table(prior_module, prior_params,
                  scale: int = PROB_SCALE,
                  ac_max: int = AC_MAX_VAL) -> np.ndarray:
    """[C, 2*ac_max + 1] integer CDF rows for the hyper-latent z.

    Evaluates the learned per-channel CDF once at the symbol edges
    (the analogue of the reference's _precompute_z_cdf,
    bitstream.py:82-125) and quantizes deterministically on host.
    """
    import jax
    import jax.numpy as jnp

    C = prior_module.nb_channel
    edges = jnp.asarray(
        np.tile(symbol_edges(ac_max)[None, :], (C, 1)), dtype=jnp.float32
    )
    fn = jax.jit(
        lambda p, e: prior_module.apply(p, e, method=prior_module.cdf))
    vals = fn(prior_params, edges)
    return cdf_rows_from_edge_values(np.asarray(vals, dtype=np.float64),
                                     scale)
