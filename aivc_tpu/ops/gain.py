"""Multi-rate gain vectors with geometric interpolation.

One trained model serves N discrete rate points via per-channel encoder /
decoder gain vectors; any intermediate rate is reached by geometrically
interpolating adjacent vectors: g = m_r^l * m_t^(1-l)
(reference: src/layers/multi_rate/gain_matrix.py:32-194, after Cui et al.,
"G-VAE: A Continuously Variable Rate Deep Image Compression Framework").

Gains are stored as a dense [N, C] array per side (enc/dec) — a pytree leaf,
not a ParameterList — and the fractional-index interpolation is expressed
with lax-friendly dynamic_index_in_dim so it stays inside jit with idx_rate
as a traced scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def interpolate_gain(gains: jax.Array, idx_rate: jax.Array) -> jax.Array:
    """Geometric interpolation of gain vectors.

    Args:
      gains:    [N, C] gain matrix (one row per trained rate point,
                row 0 = highest rate).
      idx_rate: scalar float in [0, N-1]; fractional values interpolate.

    Returns:
      [C] positive gain vector.
    """
    n = gains.shape[0]
    gains = jnp.abs(gains)  # reparameterisation (gain_matrix.py:128-157)
    idx_rate = jnp.clip(jnp.asarray(idx_rate, jnp.float32), 0.0, float(n - 1))
    prev_i = jnp.floor(idx_rate).astype(jnp.int32)
    next_i = jnp.minimum(prev_i + 1, n - 1)
    l = 1.0 - (idx_rate - prev_i.astype(jnp.float32))
    m_r = jax.lax.dynamic_index_in_dim(gains, prev_i, axis=0, keepdims=False)
    m_t = jax.lax.dynamic_index_in_dim(gains, next_i, axis=0, keepdims=False)
    return (m_r ** l) * (m_t ** (1.0 - l))


class GainMatrix(nn.Module):
    """N encoder + N decoder gain vectors of nb_ft channels."""

    n_rates: int
    nb_ft: int

    @nn.compact
    def __call__(self, x: jax.Array, idx_rate, mode: str) -> jax.Array:
        """Scale x by the (interpolated) gain vector.

        mode='enc' scales the analysis output before quantization;
        mode='dec' rescales the dequantized latent.
        """
        init = nn.initializers.ones
        enc = self.param("enc_gain", init, (self.n_rates, self.nb_ft))
        dec = self.param("dec_gain", init, (self.n_rates, self.nb_ft))
        gains = {"enc": enc, "dec": dec}[mode]
        g = interpolate_gain(gains, idx_rate).astype(x.dtype)
        return x * g
