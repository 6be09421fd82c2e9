"""Latent quantization.

Training: additive uniform noise in [-0.5, 0.5) as a differentiable proxy;
inference: hard round with a straight-through gradient
(reference: src/layers/misc/misc_layers.py:157-169).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    """Round-to-nearest with a straight-through (identity) gradient."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def quantize(x: jax.Array, *, training: bool, rng: jax.Array | None = None) -> jax.Array:
    """Quantize latents: noise proxy when training, hard round otherwise."""
    if training:
        if rng is None:
            raise ValueError("quantize(training=True) needs an rng key")
        noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
        return x + noise
    return ste_round(x)
