"""Generalized Divisive Normalization for TPU.

y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j, i] * x[j]^2)   (inverse: multiply)

Same math as the reference (reference: src/layers/misc/misc_layers.py:63-154),
but laid out for the MXU: the channel mixing is a [B*H*W, C] @ [C, C] matmul
on NHWC tensors instead of a 1x1 NCHW convolution.  The LowerBound
reparameterisation keeps beta/gamma positive with the reference's
gradient-gating rule (misc_layers.py:39-60): gradients pass when the input is
above the bound OR the gradient pushes the value up.

A fused Pallas kernel (square + matmul + bias + rsqrt + scale in one VMEM
round-trip) is provided for TPU backends; the XLA path is used everywhere
else and as the numerical reference in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

REPARAM_OFFSET = 2.0 ** -18
PEDESTAL = REPARAM_OFFSET ** 2
BETA_MIN = 1e-6
GAMMA_INIT = 0.1


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def gdn_params_init(ch: int):
    """Initial (reparameterised) beta and gamma, matching the reference's
    build() (misc_layers.py:85-101): beta ~ 1, gamma ~ 0.1 * I."""
    beta = jnp.sqrt(jnp.ones((ch,)) + PEDESTAL)
    gamma = jnp.sqrt(GAMMA_INIT * jnp.eye(ch) + PEDESTAL)
    return beta, gamma


def gdn_apply(x: jax.Array, beta_r: jax.Array, gamma_r: jax.Array,
              inverse: bool, clamp: float = 0.0,
              lowp: bool = False) -> jax.Array:
    """Apply (I)GDN to NHWC input given reparameterised beta/gamma.

    clamp > 0 bounds the per-element multiplier to [1/clamp, clamp]:
    inverse GDN multiplies by ~|x| once activations leave the O(1)
    regime, so a deep IGDN stack amplifies QUADRATICALLY per stage —
    observed in round 3 driving a synthesis trunk to ~1e33 activations
    (every downstream gradient dead).  Healthy nets run multipliers
    ~0.8-1.2, so a clamp of 16 never engages for them; it only removes
    the runaway fixed point.  Gradients pass through min/max normally
    inside the bound."""
    beta_bound = (BETA_MIN + PEDESTAL) ** 0.5
    gamma_bound = REPARAM_OFFSET

    beta = lower_bound(beta_r, beta_bound) ** 2 - PEDESTAL
    gamma = lower_bound(gamma_r, gamma_bound) ** 2 - PEDESTAL

    if lowp and x.dtype != jnp.float32:
        # Inference fast path: cast the PARAMETERS down instead of the
        # activations up.  The mixed-dtype einsum (bf16 x2, f32 gamma)
        # otherwise makes XLA materialize an f32 copy of the full x^2
        # tensor — 3.2 GB of pure convert/copy traffic per 1080p wave-8
        # synthesis stage (trace: gdn.py convert_element_type copies,
        # ~20 ms/stage).  Accumulation stays f32 via
        # preferred_element_type; only the ~1e-3-relative parameter
        # rounding changes, and enc/dec share programs so the closed
        # loop is unaffected.  Training keeps the f32 path.
        gamma = gamma.astype(x.dtype)
        beta = beta.astype(x.dtype)

    # norm[o] = beta[o] + sum_i gamma[o, i] * x[i]^2  -> NHWC matmul on gamma^T
    norm = jnp.einsum(
        "bhwi,oi->bhwo", jnp.square(x), gamma,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + beta
    norm = jnp.sqrt(norm)
    if clamp > 0.0:
        norm = jnp.clip(norm, 1.0 / clamp, clamp)
    return x * norm if inverse else x / norm


class GDN(nn.Module):
    """Flax wrapper holding the reparameterised beta/gamma."""

    ch: int
    inverse: bool = False
    clamp: float = 0.0
    lowp: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        beta0, gamma0 = gdn_params_init(self.ch)
        beta_r = self.param("beta", lambda _: beta0)
        gamma_r = self.param("gamma", lambda _: gamma0)
        return gdn_apply(x, beta_r, gamma_r, self.inverse, self.clamp,
                         self.lowp)


# ---------------------------------------------------------------------------
# Pallas fused kernel (inference fast path)
# ---------------------------------------------------------------------------

def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    x2 = jnp.square(x)
    # [TILE_N, C] @ [C, C] on the MXU; gamma is stored transposed so the
    # contraction is a plain row-major matmul.
    norm = jnp.dot(x2, gamma_ref[:], preferred_element_type=jnp.float32)
    norm = jnp.sqrt(norm + beta_ref[:])
    norm = norm.astype(x.dtype)
    out_ref[:] = x * norm if inverse else x / norm


@functools.partial(jax.jit, static_argnames=("inverse",))
def gdn_pallas(x: jax.Array, beta_r: jax.Array, gamma_r: jax.Array,
               inverse: bool = False) -> jax.Array:
    """Fused GDN on TPU via Pallas. x: NHWC with C a multiple of 128
    preferred; falls back to gdn_apply otherwise."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    N = B * H * W
    TILE_N = 512
    if N % TILE_N != 0 or C % 128 != 0:
        return gdn_apply(x, beta_r, gamma_r, inverse)

    beta_bound = (BETA_MIN + PEDESTAL) ** 0.5
    gamma_bound = REPARAM_OFFSET
    beta = lower_bound(beta_r, beta_bound) ** 2 - PEDESTAL
    gamma = lower_bound(gamma_r, gamma_bound) ** 2 - PEDESTAL

    x2d = x.reshape(N, C)
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
        grid=(N // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2d, gamma.T.astype(jnp.float32), beta.reshape(1, C).astype(jnp.float32))
    return out.reshape(B, H, W, C)
