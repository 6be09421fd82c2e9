"""Pallas warp kernel vs XLA warp (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.ops.warp import warp
from aivc_tpu.ops.warp_pallas import V_RADIUS, warp_pallas


@pytest.mark.parametrize("mag", [0.0, 0.7, 5.0])
def test_warp_pallas_matches_xla(mag):
    B, H, W, C = 1, 256, 256, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * mag, jnp.float32)
    # Stay inside the kernel's vertical radius and off exact border samples
    flow = flow.at[..., 1].set(jnp.clip(flow[..., 1], -V_RADIUS + 1, V_RADIUS - 1))
    ref = warp(x, flow)
    out = warp_pallas(x, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_warp_pallas_rejects_bad_width():
    x = jnp.zeros((1, 256, 200, 1))
    flow = jnp.zeros((1, 256, 200, 2))
    with pytest.raises(ValueError):
        warp_pallas(x, flow, interpret=True)
