"""Model registry: the 7-point rate ladder + test-size configs.

The reference ships 7 separately-trained pickled models
``ms_ssim-2021cc-1..7`` (1 = highest rate; reference: src/aivc.py:38-42,
README.md:213) each with multi-rate gain vectors.  Here one architecture
serves the whole ladder: every named entry maps to the same ModelConfig
plus a default idx_rate into the gain-vector ladder, and intermediate
rates interpolate continuously (reference:
src/layers/multi_rate/gain_matrix.py:159-194).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from aivc_tpu.config import ConditionalNetConfig, ModelConfig

BASE = ModelConfig()

# bfloat16 transform variant: conv stacks run on the MXU in bf16, all
# entropy-coding-relevant tensors stay float32 at module boundaries.
BASE_BF16 = replace(
    BASE,
    name="tpu-aivc-bf16",
    mofnet=replace(BASE.mofnet, dtype="bfloat16"),
    codecnet=replace(BASE.codecnet, dtype="bfloat16"),
)

# Small config for tests / CI: same topology, tiny channel counts.
TINY = ModelConfig(
    name="tpu-aivc-tiny",
    mofnet=ConditionalNetConfig(
        nb_ft_y=12, nb_ft_z=8, nb_ft=12, in_c=9, in_c_shortcut=6,
        out_c_shortcut_y=8, out_c=6, n_rates=3, use_attention=False),
    codecnet=ConditionalNetConfig(
        nb_ft_y=16, nb_ft_z=8, nb_ft=16, in_c=6, in_c_shortcut=3,
        out_c_shortcut_y=8, out_c=3, n_rates=3, use_attention=False),
    lambda_tradeoff=(0.01, 0.05, 0.25),
)


def _ladder() -> Dict[str, Tuple[ModelConfig, float]]:
    zoo: Dict[str, Tuple[ModelConfig, float]] = {}
    n = len(BASE.lambda_tradeoff)
    for i in range(1, n + 1):
        # Index 1 = highest rate = idx_rate 0 (gain_matrix.py:137 semantics)
        zoo[f"tpu-msssim-{i}"] = (BASE, float(i - 1))
    zoo["tpu-aivc-base"] = (BASE, 0.0)
    zoo["tpu-aivc-bf16"] = (BASE_BF16, 0.0)
    zoo["tpu-aivc-tiny"] = (TINY, 0.0)
    zoo["tpu-aivc-tiny-bf16"] = (
        replace(
            TINY,
            name="tpu-aivc-tiny-bf16",
            mofnet=replace(TINY.mofnet, dtype="bfloat16"),
            codecnet=replace(TINY.codecnet, dtype="bfloat16"),
        ),
        0.0,
    )
    return zoo


MODEL_ZOO = _ladder()


def get_model(name: str) -> Tuple[ModelConfig, float]:
    """-> (config, default idx_rate). Raises KeyError with the known names."""
    try:
        return MODEL_ZOO[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_ZOO)}"
        ) from None


def init_fullnet(cfg: ModelConfig, rng: jax.Array | None = None,
                 spatial: int = 64):
    """Initialize a FullNet and its full parameter tree (all frame types)."""
    from aivc_tpu.models.fullnet import FullNet

    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = FullNet(cfg)
    x = jnp.zeros((1, spatial, spatial, 3), jnp.float32)
    # init under jit: eager tracing would dispatch hundreds of individual
    # ops, which is pathological on remote-TPU backends.
    init_fn = jax.jit(
        lambda r: model.init(r, x, x, x, method=FullNet.init_all))
    params = init_fn(rng)
    return model, params
