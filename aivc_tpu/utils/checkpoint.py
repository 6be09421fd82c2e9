"""Checkpointing: typed config + parameter pytree, no pickled modules.

The reference distributes whole pickled nn.Modules loaded with
``torch.load`` and working-directory tricks (reference:
src/model_mngt/model_management.py:341-361, src/encode.py:100-105) — the
source of its ghost-model problem.  Here a checkpoint is a directory with
``config.json`` (ModelConfig) and ``params.msgpack`` (flax serialized
pytree); loading never executes arbitrary code.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import jax
from flax import serialization

from aivc_tpu.config import ModelConfig


def save_checkpoint(ckpt_dir: str | Path, cfg: ModelConfig, params) -> None:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    (ckpt_dir / "config.json").write_text(cfg.to_json())
    (ckpt_dir / "params.msgpack").write_bytes(serialization.to_bytes(params))


def load_checkpoint(ckpt_dir: str | Path) -> Tuple[ModelConfig, dict]:
    ckpt_dir = Path(ckpt_dir)
    cfg = ModelConfig.from_json((ckpt_dir / "config.json").read_text())
    from aivc_tpu.models.zoo import init_fullnet

    _, template = init_fullnet(cfg, jax.random.PRNGKey(0), spatial=64)
    params = serialization.from_bytes(
        template, (ckpt_dir / "params.msgpack").read_bytes())
    return cfg, params
