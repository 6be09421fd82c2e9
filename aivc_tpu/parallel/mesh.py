"""Device-mesh helpers: data (frame/GOP) x spatial (tile) sharding.

The reference is strictly single-device (reference:
src/func_util/cluster_mngt.py:16-21, batch always 1, frames walked one by
one); this module supplies the parallel layer the TPU build targets
(SURVEY.md §2.5): a 2-D mesh where

  'data'    shards the batch dimension — independent frames of one
            temporal wave, chained GOPs, or rate points;
  'spatial' shards the H dimension of frames/latents — GSPMD inserts the
            conv halo exchanges over ICI automatically.

Everything rides jax.sharding + GSPMD: annotate inputs, keep params
replicated, let XLA place collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % spatial != 0:
        raise ValueError(f"{n_devices} devices not divisible by spatial={spatial}")
    grid = devices.reshape(n_devices // spatial, spatial)
    return Mesh(grid, ("data", "spatial"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] frames: batch over 'data', rows over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial", None, None))


def stacked_frame_sharding(mesh: Mesh) -> NamedSharding:
    """[n_frames, B, H, W, C] GOP tensor: batch over 'data', rows over
    'spatial' (frame axis stays on-device: it is the sequential DAG)."""
    return NamedSharding(mesh, P(None, "data", "spatial", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate the parameter pytree across the mesh."""
    return jax.device_put(params, replicated(mesh))
