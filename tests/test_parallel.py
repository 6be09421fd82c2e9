"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aivc_tpu.parallel.mesh import (
    frame_sharding,
    make_mesh,
    shard_params,
    stacked_frame_sharding,
)


def test_mesh_shapes():
    mesh = make_mesh(8, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh1 = make_mesh(8, spatial=1)
    assert mesh1.shape == {"data": 8, "spatial": 1}
    with pytest.raises(ValueError):
        make_mesh(6, spatial=4)


def test_sharded_warp_matches_single_device():
    from aivc_tpu.ops.warp import warp

    mesh = make_mesh(8, spatial=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    flow = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 2))
    ref = jax.jit(warp)(x, flow)
    with mesh:
        xs = jax.device_put(x, frame_sharding(mesh))
        fs = jax.device_put(flow, frame_sharding(mesh))
        out = jax.jit(warp)(xs, fs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dryrun_multichip_runs():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
