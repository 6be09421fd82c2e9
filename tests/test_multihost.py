"""Multi-process (multi-host-style) distributed smoke test.

SURVEY.md §4 calls for multi-host tests via jax.distributed with
multi-process CPU meshes — the reference has no distributed code at all.
Two OS processes form a jax.distributed cluster (the DCN analogue), build
a global mesh, and run a psum across process boundaries.
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%(port)d",
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    # Each process contributes its local (virtual) CPU devices.
    assert len(devs) == 2 * jax.local_device_count(), devs
    assert jax.process_count() == 2
    mesh = Mesh(devs, ("data",))
    x = jnp.ones((4, 8)) * (jax.process_index() + 1)
    xs = jax.device_put(jnp.ones((2, 8)), NamedSharding(mesh, P()))

    @jax.jit
    def f(a):
        return a.sum()

    with mesh:
        y = jax.jit(lambda a: a * (jax.process_count()))(xs)
    total = float(f(y))
    print(f"proc {jax.process_index()} total {total}", flush=True)
    assert total == 2 * 8 * 2  # ones * process_count over (2, 8)
""")


@pytest.mark.slow
def test_two_process_jax_distributed(tmp_path):
    port = 29543
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"port": port})
    env = dict(os.environ)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         cwd=REPO, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} total 32.0" in out
