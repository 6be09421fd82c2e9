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


GOP_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%(port)d",
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    import numpy as np
    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.parallel.multihost import encode_video_multihost
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import encode_video

    H, W, N = 48, 64, 9
    rng = np.random.default_rng(7)   # same seed on every process
    frames = []
    for t in range(N):
        y = rng.integers(0, 255, (H, W), dtype=np.uint8)
        frames.append({
            "y": y,
            "u": y[::2, ::2] // 2 + 40,
            "v": 200 - y[::2, ::2] // 2,
        })

    _, params = init_fullnet(TINY, jax.random.PRNGKey(0), spatial=64)
    codec = FrameCodec(TINY, params, H, W)
    coding = CodingConfig(coding_config="RA", gop_size=4, intra_period=4)

    dist_bits = encode_video_multihost(codec, frames, coding, wave_batch=2)

    if jax.process_index() == 0:
        # GOP sharding must be invisible: identical bytes to a
        # single-host encode of the same input with the same codec.
        ref = encode_video(codec, frames, coding, wave_batch=2)
        assert dist_bits == ref.bitstream, (
            f"distributed bitstream differs "
            f"({len(dist_bits)} vs {len(ref.bitstream)} bytes)")
        from aivc_tpu.pipeline.video import decode_video
        dec = decode_video(codec, dist_bits, wave_batch=2)
        for idx in dec:
            for k in ("y", "u", "v"):
                assert np.array_equal(dec[idx][k],
                                      ref.decoded_frames[idx][k])
        print("multihost gop sharding ok", flush=True)
    else:
        assert dist_bits is not None and len(dist_bits) > 20
        print("proc 1 done", flush=True)
""")


@pytest.mark.slow
def test_multihost_gop_sharding_bit_exact(tmp_path):
    """Two processes each encode half the GOPs; the muxed bitstream must
    be byte-identical to a single-host encode (SURVEY.md §2.5: GOP-level
    data parallelism with host-0 mux)."""
    port = 29661
    script = tmp_path / "gop_worker.py"
    script.write_text(GOP_WORKER % {"port": port, "repo": str(REPO)})
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
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("gop-sharding workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    assert "multihost gop sharding ok" in outs[0]
