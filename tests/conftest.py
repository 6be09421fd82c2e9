"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware, as the
driver's dryrun does (xla_force_host_platform_device_count).

Note: this environment's sitecustomize registers a remote 'axon' TPU
plugin and force-sets jax.config.jax_platforms = 'axon,cpu' at interpreter
start, so setting the JAX_PLATFORMS env var is not enough — the config
must be overridden after importing jax, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
