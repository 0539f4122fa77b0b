"""Test harness config: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing pjit sharding + collective
numerics without a TPU pod (SURVEY.md §4.4). The ambient environment
(sitecustomize) registers a remote-tunneled TPU backend and forces
``jax_platforms="axon,cpu"``; every eager op then becomes a high-latency
RPC, so we must override the *config* (env vars are ignored once
``jax.config.update`` has run) back to cpu before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
