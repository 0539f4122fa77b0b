"""Test harness config: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing pjit sharding + collective
numerics without a TPU pod (SURVEY.md §4.4). The ambient environment
(sitecustomize) registers a remote-tunneled TPU backend and forces
``jax_platforms="axon,cpu"``; every eager op then becomes a high-latency
RPC, so we must override the *config* (env vars are ignored once
``jax.config.update`` has run) back to cpu before any backend initializes.
"""

import os

import pytest

TPU_MODE = bool(os.environ.get("YOLOJAX_TPU_TESTS"))

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():  # pragma: no cover
        from jax.extend.backend import clear_backends

        clear_backends()

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()


def pytest_collection_modifyitems(config, items):
    """The two tiers never mix: CPU-mesh runs skip ``tpu``-marked tests;
    TPU runs (YOLOJAX_TPU_TESTS=1, real backend) skip everything else —
    the CPU tests assume an 8-device mesh the chip doesn't have."""
    if TPU_MODE:
        skip = pytest.mark.skip(reason="CPU-mesh test (YOLOJAX_TPU_TESTS set)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="TPU-gated: run with YOLOJAX_TPU_TESTS=1 on a TPU backend")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
