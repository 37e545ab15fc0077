"""Test config: force CPU with a virtual 8-device mesh so no TPU is needed
(multi-chip sharding tests run on the host platform).

Set ``CV_TPU_TESTS=1`` to keep the real TPU backend instead — for the
tests marked ``tpu`` (run them with ``CV_TPU_TESTS=1 pytest -m tpu``)."""

import os

TPU_TESTS = os.environ.get("CV_TPU_TESTS") == "1"

if not TPU_TESTS:
    # Hard override: the login environment exports JAX_PLATFORMS=axon
    # (remote TPU) and its sitecustomize calls
    # jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
    # which takes precedence over the env var. Tests must run on the local
    # CPU backend with virtual devices, so update the live config too.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
