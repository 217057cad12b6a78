"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes (imported first by pytest)."""

import os

# Hard override: the session env pins JAX_PLATFORMS=axon (the real TPU
# tunnel, single-claimant) and sitecustomize imports jax at interpreter
# start, locking the env-derived config. Tests must run on the virtual
# 8-device CPU mesh, so override via jax.config, not the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
