"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends, hence module scope
at conftest import time (pytest imports conftest before test modules).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env vars set here are too late; flip the config
# directly (backends have not been instantiated yet at conftest time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_host_rng():
    np.random.seed(7)
    import random
    random.seed(7)
    yield
