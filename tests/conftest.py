"""Test configuration: CPU backend with an 8-device virtual mesh.

The standard JAX trick for testing multi-chip sharding without a pod
(SURVEY.md section 4): force the host platform and split it into 8 virtual
devices.  Must run before the first JAX backend initialisation, hence the
env mutation at import time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
