"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (
        existing + " --xla_force_host_platform_device_count=8"
    ).strip()

# The deployment environment pins JAX_PLATFORMS=axon (the TPU plugin) and the
# env var alone does not reliably win; force the config knob too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xDEAC0)
