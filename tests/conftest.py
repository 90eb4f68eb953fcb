"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the JAX-idiomatic fake backend for exercising pjit/Mesh code
without TPU hardware (SURVEY.md section 4).

This image's sitecustomize registers a tunneled-TPU PJRT plugin at
interpreter start and pins ``jax_platforms="axon,cpu"`` via jax.config
(which overrides the JAX_PLATFORMS env var). Re-pin to cpu here, before
any backend initialization, and request 8 virtual host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(9001)
