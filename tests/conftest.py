"""Test configuration: run everything on CPU with 8 virtual devices.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on a
virtual CPU mesh exactly as the driver's dryrun does (SURVEY.md §4: "Multi-chip
tests can run on CPU with xla_force_host_platform_device_count").
"""
import os

# Force CPU even though the session env pins JAX_PLATFORMS=axon (real TPU).
# The axon sitecustomize imports jax at interpreter start, so the env var alone
# is too late — the config update below is what actually switches platforms.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
