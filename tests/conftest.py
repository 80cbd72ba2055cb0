"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths (pjit over a Mesh) are exercised without TPU hardware — the TPU-world
substitute for the reference's "single-node multi-GPU only" assumption
(/root/reference/vits2/train.py:40-45). Env vars must be set before jax import.
"""

import os
import sys

# The ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must run on CPU, so override unconditionally. NOTE: the axon PJRT plugin
# force-registers itself and wins over the env var, so the config flag is set
# explicitly after import below — that is the only override that sticks.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is dominated by XLA compiles of the
# train-step graphs; repeat runs hit the cache and drop from ~40 to a few min
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running lockstep/calibration-scale test"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
