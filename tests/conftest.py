"""Test configuration: run JAX on 8 simulated host (CPU) devices so packing,
kernels, and the multi-chip sharding path are all testable without TPU
hardware (standard JAX practice; SURVEY.md §4).

The environment presets JAX_PLATFORMS=axon (the real TPU) and a
sitecustomize imports jax at interpreter start, so the platform must be
overridden through jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

from dasp_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
