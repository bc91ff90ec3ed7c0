"""Test harness config.

Tests run hermetically on a virtual 8-device CPU mesh by default so they are
deterministic and do not require TPU hardware; Pallas kernels run in
interpreter mode on CPU (the kernel wrappers auto-detect the platform).
Set GSWT_TEST_TPU=1 to run against real TPU devices instead.
"""

import os

if os.environ.get("GSWT_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
