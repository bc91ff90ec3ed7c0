"""Test harness config.

Tests run hermetically on a virtual 8-device CPU mesh by default so they are
deterministic and do not require TPU hardware; Pallas kernels run in
interpreter mode on CPU (the kernel wrappers auto-detect the platform).
Set GSWT_TEST_TPU=1 to run against real TPU devices instead.

Note: this environment force-selects the experimental 'axon' TPU platform
regardless of JAX_PLATFORMS, so the override must go through jax.config
before the backend initializes.
"""

import os

if os.environ.get("GSWT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import tempfile

import numpy as np
import pytest

# keep test engines (cli/e2e paths pass hints_key) from writing bucket
# hints into the repo's committed .gswt_hints.json
os.environ.setdefault(
    "GSWT_HINTS_PATH",
    os.path.join(tempfile.gettempdir(), "gswt_test_hints.json"),
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
