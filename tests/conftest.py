"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh/shard_map) are exercised without TPU hardware. The axon TPU plugin
ignores the JAX_PLATFORMS env var, so the platform is also forced through
jax.config before any backend initializes.

Setting ``MOLAR_TPU_DEVICE_TESTS=1`` leaves the real backend in place —
used by the on-device parity suite (tests/test_tpu_parity.py), which runs
jitted kernels on the actual chip against host ground truth (the
bf16-MXU-default class of bug is invisible on the CPU backend). Run it
standalone, with the TPU otherwise idle:

    MOLAR_TPU_DEVICE_TESTS=1 python -m pytest tests/test_tpu_parity.py -q
"""

import os

ON_DEVICE = os.environ.get("MOLAR_TPU_DEVICE_TESTS", "") == "1"

if not ON_DEVICE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_TESTS = pathlib.Path("/root/reference/molar/tests")


@pytest.fixture(scope="session")
def ref_data():
    """Path to the reference repo's test fixtures; skips when not mounted."""
    if not REFERENCE_TESTS.is_dir():
        pytest.skip("reference fixtures not available")
    return REFERENCE_TESTS
