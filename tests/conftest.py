"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are validated on host CPU devices
(``--xla_force_host_platform_device_count=8``); the real TPU is reserved for
benchmarks.
"""

import os

# The axon TPU plugin overrides JAX_PLATFORMS at import time, so force the
# platform through jax.config as well as the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"test harness expected 8 virtual CPU devices, got {jax.devices()}")

import pytest  # noqa: E402

# Modules dominated by torch golden transcriptions / end-to-end trajectory
# parity — minutes each. They form the full pre-commit gate; day-to-day runs
# use ``-m "not golden"`` (<5 min, see pytest.ini).
GOLDEN_MODULES = {
    "test_biggan_golden.py",
    "test_stylegan2_golden.py",
    "test_lpips_golden.py",
    "test_e2e_parity.py",
    "test_e2e_parity_stylegan2.py",
    "test_convert_cli.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in GOLDEN_MODULES:
            item.add_marker(pytest.mark.golden)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
