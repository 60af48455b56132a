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
    "test_e2e_parity_transform.py",
    "test_convert_cli.py",
}

# Modules dominated by XLA-compile-heavy integration tests (the host has ONE
# CPU core, so compiles serialize): minutes each. The <5-min dev loop is
# ``-m "not golden and not slow"``; ``-m "not golden"`` is ~25 min.
SLOW_MODULES = {
    "test_graft_entry.py",        # 8.5 min: subprocess dryrun battery
    "test_lmmaes_parity.py",      # 2 min: f64 trajectory cross-validation
    "test_quality_gate.py",       # 1.5 min: bf16-vs-f32 convergence
    "test_stylegan2.py",          # ~3 min: generator compiles + packing
    "test_mod_backward.py",       # Pallas kernel through the generator
    "test_optimizers.py",         # ~5 min: every driver inverts a target
    "test_transform_batched.py",  # ~3 min: batched-vs-solo parity
    "test_transforms.py",         # ~2 min: fused transform drivers
    "test_biggan.py",             # generator compiles
    "test_aux.py",                # editor/GANSpace/checkpoint flows
    "test_attention.py",          # Pallas kernel parity
    "test_pallas_fir.py",         # Pallas kernel parity
    "test_mesh_layouts.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in GOLDEN_MODULES:
            item.add_marker(pytest.mark.golden)
        if item.fspath.basename in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
