"""Driver-contract test for ``__graft_entry__.dryrun_multichip``.

Round 1 failed the driver's multi-chip check because the entry asserted on
``jax.devices()`` instead of forcing a virtual mesh (VERDICT.md item 1). This
test reproduces the driver's exact situation — a parent process whose JAX
backend has FEWER devices than requested — and requires ``dryrun_multichip``
to succeed anyway by re-exec'ing its body under an n-device virtual CPU
platform.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_with_single_visible_device():
    env = os.environ.copy()
    # Simulate the driver's bench host: one visible device (the axon plugin
    # exposes a single TPU chip there; here, a single virtual CPU).
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert len(jax.devices()) == 1, jax.devices()\n"
         "import __graft_entry__ as g\n"
         "g.dryrun_multichip(8)\n"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip OK" in proc.stdout, (proc.stdout, proc.stderr)
