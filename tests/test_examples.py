"""Example-CLI rot guards.

The reference's examples are its de-facto integration tests (SURVEY.md §4).
Full --smoke runs belong to the verify workflow (they compile generators);
these cheap guards catch the failure modes that bit the reference —
scripts importing nonexistent modules or drifting off the shared-harness
contract (``project_utils.py:10``, ``transform_utils.py:15-50`` were both
dead code upstream).
"""

import ast
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")
SCRIPTS = sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py"))


def test_every_reference_workflow_present():
    names = {s.replace(".py", "") for s in SCRIPTS}
    # the reference's 13 workflows (SURVEY.md §2 row 29), TPU-native names
    for required in [
        "invert_biggan_adam", "invert_biggan_cma", "invert_biggan_basincma",
        "invert_biggan_nevergrad", "invert_biggan_hybrid_nevergrad",
        "invert_biggan_with_transform", "edit_biggan",
        "invert_stylegan2_cars_adam", "invert_stylegan2_cars_cma",
        "invert_stylegan2_cars_basincma", "invert_stylegan2_cars_ng",
        "invert_stylegan2_cars_hybrid_ng",
    ]:
        assert required in names, f"missing example {required}"


@pytest.mark.parametrize("script", SCRIPTS)
def test_parses_and_imports_resolve(script):
    """AST-parse and verify every absolute ``pix2latent_tpu...`` import
    names a real module/attribute (catches the reference's dead-import
    class of rot without running the model)."""
    import importlib
    path = os.path.join(EXAMPLES, script)
    tree = ast.parse(open(path).read(), filename=path)
    for node in ast.walk(tree):
        mods = []
        if isinstance(node, ast.Import):
            mods = [a.name for a in node.names]
        elif isinstance(node, ast.ImportFrom) and node.level == 0:
            if node.module:
                mods = [node.module]
        for m in mods:
            if not m.startswith("pix2latent_tpu"):
                continue
            importlib.import_module(m)


@pytest.mark.parametrize("script", ["invert_biggan_adam.py",
                                    "invert_stylegan2_cars_basincma.py"])
def test_help_exits_zero(script):
    """argparse wiring works (no top-level crashes before parsing)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), "--help"],
        capture_output=True, timeout=240, env=env)
    assert proc.returncode == 0, proc.stderr.decode()[-800:]
