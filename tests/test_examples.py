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
                                    "invert_stylegan2_cars_basincma.py",
                                    "invert_stylegan2_ffhq_basincma.py"])
def test_help_exits_zero(script):
    """argparse wiring works (no top-level crashes before parsing)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), "--help"],
        capture_output=True, timeout=240, env=env)
    assert proc.returncode == 0, proc.stderr.decode()[-800:]


def test_ffhq_recipe_defaults():
    """The FFHQ example must bake in the measured one-chip memory recipe
    (bf16 + remat_from_res=256 + max_minibatch=2, BASELINE.md) while
    leaving explicit user choices and non-ffhq models untouched."""
    import argparse
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ffhq_example",
        os.path.join(EXAMPLES, "invert_stylegan2_ffhq_basincma.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def ns(**kw):
        base = dict(model="ffhq", no_recipe=False, bf16=False,
                    remat_from_res=0, max_minibatch=None)
        base.update(kw)
        return argparse.Namespace(**base)

    a = mod.apply_ffhq_recipe(ns())
    assert a.bf16 and a.remat_from_res == 256 and a.max_minibatch == 2
    # explicit user settings survive
    a = mod.apply_ffhq_recipe(ns(remat_from_res=512, max_minibatch=4))
    assert a.remat_from_res == 512 and a.max_minibatch == 4
    # opt-outs
    a = mod.apply_ffhq_recipe(ns(no_recipe=True))
    assert not a.bf16 and a.remat_from_res == 0 and a.max_minibatch is None
    a = mod.apply_ffhq_recipe(ns(model="cars"))
    assert not a.bf16 and a.max_minibatch is None


def test_wplus_registration_shapes():
    """--search w+ registers the w latent at the mean latent plus the
    flattened noise vector (the rot this guards: the CLIs exposed
    --search w+ but never registered 'noises', so the w+ forward crashed)."""
    import argparse

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, EXAMPLES)
    from common import register_stylegan2_vars
    from pix2latent_tpu import VariableManager

    class FakeModel:
        def latent_stats(self):
            return jnp.full((512,), 0.25), jnp.asarray(2.0)

        def noise_dim(self):
            return 96

    args = argparse.Namespace(search="w+", grad_free=False, lr=0.05,
                              latent_noise=0.05)
    target = jnp.zeros((64, 64, 3))
    vm = register_stylegan2_vars(VariableManager(), FakeModel(), args,
                                 target, jnp.ones_like(target))
    variables = vm.initialize(num_samples=4)
    assert variables["input"]["z"].shape == (4, 512)
    assert variables["input"]["noises"].shape == (4, 96)
    assert np.allclose(np.asarray(variables["input"]["noises"]), 0.0)
    # w init clusters near the mean latent (sigma = 0.1 * w_std = 0.2)
    assert abs(float(variables["input"]["z"].mean()) - 0.25) < 0.05


def test_wplus_grad_free_seeds_cma_at_mean_latent():
    """grad_free=True in w+ mode must become a (w_mean, sigma) tuple — the
    CMA/NG drivers read their search seed from the tuple, and a bare True
    would start the w search at N(0, I), off the style manifold."""
    import argparse

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, EXAMPLES)
    from common import register_stylegan2_vars
    from pix2latent_tpu import VariableManager

    class FakeModel:
        def latent_stats(self):
            return jnp.full((512,), 0.25), jnp.asarray(2.0)

        def noise_dim(self):
            return 96

    args = argparse.Namespace(search="w+", grad_free=True, lr=0.05,
                              latent_noise=0.05)
    target = jnp.zeros((64, 64, 3))
    vm = register_stylegan2_vars(VariableManager(), FakeModel(), args,
                                 target, jnp.ones_like(target))
    gf = vm.variable_info["z"]["grad_free"]
    assert isinstance(gf, tuple) and len(gf) == 2
    mu, sigma = gf
    assert np.allclose(np.asarray(mu), 0.25)
    assert abs(float(sigma) - 0.2) < 1e-6
