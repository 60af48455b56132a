"""Tests for distributions, hooks, and the VariableManager."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pix2latent_tpu import (VariableManager, distribution as dist, hooks,
                            load_variables, num_samples, save_variables,
                            split_vars, stack_splits)


class TestDistributions:
    def test_truncated_normal_modulo_range_and_stats(self, key):
        d = dist.TruncatedNormalModulo(mu=0.0, sigma=1.0, trunc=2.0)
        x = d(key, 4096, (16,))
        assert x.shape == (4096, 16)
        assert float(jnp.max(jnp.abs(x))) < 2.0
        assert abs(float(jnp.mean(x))) < 0.05

    def test_truncated_normal_modulo_honors_args(self, key):
        # The reference ctor ignored sigma/trunc (distribution.py:27-28).
        d = dist.TruncatedNormalModulo(sigma=0.1, trunc=0.5)
        x = d(key, 1024, (8,))
        assert float(jnp.max(jnp.abs(x))) < 0.5
        assert float(jnp.std(x)) < 0.2

    def test_truncated_clamp_normal(self, key):
        d = dist.TruncatedClampNormal(sigma=3.0, trunc=1.0)
        x = d(key, 512, (4,))
        assert float(jnp.max(x)) <= 1.0 and float(jnp.min(x)) >= -1.0

    def test_normal_sigma(self, key):
        x = dist.normal(sigma=2.0)(key, 8192, (4,))
        assert abs(float(jnp.std(x)) - 2.0) < 0.1

    def test_mu_array(self, key):
        mu = jnp.full((4,), 0.5)
        d = dist.TruncatedNormalModulo(mu=mu, sigma=0.01, trunc=2.0)
        x = d(key, 128, (4,))
        assert jnp.allclose(jnp.mean(x, 0), mu, atol=0.01)


class TestHooks:
    def test_clamp(self, key):
        x = jnp.array([[3.0, -3.0, 0.5]])
        y = hooks.Clamp(2.0)(key, x)
        assert jnp.allclose(y, jnp.array([[2.0, -2.0, 0.5]]))

    def test_normalize_per_sample(self, key):
        x = jax.random.normal(key, (5, 512)) * 3.0 + 1.0
        y = hooks.Normalize()(key, x)
        assert jnp.allclose(jnp.mean(y, axis=1), 0.0, atol=1e-4)
        assert jnp.allclose(jnp.std(y, axis=1, ddof=1), 1.0, atol=1e-3)

    def test_perturb_changes_values(self, key):
        x = jnp.zeros((3, 8))
        y = hooks.NormalPerturb(sigma=0.5)(key, x)
        assert float(jnp.std(y)) > 0.1

    def test_scheduled_perturb_decays_to_zero(self, key):
        x = jnp.zeros((2, 16))
        h = hooks.ScheduledNormalPerturb(sigma=0.5, max_step=100, pow=2)
        early = h(key, x, step=0)
        late = h(key, x, step=99)
        assert float(jnp.std(early)) > 0.1
        assert jnp.allclose(late, x, atol=1e-6)

    def test_compose_and_jit(self, key):
        h = hooks.Compose(hooks.NormalPerturb(0.1), hooks.Clamp(0.5))
        y = jax.jit(lambda k, x: h(k, x, 0))(key, jnp.ones((4, 32)))
        assert float(jnp.max(jnp.abs(y))) <= 0.5


class TestVariableManager:
    def make_vm(self):
        vm = VariableManager(seed=0)
        vm.register("z", shape=(128,), var_type="input", learning_rate=0.05,
                    hook_fn=hooks.Clamp(2.0), grad_free=True)
        vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                    default=jnp.ones((128,)))
        vm.register("target", shape=(8, 8, 3), var_type="output",
                    requires_grad=False, default=jnp.zeros((8, 8, 3)))
        return vm

    def test_initialize_shapes(self):
        vm = self.make_vm()
        v = vm.initialize(num_samples=6)
        assert v["input"]["z"].shape == (6, 128)
        assert v["input"]["c"].shape == (6, 128)
        assert v["output"]["target"].shape == (6, 8, 8, 3)
        assert num_samples(v) == 6
        # default value is broadcast
        assert jnp.allclose(v["input"]["c"], 1.0)

    def test_split_and_stack(self):
        vm = self.make_vm()
        v = vm.initialize(num_samples=10)
        chunks = split_vars(v, 4)
        assert [num_samples(c) for c in chunks] == [4, 4, 2]
        back = stack_splits(chunks)
        assert jnp.allclose(back["input"]["z"], v["input"]["z"])

    def test_optimizer_freezes_outputs_and_uses_per_var_lr(self):
        vm = self.make_vm()
        v = vm.initialize(num_samples=3)
        opt = vm.make_optimizer()
        state = opt.init(v)
        grads = jax.tree.map(jnp.ones_like, v)
        updates, _ = opt.update(grads, state, v)
        # frozen target must not move
        assert jnp.allclose(updates["output"]["target"], 0.0)
        # adam first step moves by ~lr in the gradient direction
        assert jnp.allclose(jnp.abs(updates["input"]["z"]), 0.05, atol=1e-4)
        assert jnp.allclose(jnp.abs(updates["input"]["c"]), 0.01, atol=1e-4)

    def test_edit_variable(self):
        vm = self.make_vm()
        assert vm.edit_variable("z", {"grad_free": False})
        assert vm.variable_info["z"]["grad_free"] is False
        assert not vm.edit_variable("z", {"bogus_attr": 1})
        assert not vm.edit_variable("nope", {"grad_free": False})

    def test_unregister(self):
        vm = self.make_vm()
        vm.unregister("c")
        assert "c" not in vm.variable_info

    def test_duplicate_register_refused(self):
        vm = self.make_vm()
        assert vm.register("z", shape=(2,), var_type="input") is False

    def test_apply_hooks(self, key):
        vm = self.make_vm()
        v = vm.initialize(num_samples=2)
        v["input"]["z"] = v["input"]["z"] + 100.0
        hooked = vm.apply_hooks(key, v)
        assert float(jnp.max(hooked["input"]["z"])) <= 2.0
        # hook-free variables untouched
        assert jnp.allclose(hooked["input"]["c"], v["input"]["c"])

    def test_save_load_roundtrip(self, tmp_path):
        vm = self.make_vm()
        v = vm.initialize(num_samples=2)
        p = str(tmp_path / "vars.npy")
        save_variables(p, v, extras={"loss": np.arange(3.0)})
        loaded = load_variables(p)
        assert np.allclose(loaded["variables"]["input"]["z"],
                           np.asarray(v["input"]["z"]))
        assert np.allclose(loaded["loss"], np.arange(3.0))

    def test_grad_free_listing(self):
        vm = self.make_vm()
        gf = vm.grad_free_variables()
        assert len(gf) == 1 and gf[0][1] == "z"

    def test_save_load_exact_path_without_npy_extension(self, tmp_path):
        # np.save appends ".npy" to foreign extensions; save_variables must
        # honor the exact path or the round-trip on the same name breaks
        # (caught on-chip, round 5).
        vm = self.make_vm()
        v = vm.initialize(num_samples=2)
        p = str(tmp_path / "vars.npz")
        save_variables(p, v)
        assert os.path.exists(p)
        loaded = load_variables(p)
        assert np.allclose(loaded["variables"]["input"]["z"],
                           np.asarray(v["input"]["z"]))
