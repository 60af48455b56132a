"""Host-callback NG escape hatch (VERDICT.md round 2, item 4).

``Host:<backend>`` names wrap ANY stateful host optimizer with the registry
interface (``strategies/host.py``) — the reference's full
``ng.optimizers.registry`` surface (``base_ng_optimizer.py:33,81-102``).
nevergrad is absent in this environment by design, so these tests drive the
hatch with a stub host optimizer; the nevergrad auto-wrap path is covered
by its loud ImportError message.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager
from pix2latent_tpu.models.toy import make_toy_model
from pix2latent_tpu.optimizers import (HybridNevergradOptimizer,
                                       NevergradOptimizer)
from pix2latent_tpu.strategies.host import (HostStrategy,
                                            register_host_backend,
                                            _HOST_BACKENDS)
from pix2latent_tpu.strategies.registry import is_valid_method, resolve

Z_DIM, RES = 8, 16


class StubHostES:
    """Minimal host-side (mu/2, lambda)-ES with impure Python state —
    stands in for a nevergrad optimizer. Tracks call counts so the tests
    can assert the host actually ran (including from inside jit)."""

    def __init__(self, dim, num_samples, mu=None, sigma=1.0):
        self.dim, self.n = dim, num_samples
        self.mean = (np.zeros(dim, np.float32) if mu is None
                     else np.asarray(mu, np.float32).copy())
        self.sigma = float(sigma)
        self.rng = np.random.RandomState(0)
        self.asks = 0
        self.tells = 0
        self._last = None

    def ask(self):
        self.asks += 1
        self._last = (self.mean[None]
                      + self.sigma * self.rng.randn(self.n, self.dim)
                      ).astype(np.float32)
        return self._last

    def tell(self, x, loss):
        self.tells += 1
        k = max(self.n // 2, 1)
        best = np.argsort(np.asarray(loss))[:k]
        self.mean = np.asarray(x)[best].mean(axis=0)
        self.sigma *= 0.95


@pytest.fixture(autouse=True)
def _stub_backend():
    register_host_backend("StubES", StubHostES)
    yield
    _HOST_BACKENDS.pop("StubES", None)


@pytest.fixture(scope="module")
def problem():
    model = make_toy_model(z_dim=Z_DIM, res=RES, width=16, seed=0)
    z_true = jax.random.normal(jax.random.PRNGKey(7), (1, Z_DIM))
    target = model(z=z_true)[0]
    return model, target


def make_vm(target):
    vm = VariableManager(seed=0)
    vm.register("z", shape=(Z_DIM,), var_type="input", grad_free=True,
                learning_rate=0.05)
    vm.register("target", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=jnp.ones((RES, RES, 3)))
    return vm


def loss_fn(out, target, weight):
    return LF.masked_l1_loss(out, target, weight)


class TestResolution:
    def test_registry_names_still_resolve(self):
        assert resolve("CMA").__name__ == "CMAStrategy"

    def test_host_name_is_valid_and_resolves(self):
        assert is_valid_method("Host:StubES")
        strat = resolve("Host:StubES")(Z_DIM, 6)
        assert isinstance(strat, HostStrategy)

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError, match="Host:<backend>"):
            resolve("NoSuchMethod")

    def test_missing_backend_without_nevergrad_raises_helpfully(self):
        build = resolve("Host:NotRegistered")
        with pytest.raises(RuntimeError, match="register_host_backend"):
            build(Z_DIM, 6)


class TestHostStrategyCore:
    def test_ask_tell_outside_jit(self):
        strat = resolve("Host:StubES")(Z_DIM, 6, mu=None, sigma=1.0)
        state = strat.init(jax.random.PRNGKey(0))
        x, aux = strat.ask_with_aux(state, jax.random.PRNGKey(1))
        assert np.asarray(x).shape == (6, Z_DIM)
        state = strat.tell(state, x, jnp.arange(6.0), aux=aux)
        assert int(state.version) == 1
        assert strat._host.asks == 1 and strat._host.tells == 1

    def test_ask_tell_inside_jit_via_io_callback(self):
        """The fused drivers trace ask/tell — the io_callback must run the
        host halves in order from inside a compiled program."""
        strat = resolve("Host:StubES")(Z_DIM, 6)
        host = strat._host

        @jax.jit
        def generation(state, key):
            x, aux = strat.ask_with_aux(state, key)
            loss = jnp.sum(x ** 2, axis=1)
            state = strat.tell(state, x, loss, aux=aux)
            return state, jnp.min(loss)

        state = strat.init(jax.random.PRNGKey(0))
        for i in range(3):
            state, best = generation(state, jax.random.PRNGKey(i))
        jax.block_until_ready(best)
        assert host.asks == 3 and host.tells == 3
        assert int(state.version) == 3
        # selection actually moved the host mean (losses reached the host)
        assert float(np.linalg.norm(host.mean)) > 0

    def test_host_optimizer_minimizes_sphere(self):
        strat = resolve("Host:StubES")(Z_DIM, 12)
        state = strat.init(jax.random.PRNGKey(0))
        x_star = np.linspace(-1, 1, Z_DIM).astype(np.float32)
        for g in range(40):
            x, aux = strat.ask_with_aux(state, jax.random.PRNGKey(g))
            loss = jnp.sum((x - x_star[None]) ** 2, axis=1)
            state = strat.tell(state, x, loss, aux=aux)
        final = float(np.sum((np.asarray(strat.mean(state)) - x_star) ** 2))
        assert final < 0.15, final


class TestHostStrategyInDrivers:
    def test_nevergrad_optimizer_host_loop(self, problem):
        model, target = problem
        opt = NevergradOptimizer("Host:StubES", model, make_vm(target),
                                 loss_fn, track_variables=False)
        variables, outs, losses = opt.optimize(num_samples=8, meta_steps=10,
                                               grad_steps=0)
        assert opt.ng_strategy._host.asks >= 10
        assert np.isfinite(np.asarray(opt.loss)).all()

    def test_hybrid_fused_with_host_strategy(self, problem):
        """The one-dispatch generation composes with the host hatch: the
        traced program pauses at the io_callbacks, exactly like the
        reference's device->host PyCMA round trip."""
        model, target = problem
        opt = HybridNevergradOptimizer("Host:StubES", model,
                                       make_vm(target), loss_fn,
                                       track_variables=False)
        variables, outs, losses = opt.optimize_fused(
            num_samples=6, meta_steps=4, grad_steps=4, last_grad_steps=6)
        host = opt.ng_strategy._host
        assert host.asks >= 4 and host.tells >= 4
        assert np.isfinite(np.asarray(opt.loss)).all()
        # the ES made progress on the inversion
        assert float(np.min(opt.loss)) < 0.6


class TestHostStrategyGuards:
    """Self-review hardening: the fused-program memo and checkpointing both
    assume state they cannot see — Host: strategies must opt out of each
    loudly rather than silently reuse/restart."""

    def test_cache_token_is_per_instance(self):
        """Two Host: strategies with identical config wrap DIFFERENT
        mutable host objects; a shared compiled program would route one
        search's asks into the other's optimizer. Tokens must differ
        (unlike the on-device strategies, where equal config => equal
        token)."""
        a = resolve("Host:StubES")(Z_DIM, 6, mu=None, sigma=1.0)
        b = resolve("Host:StubES")(Z_DIM, 6, mu=None, sigma=1.0)
        assert a.cache_token() != b.cache_token()
        assert a.cache_token() == a.cache_token()

    def test_seed_mu_sigma_reach_host_backend(self):
        """The registered grad_free (mu, sigma) seed must parametrize the
        wrapped host optimizer, not just the on-device strategies
        (reference: nevergrad parametrization mutation sigma,
        ``base_ng_optimizer.py:33``)."""
        mu = np.linspace(-0.5, 0.5, Z_DIM).astype(np.float32)
        strat = resolve("Host:StubES")(Z_DIM, 6, mu=mu, sigma=0.25)
        host = strat._host
        np.testing.assert_allclose(np.asarray(host.mean), mu, atol=1e-6)
        assert host.sigma == 0.25

    @pytest.mark.parametrize("driver", ["ng", "hybrid", "hybrid_fused"])
    def test_checkpoint_path_rejected(self, problem, tmp_path, driver):
        """Host: state lives in the wrapped Python object and cannot be
        serialized — checkpoint_path must raise up front instead of
        printing 'resumed' while silently restarting the search."""
        model, target = problem
        ckpt = str(tmp_path / "host.npz")
        if driver == "ng":
            opt = NevergradOptimizer("Host:StubES", model, make_vm(target),
                                     loss_fn, track_variables=False)
            run = lambda: opt.optimize(num_samples=6, meta_steps=3,
                                       grad_steps=0, checkpoint_path=ckpt)
        else:
            opt = HybridNevergradOptimizer("Host:StubES", model,
                                           make_vm(target), loss_fn,
                                           track_variables=False)
            drive = (opt.optimize_fused if driver == "hybrid_fused"
                     else opt.optimize)
            run = lambda: drive(num_samples=6, meta_steps=3, grad_steps=1,
                                last_grad_steps=1, checkpoint_path=ckpt)
        with pytest.raises(ValueError, match="Host:"):
            run()
        assert not os.path.exists(ckpt)


class TestFusedMemoHygiene:
    """The hybrid fused-program memo (``ng_optimizer.py``): its key must
    cover the grad-free variable binding the traced program writes asks
    into, and Host: strategies must not be memoized at all (per-instance
    tokens can never hit again — entries would only pin dead host
    optimizers and compiled programs)."""

    def _two_latent_problem(self):
        from pix2latent_tpu.models.base import FunctionModel
        proj = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (Z_DIM, RES * RES * 3)))

        m = FunctionModel(
            lambda params, z, w: jnp.tanh((z + w) @ params).reshape(
                -1, RES, RES, 3),
            params=jnp.asarray(proj))
        target = m(z=jax.random.normal(jax.random.PRNGKey(7), (1, Z_DIM)),
                   w=jnp.zeros((1, Z_DIM)))[0]
        return m, target

    def _vm(self, target, gf_name):
        vm = VariableManager(seed=0)
        for name in ("z", "w"):
            vm.register(name, shape=(Z_DIM,), var_type="input",
                        grad_free=(name == gf_name), learning_rate=0.05)
        vm.register("target", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False, default=target)
        return vm

    def test_memo_rebuilds_when_grad_free_variable_changes(self):
        """Same dim/popsize but a different grad-free variable binding must
        NOT reuse the compiled program (it would write asks into the old
        variable name, silently optimizing the wrong latent)."""
        model, target = self._two_latent_problem()
        loss = lambda out, target: jnp.mean(jnp.abs(target - out),
                                            axis=(1, 2, 3))
        opt = HybridNevergradOptimizer("TBPSA", model,
                                       self._vm(target, "z"), loss,
                                       track_variables=False)
        opt.optimize_fused(num_samples=4, meta_steps=2, grad_steps=2,
                           last_grad_steps=2)
        assert len(opt._fused_gens) == 1

        # rebind: now w is the searched latent, z takes gradients
        opt.var_manager = self._vm(target, "w")
        variables, _, _ = opt.optimize_fused(num_samples=4, meta_steps=2,
                                             grad_steps=2, last_grad_steps=2)
        assert len(opt._fused_gens) == 2, (
            "stale fused program reused across a grad-free rebinding")
        # the ask landed in w: the searched latent moved off its zero init
        assert float(np.abs(np.asarray(variables["input"]["w"])).max()) > 0

    def test_host_strategies_are_not_memoized(self, problem):
        """Repeated Host: fused runs re-trace by necessity (fresh host
        object per setup_ng); the memo must not grow a dead entry per
        call."""
        model, target = problem
        opt = HybridNevergradOptimizer("Host:StubES", model,
                                       make_vm(target), loss_fn,
                                       track_variables=False)
        for _ in range(2):
            opt.optimize_fused(num_samples=4, meta_steps=2, grad_steps=1,
                               last_grad_steps=1)
        assert len(getattr(opt, "_fused_gens", {})) == 0
