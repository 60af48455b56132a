"""Strategy-level tests for the on-device gradient-free registry.

The reference outsources these algorithms to nevergrad
(``pix2latent/optimizer/base_ng_optimizer.py:81-83``); here each strategy is
validated directly on analytic objectives, independent of the optimizer
drivers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.strategies.registry import registry


TARGET = None  # set per-test


def run_strategy(name, dim=8, pop=12, gens=60, seed=0):
    """Minimize the shifted sphere; returns (best_f_first, best_f_last)."""
    x_star = jnp.asarray(np.linspace(-1, 1, dim), jnp.float32)

    def f(x):
        return jnp.sum((x - x_star[None]) ** 2, axis=-1)

    strat = registry[name](dim, pop, mu=None, sigma=1.0)
    key = jax.random.PRNGKey(seed)
    state = strat.init(key)
    first = None
    for g in range(gens):
        key, k = jax.random.split(key)
        x, aux = strat.ask_with_aux(state, k)
        loss = f(x)
        if first is None:
            first = float(loss.min())
        state = strat.tell(state, x, loss, aux=aux)
    final = float(f(strat.mean(state)[None])[0])
    return first, final


class TestRegistryConvergence:
    @pytest.mark.parametrize("name", sorted(registry))
    def test_strategy_minimizes_sphere(self, name):
        # hill climbers need more generations than recombining strategies
        gens = 150 if name == "OnePlusOne" else 60
        first, final = run_strategy(name, gens=gens)
        # keep-best samplers (RandomSearch, one-shot MetaRecentering)
        # converge slowly; adaptive strategies should crush the sphere
        bound = 1.5 if name in ("RandomSearch", "MetaRecentering") else 0.15
        assert final < min(first, bound), (name, first, final)

    def test_tbpsa_beats_random_search(self):
        _, tbpsa = run_strategy("TBPSA", gens=80)
        _, rand = run_strategy("RandomSearch", gens=80)
        assert tbpsa < rand


class TestTBPSA:
    def test_aux_carries_per_candidate_sigmas(self, key):
        strat = registry["TBPSA"](4, 10)
        state = strat.init(key)
        x, aux = strat.ask_with_aux(state, key)
        assert x.shape == (10, 4)
        assert aux.shape == (10, 1)
        assert bool(jnp.all(aux > 0))
        # sigmas self-adapt: not all equal
        assert float(aux.max() - aux.min()) > 0

    def test_tell_recombines_top_quarter_sigma_geometrically(self, key):
        strat = registry["TBPSA"](2, 8)
        state = strat.init(key)
        x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)
        aux = jnp.asarray([[1.], [2.], [4.], [8.], [1.], [1.], [1.], [1.]])
        loss = jnp.asarray([0., 1., 2., 3., 4., 5., 6., 7.])
        new = strat.tell(state, x, loss, aux=aux)
        # top quarter of 8 = 2 candidates: sigmas 1 and 2 -> geomean sqrt(2)
        np.testing.assert_allclose(float(new.sigma), np.sqrt(2.0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new.mean),
                                   np.asarray(x[:2].mean(0)), rtol=1e-6)


class TestTwoPointsDE:
    def test_crossover_is_circular_segment(self, key):
        strat = registry["TwoPointsDE"](16, 6)
        pop = jnp.zeros((6, 16))
        mutant = jnp.ones((6, 16))
        child = strat._crossover(key, mutant, pop)
        m = np.asarray(child)  # 1 where the mutant crossed in
        for row in m:
            k = int(row.sum())
            assert 1 <= k <= 16
            # circular contiguity: the doubled sequence contains a run of
            # exactly k ones iff the ones form one circular segment
            doubled = np.concatenate([row, row])
            runs, cur = [], 0
            for v in doubled:
                cur = cur + 1 if v else 0
                runs.append(cur)
            assert max(runs) == (32 if k == 16 else k), row

    def test_differs_from_binomial_de(self, key):
        de = registry["DE"](16, 6)
        two = registry["TwoPointsDE"](16, 6)
        state = de.init(key)
        x1 = de.ask(state, key)
        x2 = two.ask(two.init(key), key)
        assert not np.allclose(np.asarray(x1), np.asarray(x2))


class TestMetaRecentering:
    def test_latin_hypercube_stratification(self, key):
        """Each dimension's n samples must land in n distinct strata — the
        variance-reduction property the quasi-random sampling is for."""
        from pix2latent_tpu.strategies.registry import MetaRecenteringStrategy
        from scipy.stats import norm as scipy_norm
        n, d = 16, 5
        strat = MetaRecenteringStrategy(d, n, sigma=1.0, budget=n)
        x = strat.ask(strat.init(key), key)
        assert x.shape == (n, d)
        # undo the scale and map back to [0,1): stratum = floor(u * n)
        u = scipy_norm.cdf(np.asarray(x) / strat.scale)
        strata = np.floor(u * n).astype(int)
        for j in range(d):
            assert sorted(strata[:, j]) == list(range(n)), j

    def test_scale_rules(self):
        """autotune: sqrt(log(b)/d); plain: (1+log(b))/(4 log(d)) —
        Meunier et al. 2020 / nevergrad SamplingSearch(autorescale=...)."""
        from pix2latent_tpu.strategies.registry import MetaRecenteringStrategy
        s = MetaRecenteringStrategy(128, 18, budget=540, autotune=True)
        np.testing.assert_allclose(s.scale, np.sqrt(np.log(540.0) / 128.0),
                                   rtol=1e-12)
        s = MetaRecenteringStrategy(128, 18, budget=540, autotune=False)
        np.testing.assert_allclose(
            s.scale, (1.0 + np.log(540.0)) / (4.0 * np.log(128.0)),
            rtol=1e-12)

    def test_beats_fixed_sigma_random_search_small_budget(self, key):
        """The point of recentering: at small budget in high-d, sampling at
        the budget-tuned scale finds better points than sigma=1 sampling
        when the optimum is well inside the unit shell."""
        from pix2latent_tpu.strategies.registry import (
            MetaRecenteringStrategy, RandomSearchStrategy)
        d, n, gens = 64, 16, 4
        x_star = jnp.full((d,), 0.15)

        def f(x):
            return jnp.sum((x - x_star[None]) ** 2, axis=-1)

        def run(strat):
            k = key
            state = strat.init(k)
            for _ in range(gens):
                k, kk = jax.random.split(k)
                x = strat.ask(state, kk)
                state = strat.tell(state, x, f(x))
            return float(f(strat.mean(state)[None])[0])

        meta = run(MetaRecenteringStrategy(d, n, sigma=1.0, budget=n * gens))
        naive = run(RandomSearchStrategy(d, n, sigma=1.0))
        assert meta < naive


class TestDiagonalCMA:
    def test_diagonal_variances_adapt_to_scaling(self, key):
        """On an axis-scaled sphere the learned diagonal must allocate more
        variance to the flat (low-curvature) coordinate."""
        from pix2latent_tpu.strategies.registry import registry
        dim, pop = 6, 16
        scale = jnp.asarray([30.0, 1.0, 1.0, 1.0, 1.0, 1.0])

        def f(x):
            return jnp.sum((x * scale[None]) ** 2, axis=-1)

        strat = registry["DiagonalCMA"](dim, pop, sigma=1.0)
        state = strat.init(key)
        for g in range(80):
            key, k = jax.random.split(key)
            x = strat.ask(state, k)
            state = strat.tell(state, x, f(x))
        diag = np.asarray(state.diag_c)
        # coordinate 0 is 900x more curved -> much smaller sampled variance
        assert diag[0] * 20 < diag[1:].mean()
        assert float(f(strat.mean(state)[None])[0]) < 1e-3

    def test_ngopt_routes_by_dimension_without_budget(self):
        """No budget -> the dimension-only fallback (round-2 behavior)."""
        from pix2latent_tpu.strategies.registry import (
            ActiveCMAStrategy, DiagonalCMAStrategy, registry)
        assert isinstance(registry["NGOpt"](8, 12), ActiveCMAStrategy)
        assert isinstance(registry["NGOpt"](512, 22), DiagonalCMAStrategy)

    def test_highdim_sphere(self, key):
        """O(d) updates must stay usable at w+-scale dimensions."""
        from pix2latent_tpu.strategies.registry import registry
        dim, pop = 512, 22
        x_star = jnp.asarray(np.random.RandomState(0).randn(dim) * 0.3,
                             jnp.float32)

        def f(x):
            return jnp.sum((x - x_star[None]) ** 2, axis=-1)

        strat = registry["DiagonalCMA"](dim, pop, sigma=1.0)
        state = strat.init(key)

        @jax.jit
        def gen(state, k):
            x = strat.ask(state, k)
            loss = f(x)
            return strat.tell(state, x, loss), loss

        first = None
        for g in range(400):
            key, k = jax.random.split(key)
            state, loss = gen(state, k)
            first = first if first is not None else float(loss.min())
        final = float(f(strat.mean(state)[None])[0])
        # d=512 needs O(d) generations; 400 gens should cut the sphere hard
        assert final < 0.1 * first

    def test_ngopt_portfolio_branches_with_budget(self):
        """The NGOptBase decision tree (nevergrad optimizerlib) mapped to
        on-device leaves: each (dim, workers, budget) regime routes to the
        documented strategy (see ``NGOptSelector``'s mapping table)."""
        from pix2latent_tpu.strategies.registry import (
            ActiveCMAStrategy, DEStrategy, MetaRecenteringStrategy,
            NGOptSelector, OnePlusOneStrategy, TBPSAStrategy)
        # fully-parallel one-shot: workers > budget/2
        assert isinstance(NGOptSelector(128, 18, budget=20),
                          MetaRecenteringStrategy)
        # parallel branch, budget < dim: also one-shot recentering
        assert isinstance(NGOptSelector(512, 22, budget=100),
                          MetaRecenteringStrategy)
        # merely parallel (budget/5 < workers <= budget/2, budget >= dim)
        assert isinstance(NGOptSelector(16, 10, budget=40), TBPSAStrategy)
        # sequential, small budget relative to dimension: hill climber
        assert isinstance(NGOptSelector(128, 1, budget=1000),
                          OnePlusOneStrategy)
        # sequential, large budget: nevergrad's chainCMAPowell -> aCMA leaf
        assert isinstance(NGOptSelector(300, 1, budget=7000),
                          ActiveCMAStrategy)
        # default regime, very high dimension: DE
        assert isinstance(NGOptSelector(4096, 8, budget=200000), DEStrategy)
        # default regime: aCMA (nevergrad's CMA default mode)
        assert isinstance(NGOptSelector(128, 18, budget=20000),
                          ActiveCMAStrategy)
        # noisy objective: TBPSA regardless of the rest
        assert isinstance(NGOptSelector(128, 18, budget=20000, noisy=True),
                          TBPSAStrategy)

    def test_setup_ng_forwards_budget_to_ngopt(self, key):
        """The NG drivers pass budget = meta_steps * num_samples; the
        BasinCMA-like regime (pop 18, 30 gens, d=128) must land in the
        default aCMA leaf, not the no-budget fallback."""
        from pix2latent_tpu.optimizers.ng_base import _BaseNGOptimizer
        from pix2latent_tpu.strategies.registry import ActiveCMAStrategy
        from pix2latent_tpu import VariableManager
        import pix2latent_tpu.distribution as dist

        vm = VariableManager()
        vm.register(variable_name="z", shape=(128,), grad_free=True,
                    distribution=dist.TruncatedNormalModulo(sigma=1.0),
                    var_type="input")

        class Driver(_BaseNGOptimizer):
            def __init__(self):
                _BaseNGOptimizer.__init__(self, method="NGOpt")
                self._k = jax.random.PRNGKey(0)

            def next_key(self):
                self._k, k = jax.random.split(self._k)
                return k

        drv = Driver()
        drv.setup_ng(vm, num_samples=18, budget=30 * 18)
        assert isinstance(drv.ng_strategy, ActiveCMAStrategy)

    def test_popsize_one_no_nan(self, key):
        """num_samples=1 must not NaN the recombination weights (guarded
        like CMAStrategy's max(n, 2))."""
        from pix2latent_tpu.strategies.registry import registry
        strat = registry["DiagonalCMA"](4, 1, sigma=1.0)
        state = strat.init(key)
        for g in range(5):
            key, k = jax.random.split(key)
            x = strat.ask(state, k)
            assert x.shape == (1, 4)
            state = strat.tell(state, x, jnp.sum(x ** 2, -1))
        assert np.isfinite(np.asarray(state.mean)).all()
        assert np.isfinite(float(state.sigma))


class TestCacheToken:
    """``cache_token()`` keys the fused drivers' compiled-program memo
    (``ng_optimizer.py``): equal tokens promise the traced programs are
    interchangeable, so it must cover every behavior-determining
    hyperparameter — including derived ones like MetaRecentering's
    budget-dependent scale."""

    def test_equal_config_equal_token(self):
        a = registry["ActiveCMA"](16, 8, mu=None, sigma=0.7)
        b = registry["ActiveCMA"](16, 8, mu=None, sigma=0.7)
        assert a.cache_token() == b.cache_token()
        # usable as a dict key
        assert len({a.cache_token(): 1, b.cache_token(): 2}) == 1

    def test_mu_and_sigma_distinguish(self):
        base = registry["TBPSA"](8, 6, mu=None, sigma=1.0)
        other_sigma = registry["TBPSA"](8, 6, mu=None, sigma=0.5)
        mu = np.linspace(-1, 1, 8).astype(np.float32)
        other_mu = registry["TBPSA"](8, 6, mu=mu, sigma=1.0)
        toks = {base.cache_token(), other_sigma.cache_token(),
                other_mu.cache_token()}
        assert len(toks) == 3

    def test_budget_derived_scale_distinguishes(self):
        """Two MetaRecentering instances with identical (dim, pop, sigma)
        but different budgets trace different programs (the sampling scale
        is baked into the compiled ask) — their tokens must differ."""
        a = registry["MetaRecentering"](32, 10, budget=100)
        b = registry["MetaRecentering"](32, 10, budget=10000)
        assert a.scale != b.scale
        assert a.cache_token() != b.cache_token()

    def test_ngopt_routed_leaf_distinguishes(self):
        """NGOpt with budgets that land in different leaves must not share
        a program (the leaf class name is part of the token)."""
        from pix2latent_tpu.strategies.registry import NGOptSelector
        small = NGOptSelector(128, 18, budget=20000)      # aCMA leaf
        noisy = NGOptSelector(128, 18, budget=20000, noisy=True)  # TBPSA
        assert small.cache_token() != noisy.cache_token()

    def test_padded_population_rescales_budget(self):
        """On a mesh, setup_ng pads num_samples up to the device count and
        must rescale budget by the same factor — callers compute
        budget = generations x REQUESTED population, and budget-derived
        hyperparameters (MetaRecentering's scale) would otherwise change
        meaning on meshed runs only."""
        from pix2latent_tpu.optimizers.ng_base import _BaseNGOptimizer
        from pix2latent_tpu.parallel.mesh import make_mesh
        from pix2latent_tpu import VariableManager
        import pix2latent_tpu.distribution as dist

        vm = VariableManager()
        vm.register(variable_name="z", shape=(32,), grad_free=True,
                    distribution=dist.TruncatedNormalModulo(sigma=1.0),
                    var_type="input")

        class Driver(_BaseNGOptimizer):
            def __init__(self, mesh):
                _BaseNGOptimizer.__init__(self, method="MetaRecentering")
                self.mesh = mesh
                self._k = jax.random.PRNGKey(0)

            def next_key(self):
                self._k, k = jax.random.split(self._k)
                return k

        n_dev = len(jax.devices())
        assert n_dev == 8, "conftest forces an 8-device virtual mesh"
        drv = Driver(make_mesh())
        drv.setup_ng(vm, num_samples=6, budget=10 * 6)    # pads 6 -> 8
        assert drv.num_samples == 8
        expected = registry["MetaRecentering"](32, 8, budget=10 * 8)
        assert drv.ng_strategy.scale == expected.scale
