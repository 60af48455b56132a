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
        # RandomSearch converges slowly; others should crush the sphere
        bound = 1.5 if name == "RandomSearch" else 0.15
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

    def test_ngopt_routes_by_dimension(self):
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
