"""On-device CMA-ES correctness tests.

The reference used PyCMA on the host; since our implementation must stand on
its own we validate against the standard published properties of CMA-ES:
default popsize formula, monotone convergence on convex quadratics, solving
the non-separable Rosenbrock function, and step-size adaptation behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.strategies import cma


def run_cma(fn, n, gens, sigma=1.0, popsize=None, mean=None, seed=0,
            active=False):
    params, state = cma.init(
        np.zeros(n) if mean is None else mean, sigma, popsize, active=active)

    @jax.jit
    def gen_step(state, key):
        x = cma.ask(params, state, key)
        f = fn(x)
        return cma.tell(params, state, x, f), jnp.min(f)

    keys = jax.random.split(jax.random.PRNGKey(seed), gens)
    best = np.inf
    for k in keys:
        state, fmin = gen_step(state, k)
        best = min(best, float(fmin))
    return state, best


class TestPopsize:
    def test_reference_budgets(self):
        # README.md:74 — 18 samples for BigGAN (d=128), 22 for StyleGAN2 (d=512)
        assert cma.default_popsize(128) == 18
        assert cma.default_popsize(512) == 22
        assert cma.default_popsize(3) == 7

    def test_weights_sum_to_one(self):
        p = cma.make_params(16)
        assert abs(float(jnp.sum(p.weights)) - 1.0) < 1e-6
        assert p.mu == p.popsize // 2


class TestConvergence:
    def test_sphere(self):
        fn = lambda x: jnp.sum(x ** 2, axis=-1)
        state, best = run_cma(fn, n=10, gens=250)
        assert best < 1e-9
        assert float(jnp.linalg.norm(state.mean)) < 1e-4

    def test_shifted_sphere(self):
        target = jnp.arange(8.0) / 8.0
        fn = lambda x: jnp.sum((x - target) ** 2, axis=-1)
        state, best = run_cma(fn, n=8, gens=250)
        assert float(jnp.linalg.norm(state.mean - target)) < 1e-4

    def test_elliptic_nonseparable(self):
        # Rotated ill-conditioned quadratic exercises covariance adaptation.
        # Hessian condition is capped at ~1e3 — beyond that, candidate
        # fitness differences fall under fp32 resolution on the ridge and
        # ranking (for ANY CMA implementation fed fp32 fitness) loses signal;
        # see the precision note on strategies.cma.tell.
        rng = np.random.RandomState(0)
        q, _ = np.linalg.qr(rng.randn(6, 6))
        scales = jnp.asarray(10.0 ** np.linspace(0, 1.5, 6), jnp.float32)
        q = jnp.asarray(q, jnp.float32)
        fn = lambda x: jnp.sum((scales * (x @ q)) ** 2, axis=-1)
        _, best = run_cma(fn, n=6, gens=600)
        assert best < 1e-8

    def test_rosenbrock(self):
        def fn(x):
            return jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2
                           + (1.0 - x[..., :-1]) ** 2, axis=-1)
        state, best = run_cma(fn, n=5, gens=800, sigma=0.5)
        assert best < 1e-6
        assert float(jnp.max(jnp.abs(state.mean - 1.0))) < 1e-2

    def test_scalar_dimension(self):
        # the reference needed a duplicate-dimension hack for n=1
        # (base_cma_optimizer.py:170-173); we support it natively... n=1 uses
        # popsize from n=2 formula floor.
        fn = lambda x: (x[..., 0] - 3.0) ** 2
        state, best = run_cma(fn, n=1, gens=150, popsize=8)
        assert abs(float(state.mean[0]) - 3.0) < 1e-3

    def test_sigma_adapts_up_then_converges(self):
        # far-away optimum: sigma should grow initially
        fn = lambda x: jnp.sum((x - 50.0) ** 2, axis=-1)
        params, state = cma.init(np.zeros(4), sigma=0.5)

        @jax.jit
        def gen_step(state, key):
            x = cma.ask(params, state, key)
            return cma.tell(params, state, x, fn(x))

        keys = jax.random.split(jax.random.PRNGKey(1), 40)
        sigmas = []
        for k in keys:
            state = gen_step(state, k)
            sigmas.append(float(state.sigma))
        assert max(sigmas) > 0.5  # grew to cover the distance


class TestActiveCMA:
    """aCMA (PyCMA's default mode) — negative-weight covariance updates.
    Trajectory-level numerics vs an independent f64 reference live in
    ``test_cma_parity.py``; here: the option converges and keeps the
    covariance positive definite (the role of eq. 53's alpha guards)."""

    def test_converges_on_rosenbrock(self):
        def rosen(x):
            return jnp.sum(100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2
                           + (1.0 - x[:, :-1]) ** 2, axis=-1)
        state, best = run_cma(rosen, n=8, gens=400, active=True)
        assert best < 1e-6

    def test_covariance_stays_positive_definite(self):
        fn = lambda x: jnp.sum(x ** 2, axis=-1)
        state, _ = run_cma(fn, n=12, gens=150, active=True)
        evals = np.linalg.eigvalsh(np.asarray(state.C))
        assert evals.min() > 0.0

    def test_driver_exposes_active(self):
        import pix2latent_tpu.loss_functions as LF
        from pix2latent_tpu import VariableManager
        from pix2latent_tpu.models.toy import make_toy_model
        from pix2latent_tpu.optimizers import CMAOptimizer
        model = make_toy_model(z_dim=4, res=16, width=8, seed=0)
        target = model(z=jnp.ones((1, 4)))[0]
        vm = VariableManager(seed=0)
        vm.register("z", shape=(4,), var_type="input", grad_free=True)
        vm.register("target", shape=(16, 16, 3), var_type="output",
                    requires_grad=False, default=target)
        opt = CMAOptimizer(model, vm,
                           lambda out, target: LF.l1_loss(out, target))
        opt.optimize(meta_steps=8, grad_steps=0, active=True)
        assert bool(opt.cma_params.active)
        assert float(np.asarray(opt.cma_params.weights).min()) < 0.0


class TestAskTell:
    def test_ask_distribution(self, key):
        params, state = cma.init(np.zeros(32), sigma=2.0, popsize=4096)
        x = cma.ask(params, state, key)
        assert x.shape == (4096, 32)
        assert abs(float(jnp.std(x)) - 2.0) < 0.1

    def test_tell_moves_mean_toward_best(self, key):
        params, state = cma.init(np.zeros(4), sigma=1.0)
        x = cma.ask(params, state, key)
        f = jnp.sum((x - 1.0) ** 2, axis=-1)
        new = cma.tell(params, state, x, f)
        d0 = float(jnp.linalg.norm(state.mean - 1.0))
        d1 = float(jnp.linalg.norm(new.mean - 1.0))
        assert d1 < d0
        assert int(new.gen) == 1

    def test_wrapper_class_api(self):
        opt = cma.CMA(mu=np.zeros(16), sigma=1.0, seed=3)
        assert opt.batch_size() == cma.default_popsize(16)
        for _ in range(120):
            x = opt.ask()
            opt.tell(x, np.asarray(jnp.sum(x ** 2, axis=-1)))
        assert float(jnp.linalg.norm(opt.mean())) < 1e-2

    def test_whole_loop_scannable(self):
        # an entire CMA run as ONE lax.scan — the on-device design goal
        params, state = cma.init(np.zeros(6), sigma=1.0)
        fn = lambda x: jnp.sum(x ** 2, axis=-1)

        @jax.jit
        def run(state, keys):
            def body(s, k):
                x = cma.ask(params, s, k)
                return cma.tell(params, s, x, fn(x)), jnp.min(fn(x))
            return jax.lax.scan(body, state, keys)

        keys = jax.random.split(jax.random.PRNGKey(0), 200)
        final, mins = run(state, keys)
        assert float(mins[-1]) < 1e-6
        assert int(final.gen) == 200


class TestLazyEigen:
    def test_lazy_tell_keeps_basis_and_refresh_restores(self, key):
        from pix2latent_tpu.strategies import cma
        params, state = cma.init(np.zeros(16), 1.0, 8)
        x = jax.random.normal(key, (8, 16))
        f = jnp.sum(x ** 2, axis=1)

        full = cma.tell(params, state, x, f)
        lazy = cma.tell(params, state, x, f, refresh_eigen=False)
        # mean/sigma/C identical; basis stale (still the init identity)
        np.testing.assert_allclose(np.asarray(lazy.mean),
                                   np.asarray(full.mean), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(lazy.C), np.asarray(full.C),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(lazy.B), np.eye(16), atol=0)
        # refresh reproduces the eager basis (up to eigvector sign)
        ref = cma.refresh_eigen(lazy)
        np.testing.assert_allclose(np.asarray(jnp.abs(ref.B)),
                                   np.asarray(jnp.abs(full.B)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ref.D), np.asarray(full.D),
                                   rtol=1e-5)


class TestFitnessSanitization:
    def test_nonfinite_candidates_lose_not_poison(self, key):
        from pix2latent_tpu.strategies import cma
        params, state = cma.init(np.zeros(8), 1.0, 8)
        x = jax.random.normal(key, (8, 8))
        f = jnp.sum(x ** 2, axis=1)
        f_bad = f.at[2].set(jnp.nan).at[5].set(jnp.inf)
        new = cma.tell(params, state, x, f_bad)
        assert np.isfinite(np.asarray(new.mean)).all()
        assert np.isfinite(float(new.sigma))
        assert np.isfinite(np.asarray(new.C)).all()
        # finite candidates unaffected: identical to telling them a penalty
        worst = float(jnp.max(jnp.where(jnp.isfinite(f_bad), f_bad, -jnp.inf)))
        pen = worst + 1e3 * (1.0 + abs(worst))
        f_ref = f_bad.at[2].set(pen).at[5].set(pen)
        ref = cma.tell(params, state, x, f_ref)
        np.testing.assert_allclose(np.asarray(new.mean),
                                   np.asarray(ref.mean), rtol=1e-6)

    def test_all_nonfinite_generation_degrades_gracefully(self, key):
        from pix2latent_tpu.strategies import cma
        params, state = cma.init(np.zeros(4), 1.0, 6)
        x = jax.random.normal(key, (6, 4))
        f = jnp.full((6,), jnp.nan)
        new = cma.tell(params, state, x, f)
        assert np.isfinite(np.asarray(new.mean)).all()
        assert np.isfinite(float(new.sigma))
