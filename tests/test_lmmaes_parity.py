"""LM-MA-ES numerical cross-validation against an independent numpy
reference (the treatment ``strategies/cma.py`` gets from
``tests/test_cma_parity.py``).

This file transcribes the LM-MA-ES equations (Loshchilov, Glasmachers &
Beyer, "Large Scale Black-box Optimization by Limited-Memory Matrix
Adaptation", IEEE TEC 2019) into standalone float64 numpy — sharing NO code
with ``pix2latent_tpu.strategies.lmmaes`` — and asserts trajectory agreement
(mean / sigma / p_sigma / all m paths per generation) when both
implementations are fed IDENTICAL raw normal samples z.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.strategies import lmmaes as jax_lm


class NumpyLMMAES:
    """Float64 transcription of LM-MA-ES, written from the published
    algorithm independently of the JAX module: the sampling transform is an
    ordered product of rank-1 factors (fastest-timescale path applied first,
    factor j inert until generation j), CSA and every path update
    recombine the top-mu RAW normals, the mean moves along the transformed
    directions."""

    def __init__(self, mean, sigma, popsize, memory):
        self.n = len(mean)
        self.lam = popsize
        self.m = memory
        self.mu = popsize // 2
        w = np.log((popsize + 1) / 2.0) - np.log(np.arange(1, self.mu + 1))
        self.w = w / w.sum()
        self.mueff = 1.0 / np.sum(self.w ** 2)

        n = float(self.n)
        self.c_sigma = min(2.0 * popsize / n, 0.5)
        self.d_sigma = (1.0 + 2.0 * max(0.0, math.sqrt(
            (self.mueff - 1.0) / (n + 1.0)) - 1.0) + self.c_sigma)
        self.c_d = np.minimum(1.0 / (1.5 ** np.arange(memory) * n), 0.5)
        self.c_c = np.minimum(popsize / (4.0 ** np.arange(memory) * n), 0.5)
        self.chi_n = math.sqrt(n) * (1.0 - 1.0 / (4 * n) + 1.0 / (21 * n * n))

        self.mean = np.asarray(mean, np.float64).copy()
        self.sigma = float(sigma)
        self.p_sigma = np.zeros(self.n)
        self.paths = np.zeros((memory, self.n))
        self.t = 0

    def sample(self, z):
        """z [lam, n] -> x [lam, n], d [lam, n]."""
        d = np.array(z, np.float64)
        for j in range(min(self.t, self.m)):
            dots = d @ self.paths[j]
            d = ((1.0 - self.c_d[j]) * d
                 + self.c_d[j] * np.outer(dots, self.paths[j]))
        return self.mean[None] + self.sigma * d, d

    def tell(self, z, d, fitness):
        order = np.argsort(fitness)[:self.mu]
        zw = self.w @ z[order]
        dw = self.w @ d[order]
        self.mean = self.mean + self.sigma * dw
        cs = self.c_sigma
        self.p_sigma = ((1.0 - cs) * self.p_sigma
                        + math.sqrt(cs * (2.0 - cs) * self.mueff) * zw)
        for j in range(self.m):
            ccj = self.c_c[j]
            self.paths[j] = ((1.0 - ccj) * self.paths[j]
                             + math.sqrt(ccj * (2.0 - ccj) * self.mueff)
                             * zw)
        self.sigma = self.sigma * math.exp(
            (cs / self.d_sigma)
            * (np.linalg.norm(self.p_sigma) / self.chi_n - 1.0))
        self.t += 1


def _f64_params(params, ref):
    """The shipped params store the schedules f32 (TPU production dtype);
    the parity run swaps in the reference's f64 derivation so f32 rounding
    can't dominate the comparison (same dance as ``test_cma_parity``)."""
    return params._replace(
        weights=jnp.asarray(ref.w),
        c_d=jnp.asarray(ref.c_d),
        c_c=jnp.asarray(ref.c_c))


@pytest.mark.parametrize("dim", [16, 128, 1024])
def test_trajectory_matches_numpy_reference(dim):
    """40 generations on a rugged quadratic, identical z fed to both:
    mean/sigma/p_sigma/paths must agree to float64-level tolerance."""
    rng = np.random.RandomState(dim)
    popsize = 12
    diag = 10.0 ** (2.0 * np.arange(dim) / max(dim - 1, 1))
    x_star = rng.randn(dim)

    def fitness(x):
        d = np.asarray(x, np.float64) - x_star[None]
        return (diag[None] * d * d).sum(axis=1)

    with jax.enable_x64(True):
        params, state = jax_lm.init(np.zeros(dim), 1.25, popsize=popsize)
        ref = NumpyLMMAES(np.zeros(dim), 1.25, popsize,
                          memory=params.memory)
        # both sides independently derive identical schedules (f32-level:
        # the shipped params store them f32)
        np.testing.assert_allclose(np.asarray(params.weights), ref.w,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(params.c_d), ref.c_d,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(params.c_c), ref.c_c,
                                   rtol=1e-6)
        assert params.memory == jax_lm.default_memory(dim)
        params = _f64_params(params, ref)
        state = jax.tree.map(
            lambda v: v.astype(jnp.float64)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, state)

        tell = jax.jit(lambda s, x, f, z, d: jax_lm.tell(
            params, s, x, f, aux={"z": z, "d": d}))
        transform = jax.jit(lambda s, z: jax_lm._transform(params, s, z))

        for gen in range(40):
            z = rng.randn(popsize, dim)
            x_ref, d_ref = ref.sample(z)
            d_jax = transform(state, jnp.asarray(z))
            np.testing.assert_allclose(
                np.asarray(d_jax), d_ref, rtol=1e-9, atol=1e-11,
                err_msg=f"transform diverged at generation {gen}")
            x_jax = state.mean[None] + state.sigma * d_jax

            f = fitness(x_ref)
            state = tell(state, x_jax, jnp.asarray(f), jnp.asarray(z),
                         d_jax)
            ref.tell(z, d_ref, f)

            np.testing.assert_allclose(
                np.asarray(state.mean), ref.mean, rtol=1e-9, atol=1e-11,
                err_msg=f"mean diverged at generation {gen}")
            np.testing.assert_allclose(
                float(state.sigma), ref.sigma, rtol=1e-9,
                err_msg=f"sigma diverged at generation {gen}")
            np.testing.assert_allclose(
                np.asarray(state.p_sigma), ref.p_sigma, rtol=1e-9,
                atol=1e-11,
                err_msg=f"p_sigma diverged at generation {gen}")
            np.testing.assert_allclose(
                np.asarray(state.paths), ref.paths, rtol=1e-9, atol=1e-11,
                err_msg=f"paths diverged at generation {gen}")


def test_auxless_tell_matches_aux_tell():
    """tell() without aux reconstructs (z, d) via the exact Sherman-
    Morrison inverse: the resulting state must match the aux path."""
    dim, pop = 64, 10
    params, state = jax_lm.init(np.zeros(dim), 1.0, popsize=pop)
    key = jax.random.PRNGKey(0)
    # a few generations so several factors are active
    for g in range(6):
        key, k = jax.random.split(key)
        x, aux = jax_lm.ask_with_aux(params, state, k)
        f = jnp.sum(x ** 2, axis=1)
        state = jax_lm.tell(params, state, x, f, aux=aux)

    key, k = jax.random.split(key)
    x, aux = jax_lm.ask_with_aux(params, state, k)
    f = jnp.sum((x - 0.3) ** 2, axis=1)
    with_aux = jax_lm.tell(params, state, x, f, aux=aux)
    without = jax_lm.tell(params, state, x, f, aux=None)
    for a, b in zip(jax.tree.leaves(with_aux), jax.tree.leaves(without)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_learns_rotated_ellipsoid_beats_diagonal():
    """The whole point of the low-rank model: on a ROTATED ill-conditioned
    quadratic (where a diagonal covariance cannot help), LM-MA-ES must
    far outperform DiagonalCMA at an equal budget."""
    from pix2latent_tpu.strategies.registry import registry

    d, lam, gens = 64, 16, 500
    rng = np.random.RandomState(0)
    Q, _ = np.linalg.qr(rng.randn(d, d))
    scales = 10.0 ** (2.5 * np.arange(d) / (d - 1))

    def fit(x):
        y = np.asarray(x) @ Q
        return jnp.asarray(((scales[None] * y) ** 2).sum(axis=1))

    best = {}
    for name in ("LMMAES", "DiagonalCMA"):
        strat = registry[name](d, lam, mu=np.ones(d), sigma=1.0)
        state = strat.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        b = np.inf
        for g in range(gens):
            key, k = jax.random.split(key)
            x, aux = strat.ask_with_aux(state, k)
            f = fit(x)
            b = min(b, float(jnp.min(f)))
            state = strat.tell(state, x, f, aux=aux)
        best[name] = b
    # measured 1168 vs 5722 (4.9x) at this budget; 0.33 leaves seed margin
    assert best["LMMAES"] < 0.33 * best["DiagonalCMA"], best


def test_lmcma_alias_routes_to_lmmaes():
    from pix2latent_tpu.strategies.registry import (LMMAESStrategy,
                                                    registry)
    assert registry["LMCMA"] is LMMAESStrategy
    assert registry["LMMAES"] is LMMAESStrategy
