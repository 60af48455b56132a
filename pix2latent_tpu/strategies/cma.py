"""On-device CMA-ES.

The reference delegates CMA-ES to PyCMA on the host
(``pix2latent/optimizer/base_cma_optimizer.py:176``), paying a device↔host
round trip per generation (ask upload, tell download + numpy/BLAS covariance
update). Here the *entire* strategy — sampling, ranking, mean/covariance/
step-size adaptation, eigendecomposition — is pure JAX on TPU, so a whole
BasinCMA generation (ask → inner Adam scan → tell) compiles into one XLA
program with zero host synchronization.

The algorithm is the standard (μ/μ_w, λ)-CMA-ES with cumulative step-size
adaptation and rank-1 + rank-μ covariance updates (Hansen, "The CMA Evolution
Strategy: A Tutorial"), plus optional ACTIVE covariance updates
(``active=True``: negative weights for the worst-ranked candidates,
tutorial eq. 53) — PyCMA's default mode, which the reference therefore ran.
Default population size matches PyCMA's ``4 + floor(3 ln n)`` so the
reference budgets (18 for d=128, 22 for d=512; ``README.md:74``) are
reproduced exactly. Both modes are cross-validated trajectory-for-trajectory
against an independent float64 numpy transcription
(``tests/test_cma_parity.py``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def default_popsize(n: int) -> int:
    """PyCMA's default population size: ``4 + floor(3 ln n)``."""
    return 4 + int(math.floor(3.0 * math.log(max(n, 2))))


class CMAParams(NamedTuple):
    """Static (trace-time constant) strategy parameters for dimension n, popsize λ."""
    n: int
    popsize: int
    mu: int
    weights: jax.Array      # f32[popsize]; zero (plain) or negative
    #                         (active) beyond mu
    mueff: float
    cc: float
    cs: float
    c1: float
    cmu: float
    damps: float
    chi_n: float
    active: bool = False    # aCMA: negative-weight covariance updates


class CMAState(NamedTuple):
    """Evolving strategy state — a pytree that lives on device."""
    mean: jax.Array         # f32[n]
    sigma: jax.Array        # f32[] overall step size
    C: jax.Array            # f32[n, n] covariance
    B: jax.Array            # f32[n, n] eigenbasis of C
    D: jax.Array            # f32[n]   sqrt-eigenvalues of C
    p_sigma: jax.Array      # f32[n]   step-size evolution path
    p_c: jax.Array          # f32[n]   covariance evolution path
    gen: jax.Array          # i32[]    generation counter


def make_params(n: int, popsize: Optional[int] = None,
                active: bool = False) -> CMAParams:
    """Strategy coefficients.

    ``active=True`` enables aCMA (Jastrebski & Arnold 2006; Hansen's
    tutorial eq. 53: negative recombination weights for the worst-ranked
    candidates in the rank-μ covariance update). PyCMA — which the
    reference uses — has active ON by default, so ``active=True``
    reproduces the upstream *default* behavior; ``active=False`` is the
    plain tutorial algorithm the f64 cross-validation was originally
    written against. Mean/step-size adaptation are identical in both.
    """
    if popsize is None:
        popsize = default_popsize(n)
    popsize = int(popsize)
    assert popsize >= 2, "CMA-ES needs popsize >= 2"
    mu = popsize // 2

    w_raw = np.log((popsize + 1) / 2.0) - np.log(np.arange(1, popsize + 1))
    w = w_raw[:mu] / w_raw[:mu].sum()
    mueff = float(1.0 / np.sum(w ** 2))
    weights = np.zeros(popsize, dtype=np.float32)
    weights[:mu] = w

    nf = float(max(n, 1))
    cc = (4.0 + mueff / nf) / (nf + 4.0 + 2.0 * mueff / nf)
    cs = (mueff + 2.0) / (nf + mueff + 5.0)
    c1 = 2.0 / ((nf + 1.3) ** 2 + mueff)
    cmu = min(1.0 - c1, 2.0 * (mueff - 2.0 + 1.0 / mueff) /
              ((nf + 2.0) ** 2 + mueff))
    damps = 1.0 + 2.0 * max(0.0, math.sqrt((mueff - 1.0) / (nf + 1.0)) - 1.0) + cs
    chi_n = math.sqrt(nf) * (1.0 - 1.0 / (4.0 * nf) + 1.0 / (21.0 * nf ** 2))

    if active:
        # negative weights, scaled per the tutorial's eq. 53 guards
        w_neg = w_raw[mu:]                           # negative tail
        mueff_neg = float(w_neg.sum() ** 2 / np.sum(w_neg ** 2))
        # cmu = 0 when mueff = 1 (popsize 2): the cmu-normalized guards
        # are vacuous (the negative weights never enter the rank-mu
        # update) — their limit is +inf, leaving a_mueff to set the scale
        a_mu = 1.0 + c1 / cmu if cmu > 0.0 else np.inf
        a_mueff = 1.0 + 2.0 * mueff_neg / (mueff + 2.0)
        a_posdef = ((1.0 - c1 - cmu) / (nf * cmu) if cmu > 0.0
                    else np.inf)
        scale = min(a_mu, a_mueff, a_posdef) / abs(w_neg.sum())
        weights[mu:] = (w_neg * scale).astype(np.float32)

    return CMAParams(n=int(n), popsize=popsize, mu=mu,
                     weights=jnp.asarray(weights),
                     mueff=mueff, cc=cc, cs=cs, c1=c1, cmu=cmu,
                     damps=damps, chi_n=chi_n, active=bool(active))


def init(mean, sigma: float = 1.0, popsize: Optional[int] = None,
         active: bool = False):
    """Build (params, state) for a search centered at ``mean`` with step ``sigma``."""
    assert float(sigma) > 0.0, (
        f"CMA sigma must be positive, got {sigma}")
    mean = jnp.asarray(mean, jnp.float32).reshape(-1)
    n = mean.shape[0]
    params = make_params(n, popsize, active=active)
    eye = jnp.eye(n, dtype=jnp.float32)
    state = CMAState(
        mean=mean,
        sigma=jnp.asarray(float(sigma), jnp.float32),
        C=eye,
        B=eye,
        D=jnp.ones((n,), jnp.float32),
        p_sigma=jnp.zeros((n,), jnp.float32),
        p_c=jnp.zeros((n,), jnp.float32),
        gen=jnp.zeros((), jnp.int32),
    )
    return params, state


def ask(params: CMAParams, state: CMAState, key) -> jax.Array:
    """Sample λ candidates ~ N(mean, sigma^2 C). Returns f32[λ, n].

    ``x_i = mean + sigma * B (D ⊙ z_i)`` — one small matmul on the MXU.
    """
    x, _ = ask_with_y(params, state, key)
    return x


def ask_with_y(params: CMAParams, state: CMAState, key):
    """Like :func:`ask` but also returns the pre-scale perturbations ``y``
    (``x = mean + sigma * y``) for a cancellation-free :func:`tell`."""
    z = jax.random.normal(key, (params.popsize, params.n), jnp.float32)
    y = (z * state.D[None, :]) @ state.B.T
    return state.mean[None, :] + state.sigma * y, y


def sanitize_fitness(fitness: jax.Array) -> jax.Array:
    """Replace non-finite fitness values with a worse-than-worst penalty.

    Candidates can legitimately produce nan/inf losses (e.g. an alignment
    search sampling a near-zero scale whose inverse warp divides by ~0 —
    transform_optimizer inverted tell). One such candidate must lose the
    ranking, not poison the whole covariance update: nevergrad "cleans"
    fitness the same way, while PyCMA raises. If the entire generation is
    non-finite, everything maps to the same penalty and the update
    degenerates gracefully (stable argsort order).
    """
    finite = jnp.isfinite(fitness)
    neg_inf = jnp.asarray(-jnp.inf, fitness.dtype)
    worst = jnp.max(jnp.where(finite, fitness, neg_inf))
    worst = jnp.where(jnp.any(finite), worst, jnp.zeros((), fitness.dtype))
    penalty = worst + 1e3 * (1.0 + jnp.abs(worst))
    return jnp.where(finite, fitness, penalty)


def tell(params: CMAParams, state: CMAState, x: jax.Array,
         fitness: jax.Array, y: Optional[jax.Array] = None,
         refresh_eigen: bool = True) -> CMAState:
    """Rank candidates by fitness (lower is better) and update the strategy.

    Pass ``y`` (the pre-scale perturbations from :func:`ask_with_y`) to avoid
    the fp32 cancellation in ``(x - mean) / sigma`` when ``sigma`` is tiny.

    Precision note: all arithmetic is fp32 (TPU-native). Ranking fidelity is
    then bounded by the *fitness function's* fp32 resolution — objectives
    whose candidate-to-candidate differences fall below ~1e-7 relative (e.g.
    synthetic ridges with Hessian condition >> 1e4) need float64 fitness,
    which image-reconstruction losses never approach.
    """
    dt = state.mean.dtype   # dtype-polymorphic: f32 in production, f64 in
    #                         the numerical cross-validation tests — a
    #                         strong-f32 scalar would silently round every
    #                         weakly-typed coefficient it multiplies
    fitness = sanitize_fitness(fitness)
    order = jnp.argsort(fitness)
    w = params.weights.astype(dt)[jnp.argsort(order)]  # weight per candidate
    if y is None:
        y = (x - state.mean[None, :]) / state.sigma  # [λ, n]

    # mean/path recombination always uses the positive weights only (aCMA's
    # negative weights act exclusively on the covariance, tutorial eq. 53)
    w_pos = jnp.maximum(w, 0.0)
    y_w = w_pos @ y                                 # weighted recombination
    new_mean = state.mean + state.sigma * y_w

    # C^{-1/2} y_w via the cached eigendecomposition.
    inv_d = 1.0 / jnp.maximum(state.D, 1e-20)
    c_inv_sqrt_yw = state.B @ (inv_d * (state.B.T @ y_w))

    cs, cc, c1, cmu = params.cs, params.cc, params.c1, params.cmu
    mueff, chi_n = params.mueff, params.chi_n

    p_sigma = ((1.0 - cs) * state.p_sigma +
               jnp.sqrt(cs * (2.0 - cs) * mueff) * c_inv_sqrt_yw)

    gen1 = state.gen.astype(dt) + 1.0
    ps_norm = jnp.linalg.norm(p_sigma)
    denom = jnp.sqrt(1.0 - (1.0 - cs) ** (2.0 * gen1))
    h_sigma = (ps_norm / denom / chi_n <
               1.4 + 2.0 / (params.n + 1.0)).astype(dt)

    p_c = ((1.0 - cc) * state.p_c +
           h_sigma * jnp.sqrt(cc * (2.0 - cc) * mueff) * y_w)

    if params.active:
        # w° (tutorial eq. 53): negative weights rescaled by
        # n / ||C^{-1/2} y_i||^2 so long steps can't break positive
        # definiteness; ||C^{-1/2} y||^2 is rotation-invariant, so the
        # eigen-basis components suffice
        y_eig = (y @ state.B) * inv_d[None, :]
        norm2 = jnp.sum(y_eig ** 2, axis=1)
        w_o = jnp.where(w >= 0.0, w,
                        w * params.n / jnp.maximum(norm2, 1e-20))
    else:
        w_o = w
    rank_mu = (y * w_o[:, None]).T @ y              # Σ w_i° y_i y_iᵀ
    delta_h = (1.0 - h_sigma) * cc * (2.0 - cc)
    # decay uses Σ w_j over ALL weights — exactly 1 in the plain algorithm
    # (kept literal so the default path stays bit-identical)
    w_sum = jnp.sum(w) if params.active else 1.0
    C = ((1.0 - c1 - cmu * w_sum) * state.C +
         c1 * (jnp.outer(p_c, p_c) + delta_h * state.C) +
         cmu * rank_mu)
    C = 0.5 * (C + C.T)

    sigma = state.sigma * jnp.exp((cs / params.damps) * (ps_norm / chi_n - 1.0))
    # Guard against overflow/degeneracy inside long scans.
    sigma = jnp.clip(sigma, 1e-12, 1e12)

    # Refresh the eigendecomposition (n <= 512 here: cheap relative to the
    # generator forward passes, and keeping it per-tell avoids stale-basis
    # drift without PyCMA's lazy-update bookkeeping). Pass
    # ``refresh_eigen=False`` for PyCMA-style lazy updates — the stale (B, D)
    # are kept and the caller refreshes periodically via
    # :func:`refresh_eigen` (useful when the tell sits inside a lax.scan,
    # where eigh lowers poorly on TPU).
    if refresh_eigen:
        eigvals, B = jnp.linalg.eigh(C)
        D = jnp.sqrt(jnp.maximum(eigvals, 1e-20))
    else:
        B, D = state.B, state.D

    return CMAState(mean=new_mean, sigma=sigma, C=C, B=B, D=D,
                    p_sigma=p_sigma, p_c=p_c, gen=state.gen + 1)


def refresh_eigen(state: CMAState) -> CMAState:
    """Recompute the cached eigendecomposition of C (lazy-update partner of
    ``tell(..., refresh_eigen=False)``)."""
    eigvals, B = jnp.linalg.eigh(state.C)
    return state._replace(B=B, D=jnp.sqrt(jnp.maximum(eigvals, 1e-20)))


class CMA:
    """Stateful convenience wrapper mirroring the reference's ``CMA`` class
    (``base_cma_optimizer.py:145-215``: ``batch_size`` / ``ask`` / ``tell`` /
    ``mean``), minus its duplicate-dimension hack — n=1 is supported natively.
    Jitted ask/tell keep all state on device between calls.
    """

    def __init__(self, mu=None, sigma: float = 1.0, seed: Optional[int] = None,
                 popsize: Optional[int] = None, active: bool = False):
        if mu is None:
            mu = np.zeros(128, dtype=np.float32)
        self.params, self.state = init(mu, sigma, popsize, active=active)
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        # params is fixed per instance: capture it as a compile-time constant
        # (CMAParams holds an array, so it can't be a static argnum).
        params = self.params
        self._ask = jax.jit(lambda s, k: ask(params, s, k))
        self._tell = jax.jit(lambda s, x, f: tell(params, s, x, f))

    def batch_size(self) -> int:
        return self.params.popsize

    def ask(self, batch_size=None) -> jax.Array:
        assert batch_size is None or batch_size == self.params.popsize, \
            "popsize is fixed at init; pass popsize= to the constructor"
        self._key, sub = jax.random.split(self._key)
        self._x = self._ask(self.state, sub)
        return self._x

    def tell(self, x, y):
        self.state = self._tell(self.state,
                                jnp.asarray(x, jnp.float32),
                                jnp.asarray(y, jnp.float32))

    def mean(self):
        return self.state.mean
