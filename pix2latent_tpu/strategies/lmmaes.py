"""LM-MA-ES: limited-memory matrix adaptation ES for high-dimensional search.

The low-rank covariance strategy the w+ search needs (VERDICT.md round 2,
item 2): full-covariance CMA is O(d^2) + eigh — at d ~ 10k (StyleGAN2 w+,
``/root/reference/pix2latent/model/stylegan2.py:99-138``) the eigh is both
expensive and the exact code path that reproducibly faults the axon TPU
runtime (CLAUDE.md), while ``DiagonalCMA`` throws away all cross-coordinate
covariance structure. LM-MA-ES (Loshchilov, Glasmachers & Beyer, "Large
Scale Black-box Optimization by Limited-Memory Matrix Adaptation",
IEEE TEC 2019; arXiv:1705.06693) models the transformation matrix M as an
implicit product of ``m`` rank-1 factors parameterized by evolution paths
``M_j`` at geometrically-spaced timescales:

    d = (prod_j [(1 - c_d,j) I + c_d,j M_j M_j^T]) z,   x = mean + sigma d

so ask/tell are O(m * d) with NO d x d matrix and NO eigendecomposition —
every operation is a small matmul (MXU-friendly) or an axpy. The paths and
CSA both live in the isotropic z-space (the M-A-ES family's replacement for
CMA's C^{-1/2} whitening).

Constants follow the paper: ``m = 4 + floor(3 ln d)``,
``c_d,j = 1 / (1.5^j d)``, ``c_c,j = lambda / (4^j d)`` (j = 0..m-1),
``c_sigma = 2 lambda / d`` — with the small-d clips documented inline
(the paper targets d >> lambda; the clips keep toy-dimension tests sane and
are no-ops in the intended regime). Factor j is only applied once it has
received j updates (the paper's ``min(t, m)`` guard), so early generations
sample from the identity transform instead of a zero-path shrink.

Cross-validated trajectory-for-trajectory against an independent float64
numpy transcription in ``tests/test_lmmaes_parity.py`` (the same treatment
``strategies/cma.py`` gets from ``tests/test_cma_parity.py``).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def default_memory(dim: int) -> int:
    """Paper default: ``4 + floor(3 ln d)`` stored paths."""
    return 4 + int(math.floor(3.0 * math.log(max(dim, 2))))


class LMMAESParams(NamedTuple):
    """Static (trace-time constant) parameters for dimension d, popsize λ."""
    dim: int
    popsize: int
    memory: int
    weights: jax.Array     # [mu] positive recombination weights
    mueff: float
    c_sigma: float
    d_sigma: float
    c_d: jax.Array         # [m] per-factor application rates
    c_c: jax.Array         # [m] per-factor path learning rates
    chi_d: float


class LMMAESState(NamedTuple):
    mean: jax.Array        # [d]
    sigma: jax.Array       # scalar
    p_sigma: jax.Array     # [d] CSA path (z-space)
    paths: jax.Array       # [m, d] rank-1 factor paths (z-space)
    gen: jax.Array         # scalar int


def make_params(dim: int, popsize=None, memory=None) -> LMMAESParams:
    """Paper constants with small-d clips (no-ops for d >> lambda)."""
    if popsize is None:
        popsize = default_memory(dim)  # same 4+3ln(d) formula as CMA's λ
    popsize = int(popsize)
    assert popsize >= 2, "LM-MA-ES needs popsize >= 2"
    if memory is None:
        memory = default_memory(dim)
    memory = int(memory)
    mu = popsize // 2

    w_raw = np.log((popsize + 1) / 2.0) - np.log(np.arange(1, mu + 1))
    w = w_raw / w_raw.sum()
    mueff = float(1.0 / np.sum(w ** 2))

    d = float(max(dim, 1))
    # c_sigma = 2λ/d (paper); clipped — at toy dimensions 2λ/d > 1 would
    # make the CSA update extrapolate instead of average
    c_sigma = min(2.0 * popsize / d, 0.5)
    d_sigma = (1.0 + 2.0 * max(0.0, math.sqrt((mueff - 1.0) / (d + 1.0))
                               - 1.0) + c_sigma)
    j = np.arange(memory, dtype=np.float64)
    c_d = np.minimum(1.0 / (1.5 ** j * d), 0.5)
    c_c = np.minimum(popsize / (4.0 ** j * d), 0.5)
    chi_d = math.sqrt(d) * (1.0 - 1.0 / (4.0 * d) + 1.0 / (21.0 * d * d))

    return LMMAESParams(dim=int(dim), popsize=popsize, memory=memory,
                        weights=jnp.asarray(w, jnp.float32),
                        mueff=mueff, c_sigma=c_sigma, d_sigma=d_sigma,
                        c_d=jnp.asarray(c_d, jnp.float32),
                        c_c=jnp.asarray(c_c, jnp.float32), chi_d=chi_d)


def init(mean, sigma: float = 1.0, popsize=None, memory=None):
    """Build (params, state) centered at ``mean`` with step ``sigma``."""
    assert float(sigma) > 0.0, f"sigma must be positive, got {sigma}"
    mean = jnp.asarray(mean, jnp.float32).reshape(-1)
    dim = mean.shape[0]
    params = make_params(dim, popsize, memory)
    state = LMMAESState(
        mean=mean,
        sigma=jnp.asarray(float(sigma), jnp.float32),
        p_sigma=jnp.zeros((dim,), jnp.float32),
        paths=jnp.zeros((params.memory, dim), jnp.float32),
        gen=jnp.zeros((), jnp.int32),
    )
    return params, state


def _transform(params: LMMAESParams, state: LMMAESState,
               z: jax.Array) -> jax.Array:
    """Apply the implicit matrix: d = prod_j [(1-c_d,j) I + c_d,j M_j M_j^T] z.

    Factor j=0 (fastest timescale) applies FIRST — the M-A-ES convention of
    right-multiplying new information onto M. Factor j is inert until it has
    been updated (gen > j), so early generations sample isotropically
    instead of being shrunk by zero paths. A scan over the m stored paths:
    each step is one [λ,d]x[d] matvec + rank-1 axpy.
    """
    dt = z.dtype

    def body(d_vecs, xs):
        path, cd, idx = xs
        dot = d_vecs @ path                                   # [λ]
        new = (1.0 - cd) * d_vecs + cd * dot[:, None] * path[None, :]
        active = idx < state.gen
        return jnp.where(active, new, d_vecs), None

    xs = (state.paths.astype(dt), params.c_d.astype(dt),
          jnp.arange(params.memory))
    d_vecs, _ = jax.lax.scan(body, z, xs)
    return d_vecs


def _inverse_transform(params: LMMAESParams, state: LMMAESState,
                       d_vecs: jax.Array) -> jax.Array:
    """Exact inverse of :func:`_transform` (Sherman-Morrison per factor,
    applied newest-last -> reversed order). Only needed when ``tell`` is
    given externally-produced candidates without the ask's aux."""
    dt = d_vecs.dtype

    def body(z, xs):
        path, cd, idx = xs
        # ((1-c) I + c p p^T)^{-1} u = (u - c p (p^T u)/((1-c)+c|p|^2))/(1-c)
        denom = (1.0 - cd) + cd * jnp.sum(path * path)
        dot = z @ path                                        # [λ]
        new = (z - (cd / denom) * dot[:, None] * path[None, :]) / (1.0 - cd)
        active = idx < state.gen
        return jnp.where(active, new, z), None

    xs = (state.paths[::-1].astype(dt), params.c_d[::-1].astype(dt),
          jnp.arange(params.memory)[::-1])
    z, _ = jax.lax.scan(body, d_vecs, xs)
    return z


def ask_with_aux(params: LMMAESParams, state: LMMAESState, key):
    """Sample λ candidates; aux carries (z, d) for a reconstruction-free
    tell. Returns (x [λ, d], aux)."""
    z = jax.random.normal(key, (params.popsize, params.dim),
                          state.mean.dtype)
    d_vecs = _transform(params, state, z)
    x = state.mean[None, :] + state.sigma * d_vecs
    return x, {"z": z, "d": d_vecs}


def ask(params: LMMAESParams, state: LMMAESState, key) -> jax.Array:
    return ask_with_aux(params, state, key)[0]


def tell(params: LMMAESParams, state: LMMAESState, x: jax.Array,
         fitness: jax.Array, aux=None) -> LMMAESState:
    """Rank by fitness (lower better) and update mean/paths/sigma.

    All adaptation happens in the isotropic z-space (the M-A-ES family's
    replacement for CMA's C^{-1/2} whitening): the CSA path and every
    rank-1 factor path accumulate the weighted recombination of the top-mu
    RAW normals z, while the mean moves along the transformed directions d.
    """
    dt = state.mean.dtype
    if aux is None:
        d_vecs = (x - state.mean[None, :]) / state.sigma
        z = _inverse_transform(params, state, d_vecs)
    else:
        z, d_vecs = aux["z"], aux["d"]

    mu = params.weights.shape[0]
    order = jnp.argsort(fitness)[:mu]
    w = params.weights.astype(dt)
    zw = w @ z[order]                                         # [d]
    dw = w @ d_vecs[order]                                    # [d]

    mean = state.mean + state.sigma * dw
    cs, mueff = params.c_sigma, params.mueff
    p_sigma = ((1.0 - cs) * state.p_sigma
               + jnp.sqrt(jnp.asarray(cs * (2.0 - cs) * mueff, dt)) * zw)
    cc = params.c_c.astype(dt)[:, None]                       # [m, 1]
    paths = ((1.0 - cc) * state.paths
             + jnp.sqrt(cc * (2.0 - cc) * mueff) * zw[None, :])
    sigma = state.sigma * jnp.exp(
        (cs / params.d_sigma)
        * (jnp.linalg.norm(p_sigma) / params.chi_d - 1.0))
    sigma = jnp.clip(sigma, 1e-12, 1e12)
    return LMMAESState(mean=mean, sigma=sigma, p_sigma=p_sigma,
                       paths=paths, gen=state.gen + 1)
