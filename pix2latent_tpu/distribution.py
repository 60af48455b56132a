"""Latent initialization distributions.

TPU-native counterpart of the reference's ``pix2latent/distribution.py:5-78``.
All samplers are pure functions of an explicit ``jax.random`` key so they can
be used inside ``jit``/``scan`` (the reference sampled on the host with the
global torch RNG).

Note: the reference's ``TruncatedNormalModulo.__init__`` ignored its
``sigma``/``trunc`` arguments (``distribution.py:27-28``) and
``truncated_clamp_normal`` referenced undefined names (``distribution.py:57``).
We implement the documented *intent*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Distribution:
    """Base class: callable ``(key, num_samples, shape) -> f32[num_samples, *shape]``."""

    def __call__(self, key, num_samples, shape):
        raise NotImplementedError


class TruncatedNormalModulo(Distribution):
    """Normal samples folded into ``(-trunc, trunc)`` by float modulo.

    ``x = fmod(sigma * N(0, I) + mu, trunc)`` — matches the reference's
    documented behavior (``distribution.py:5-34``) with the ctor args honored.
    ``mu`` may be a scalar or an array broadcastable to ``shape``.
    """

    def __init__(self, mu=0.0, sigma=1.0, trunc=2.0):
        self.mu = mu
        self.sigma = float(sigma)
        self.trunc = float(trunc)

    def __call__(self, key, num_samples, shape):
        x = self.sigma * jax.random.normal(key, (num_samples, *shape))
        mu = jnp.asarray(self.mu, dtype=x.dtype)
        return jnp.fmod(x + mu, self.trunc)

    def __repr__(self):
        return (f"TruncatedNormalModulo(mu={self.mu}, sigma={self.sigma}, "
                f"trunc={self.trunc})")


class TruncatedClampNormal(Distribution):
    """Normal samples hard-clamped to ``[-trunc, trunc]``.

    Working version of the reference's broken ``truncated_clamp_normal``
    (``distribution.py:39-58``).
    """

    def __init__(self, sigma=1.0, trunc=2.0):
        self.sigma = float(sigma)
        self.trunc = float(trunc)

    def __call__(self, key, num_samples, shape):
        x = self.sigma * jax.random.normal(key, (num_samples, *shape))
        return jnp.clip(x, -self.trunc, self.trunc)

    def __repr__(self):
        return f"TruncatedClampNormal(sigma={self.sigma}, trunc={self.trunc})"


class Normal(Distribution):
    """``mu + sigma * N(0, I)`` (reference ``distribution.py:62-78``; ``mu``
    may be a scalar or an array broadcastable to ``shape`` — e.g. a mean
    latent for w-space search)."""

    def __init__(self, sigma=1.0, mu=0.0):
        self.sigma = float(sigma)
        self.mu = mu if hasattr(mu, "shape") else float(mu)

    def __call__(self, key, num_samples, shape):
        return (jnp.asarray(self.mu)
                + self.sigma * jax.random.normal(key, (num_samples, *shape)))

    def __repr__(self):
        mu = "array" if hasattr(self.mu, "shape") else self.mu
        return f"Normal(sigma={self.sigma}, mu={mu})"


class Uniform(Distribution):
    """Uniform samples in ``[low, high)`` (new; handy for transform params)."""

    def __init__(self, low=-1.0, high=1.0):
        self.low = float(low)
        self.high = float(high)

    def __call__(self, key, num_samples, shape):
        return jax.random.uniform(
            key, (num_samples, *shape), minval=self.low, maxval=self.high)

    def __repr__(self):
        return f"Uniform(low={self.low}, high={self.high})"


# Lowercase factory aliases mirroring the reference's function-style API.
def truncated_clamp_normal(sigma=1.0, trunc=2.0):
    return TruncatedClampNormal(sigma=sigma, trunc=trunc)


def normal(sigma=1.0):
    return Normal(sigma=sigma)
