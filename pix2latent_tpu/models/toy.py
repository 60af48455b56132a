"""Tiny deterministic generators for tests and smoke benchmarks.

The reference had no test models (no tests at all, SURVEY.md §4); these stand
in for BigGAN/StyleGAN2 in unit/integration tests so the optimizer stack can
be validated end-to-end on CPU in seconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pix2latent_tpu.models.base import FlaxModel


class ToyGenerator(nn.Module):
    """z [pop, z_dim] (+ optional c) -> NHWC image [pop, res, res, 3] in [-1,1].

    A 2-layer deconv stack: linear to 4x4 grid, two nearest-upsample + conv
    stages, tanh head. Deterministic params via seed.
    """
    z_dim: int = 16
    c_dim: int = 0
    res: int = 16
    width: int = 32

    @nn.compact
    def __call__(self, z, c=None):
        h = z if c is None else jnp.concatenate([z, c], axis=-1)
        x = nn.Dense(4 * 4 * self.width)(h)
        x = x.reshape(-1, 4, 4, self.width)
        size = 4
        while size < self.res:
            size *= 2
            n, hh, ww, ch = x.shape
            # broadcast+reshape 2x nearest upsample (same as the BigGAN
            # blocks: the jax.image.resize gather lowers to serial row
            # loops on TPU — models/biggan.py::_upsample2x)
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (n, hh, 2, ww, 2, ch)
                                 ).reshape(n, 2 * hh, 2 * ww, ch)
            x = nn.Conv(self.width, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
        x = nn.Conv(3, (3, 3), padding="SAME")(x)
        return jnp.tanh(x)


def make_toy_model(z_dim=16, c_dim=0, res=16, width=32, seed=0):
    """Construct a frozen ToyGenerator FlaxModel with deterministic params."""
    mod = ToyGenerator(z_dim=z_dim, c_dim=c_dim, res=res, width=width)
    z = jnp.zeros((1, z_dim), jnp.float32)
    c = jnp.zeros((1, c_dim), jnp.float32) if c_dim else None
    if c is None:
        params = mod.init(jax.random.PRNGKey(seed), z)["params"]
    else:
        params = mod.init(jax.random.PRNGKey(seed), z, c)["params"]
    return FlaxModel(mod, params)
