"""Per-step variable constraint hooks.

TPU-native counterpart of the reference's ``pix2latent/utils/function_hooks.py``.
The reference hooks mutate torch tensors in-place inside the optimization
closure (``optimizer/closure.py:42-44``); here every hook is a *pure* function

    ``hook(key, x, step) -> x_new``

applied to the ``[pop, *shape]`` variable array inside the jitted/scanned
step, so the whole inner loop stays on device. ``step`` is a traced int32 so
step-dependent schedules (``ScheduledNormalPerturb``) work inside ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Hook:
    def __call__(self, key, x, step=0):
        raise NotImplementedError


class Clamp(Hook):
    """Clamp the variable to ``[-trunc, trunc]`` (reference ``function_hooks.py:10-27``)."""

    def __init__(self, trunc):
        self.trunc = float(trunc)

    def __call__(self, key, x, step=0):
        return jnp.clip(x, -self.trunc, self.trunc)

    def __repr__(self):
        return f"Clamp(trunc={self.trunc})"


class Normalize(Hook):
    """Per-sample z-score renormalization to ``N(mu, std)``.

    StyleGAN2-style latent normalization (reference ``function_hooks.py:31-51``;
    the reference stored ``mu``/``std`` but always normalized to N(0,1) — we
    honor the stored targets, which is equivalent at the defaults).
    Statistics are computed per population sample over all its elements.
    """

    def __init__(self, mu=0.0, std=1.0):
        self.mu = float(mu)
        self.std = float(std)

    def __call__(self, key, x, step=0):
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        # torch .std() uses the unbiased (ddof=1) estimator.
        std = jnp.std(x, axis=axes, keepdims=True, ddof=1)
        return (x - mean) / (std + 1e-12) * self.std + self.mu

    def __repr__(self):
        return f"Normalize(mu={self.mu}, std={self.std})"


class NormalPerturb(Hook):
    """Add ``sigma * N(0, I)`` noise (reference ``function_hooks.py:55-69``)."""

    def __init__(self, sigma=0.1):
        self.sigma = float(sigma)

    def __call__(self, key, x, step=0):
        return x + self.sigma * jax.random.normal(key, x.shape, x.dtype)

    def __repr__(self):
        return f"NormalPerturb(sigma={self.sigma})"


class ScheduledNormalPerturb(Hook):
    """Noise perturbation decayed to zero over ``max_step`` steps.

    ``strength = (sigma * max(0, 1 - step/(max_step-1))) ** pow`` — the
    simplified StyleGAN2 noise ramp (reference ``function_hooks.py:73-102``;
    that version forgot to import ``math`` and ignored ``pow`` — intent kept).
    """

    def __init__(self, sigma=0.1, max_step=500, pow=2):
        self.sigma = float(sigma)
        self.max_step = int(max_step)
        self.pow = float(pow)

    def __call__(self, key, x, step=0):
        p = jnp.asarray(step, jnp.float32) / max(float(self.max_step) - 1.0, 1.0)
        strength = (self.sigma * jnp.maximum(0.0, 1.0 - p)) ** self.pow
        return x + strength * jax.random.normal(key, x.shape, x.dtype)

    def __repr__(self):
        return (f"ScheduledNormalPerturb(sigma={self.sigma}, "
                f"max_step={self.max_step}, pow={self.pow})")


class Compose(Hook):
    """Apply hooks sequentially (reference ``function_hooks.py:106-126``)."""

    def __init__(self, *hook_fns):
        # Accept both Compose(a, b) and Compose([a, b]).
        if len(hook_fns) == 1 and isinstance(hook_fns[0], (list, tuple)):
            hook_fns = tuple(hook_fns[0])
        self.hook_fns = hook_fns

    def __call__(self, key, x, step=0):
        keys = jax.random.split(key, max(len(self.hook_fns), 1))
        for fn, k in zip(self.hook_fns, keys):
            x = fn(k, x, step)
        return x

    def __repr__(self):
        return f"Compose({', '.join(repr(f) for f in self.hook_fns)})"
