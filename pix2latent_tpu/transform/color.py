"""Differentiable color transforms.

Counterpart of the reference's ``pix2latent/transform/color_transform.py``.
The reference's color ops were NOT differentiable — each apply round-tripped
through PIL on the CPU (``color_transform.py:42-60``), so they could only be
searched by CMA/NG. Here every op is an expressible jnp function (matching
torchvision's ``adjust_*`` semantics), which makes them (a) fused into the
on-device loop and (b) *differentiable*, so they can also be refined by the
inner Adam loop — a strict capability upgrade noted in SURVEY.md §7.

Convention: images NHWC in [-1, 1]; parameter ``t`` is [N, 1]. Inversion uses
the reference's parameter-inverse convention (negate for hue, reciprocal for
the rest) and the same clamp ranges.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.transform.base import TransformTemplate


def _to01(ims):
    return (ims + 1.0) * 0.5


def _from01(ims):
    return jnp.clip(ims, 0.0, 1.0) * 2.0 - 1.0


def _gray(ims01):
    """ITU-R 601-2 luma (PIL 'L' / torchvision rgb_to_grayscale)."""
    w = jnp.asarray([0.299, 0.587, 0.114], ims01.dtype)
    return jnp.sum(ims01 * w, axis=-1, keepdims=True)


def rgb_to_hsv(rgb):
    """Vectorized RGB->HSV on [0,1] arrays; h, s, v each in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    rng_safe = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / rng_safe
    gc = (maxc - g) / rng_safe
    bc = (maxc - b) / rng_safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


class ColorTransform(TransformTemplate):
    """Base color transform: per-sample scalar parameter, range-clamped,
    invertible via ``t_inv_fn`` (reference ``color_transform.py:12-66``)."""

    def __init__(self, fn, t=(1.0,), t_range=(0.667, 1.5), t_inv_fn=None,
                 optimize=True):
        assert t_range[1] > t_range[0], "t_range should be increasing"
        self.fn = fn
        self.t = np.asarray(t, np.float32)
        self.t_inv_fn = t_inv_fn
        self.t_min, self.t_max = float(t_range[0]), float(t_range[1])
        self.is_spatial = False
        self.optimize = optimize

    def get_opt_param(self):
        return self.t if self.optimize else np.zeros((0,), np.float32)

    def get_default_param(self, as_tensor=True):
        return jnp.asarray(self.t) if as_tensor else self.t

    def get_identity_param(self, as_tensor=True):
        return self.get_default_param(as_tensor)

    def apply(self, ims, t, invert=False):
        assert ims.shape[0] == t.shape[0]
        if invert:
            t = self.t_inv_fn(t)
        t = jnp.clip(t, self.t_min, self.t_max)
        t = t.reshape(-1, 1, 1, 1)
        out01 = self.fn(_to01(ims), t)
        return _from01(out01)

    def __call__(self, ims, t, invert=False):
        return self.apply(ims, t, invert)

    def transform(self, ims, t):
        return self.apply(ims, t, invert=False)

    def invert_transform(self, ims, t):
        return self.apply(ims, t, invert=True)

    def __str__(self):
        return f"{type(self).__name__}: t={self.t.tolist()}"


def _negate(x):
    return -x


def _invert(x):
    return 1.0 / x


def _adj_hue(ims01, t):
    hsv = rgb_to_hsv(ims01)
    h = (hsv[..., 0:1] + t[..., 0:1]) % 1.0
    return hsv_to_rgb(jnp.concatenate([h, hsv[..., 1:]], axis=-1))


def _adj_brightness(ims01, t):
    return ims01 * t


def _adj_gamma(ims01, t):
    return jnp.maximum(ims01, 1e-8) ** t


def _adj_saturation(ims01, t):
    return t * ims01 + (1.0 - t) * _gray(ims01)


def _adj_contrast(ims01, t):
    mean = jnp.mean(_gray(ims01), axis=(1, 2, 3), keepdims=True)
    return t * ims01 + (1.0 - t) * mean


class HueTransform(ColorTransform):
    def __init__(self, t=(0.0,), t_min=-0.5, t_max=0.5):
        super().__init__(fn=_adj_hue, t=t,
                         t_range=(t_min + 1e-6, t_max - 1e-6),
                         t_inv_fn=_negate)


class BrightnessTransform(ColorTransform):
    def __init__(self, t=(1.0,), t_min=0.667, t_max=1.5):
        super().__init__(fn=_adj_brightness, t=t, t_range=(t_min, t_max),
                         t_inv_fn=_invert)


class GammaTransform(ColorTransform):
    def __init__(self, t=(1.0,), t_min=0.667, t_max=1.5):
        super().__init__(fn=_adj_gamma, t=t, t_range=(t_min, t_max),
                         t_inv_fn=_invert)


class SaturationTransform(ColorTransform):
    def __init__(self, t=(1.0,), t_min=0.667, t_max=1.5):
        super().__init__(fn=_adj_saturation, t=t, t_range=(t_min, t_max),
                         t_inv_fn=_invert)


class ContrastTransform(ColorTransform):
    def __init__(self, t=(1.0,), t_min=0.667, t_max=1.5):
        super().__init__(fn=_adj_contrast, t=t, t_range=(t_min, t_max),
                         t_inv_fn=_invert)
