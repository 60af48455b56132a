"""Weighted composition of transforms over a concatenated parameter vector.

Counterpart of the reference's ``ComposeTransform``
(``pix2latent/transform/transform_utils.py:122-184``): each sub-transform
owns a slice of the t-vector; per-transform weights rescale the searched
delta around the default (``reweight``), since parameters live at different
scales.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.transform.base import TransformTemplate


class ComposeTransform(TransformTemplate):

    def __init__(self, transform_list):
        """``transform_list``: list of transforms or (transform, weight)
        tuples; missing weights default to 1."""
        assert isinstance(transform_list, list)
        self.transform_list = []
        for t_fn in transform_list:
            if isinstance(t_fn, (tuple, list)):
                self.transform_list.append(list(t_fn))
            else:
                self.transform_list.append([t_fn, 1.0])
        self._t = [np.asarray(fn.t, np.float32)
                   for fn, _ in self.transform_list]
        self.is_spatial = any(fn.is_spatial for fn, _ in self.transform_list)

    def get_param(self, as_tensor=False):
        """Default parameters, per sub-transform (or concatenated array)."""
        if as_tensor:
            return jnp.asarray(np.concatenate(self._t))
        return [t.copy() for t in self._t]

    def get_default_param(self, as_tensor=True):
        return self.get_param(as_tensor=True) if as_tensor \
            else np.concatenate(self._t)

    def get_identity_param(self, as_tensor=True):
        ident = np.concatenate(
            [np.asarray(fn.get_identity_param(as_tensor=False), np.float32)
             for fn, _ in self.transform_list])
        return jnp.asarray(ident) if as_tensor else ident

    def get_opt_param(self):
        """Concatenated optimizable parameters (``transform_utils.py:152-155``)."""
        parts = [np.atleast_1d(np.asarray(fn.get_opt_param(), np.float32))
                 for fn, _ in self.transform_list]
        return np.concatenate([p for p in parts if p.size])

    def get_search_identity(self, as_tensor=False):
        """Searched-vector value at which EVERY sub-transform applies the
        identity — the correct CMA seed mean for a composed search
        (``grad_free=(compose.get_search_identity(), sigma)``).

        Spatial transforms search a DELTA (``t_eff = default +
        sensitivity*Δt``, identity/pre-alignment at Δt = 0); color
        transforms search around their default (``reweight`` is the
        identity at ``t = t_mu``). A zero seed — fine for spatial-only
        searches, and what the reference used (``invert_biggan_with_
        transform.py:118``, grad_free=True) — drives weighted color slices
        to their clipped extremes (brightness: ``5*(0-1)+1 = -4`` clips to
        0.667, a dark start)."""
        parts = []
        for i, (fn, _) in enumerate(self.transform_list):
            if fn.is_spatial:
                parts.append(np.zeros_like(self._t[i]))
            else:
                parts.append(self._t[i].copy())
        ident = np.concatenate(parts).astype(np.float32)
        return jnp.asarray(ident) if as_tensor else ident

    @staticmethod
    def reweight(t, weight, t_mean):
        """Scale the searched delta around the default
        (``transform_utils.py:157-159``)."""
        return weight * (t - t_mean) + t_mean

    def __call__(self, ims, t, invert=False, only_spatial=False):
        """Apply all (or only spatial) sub-transforms in registration order
        (``transform_utils.py:161-184``)."""
        if t.shape[0] == 1 and ims.shape[0] != 1:
            t = jnp.broadcast_to(t, (ims.shape[0], t.shape[1]))

        t_i = 0
        for i, (fn, fn_weight) in enumerate(self.transform_list):
            t_sz = len(fn.t)
            if (only_spatial and fn.is_spatial) or not only_spatial:
                t_param = t[:, t_i:t_i + t_sz]
                t_mu = jnp.asarray(self._t[i], t_param.dtype)
                t_param = self.reweight(t_param, fn_weight, t_mu)
                ims = fn(ims, t_param, invert=invert)
            t_i += t_sz
        return ims

    def transform(self, ims, t):
        return self(ims, t, invert=False)

    def invert_transform(self, ims, t):
        return self(ims, t, invert=True)

    def __str__(self):
        inner = "\n\t".join(str(f[0]) for f in self.transform_list)
        return f"<ComposeTransform\n\t{inner}\n>"


class SpatialOnly(TransformTemplate):
    """Restrict a ComposeTransform to its spatial sub-transforms.

    Register THIS as the weight's transform in a composed spatial+color
    search: color ops are defined on [-1, 1] images and corrupt a 0/1 mask
    (brightness maps mask-zeros to ``t - 1``, i.e. a negative loss weight
    for t < 1), while the spatial warp is exactly what must travel with the
    target. The parameter vector stays the FULL composed t, so the same
    registered variable drives both transforms."""

    def __init__(self, compose: ComposeTransform):
        self.compose = compose
        self.is_spatial = True

    def __call__(self, ims, t, invert=False):
        return self.compose(ims, t, invert=invert, only_spatial=True)

    def get_default_param(self, as_tensor=True):
        return self.compose.get_default_param(as_tensor)

    def get_identity_param(self, as_tensor=True):
        return self.compose.get_identity_param(as_tensor)

    def transform(self, ims, t):
        return self.compose(ims, t, invert=False, only_spatial=True)

    def invert_transform(self, ims, t):
        return self.compose(ims, t, invert=True, only_spatial=True)
