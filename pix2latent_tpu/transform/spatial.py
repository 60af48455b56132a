"""Differentiable affine alignment transform.

Counterpart of the reference's ``SpatialTransform``
(``pix2latent/transform/spatial_transform.py:11-108``): scale + translation
(aspect fixed, no shear), parameter ``t = [s, tx, ty]`` with identity
``[1, 0, 0]``; the searched value is ``t = default_t + sensitivity * Δt``.
The warp is the TPU-native ``affine_grid``/``grid_sample`` pair in
``pix2latent_tpu.ops`` and is differentiable end-to-end (gradients reach the
transform parameter through the sampling coordinates).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.ops.affine_matmul import (affine_warp_matmul_t,
                                              inverse_affine_warp_matmul_t)
from pix2latent_tpu.ops.grid_sample import affine_grid, grid_sample
from pix2latent_tpu.transform.base import TransformTemplate
from pix2latent_tpu.transform.utils import compute_pre_alignment


class SpatialTransform(TransformTemplate):

    def __init__(self, t=(1.0, 0.0, 0.0), identity_t=(1.0, 0.0, 0.0),
                 pre_align=None, sensitivity=0.1, use_matmul_warp=True):
        """Args match the reference (``spatial_transform.py:19-47``):

        t: default transformation parameter (the search center).
        identity_t: parameter at which the warp is the identity.
        pre_align: optional mask image — computes the initial alignment
            against the BigGAN object prior.
        sensitivity: scales the searched delta: ``t_eff = t + sensitivity*Δt``.
        use_matmul_warp: run the warp as two MXU matmuls
            (``ops.affine_matmul`` — no gathers; possible because this
            transform is axis-aligned) instead of the general gather-based
            grid_sample. Both match torch semantics; matmul is the TPU fast
            path.
        """
        self.identity_t = np.asarray(identity_t, np.float32)
        self.is_spatial = True
        self.sensitivity = float(sensitivity)
        self.use_matmul_warp = bool(use_matmul_warp)

        self.t = np.asarray(t, np.float32)
        if pre_align is not None:
            self.t = np.asarray(compute_pre_alignment(pre_align), np.float32)
        self._t = jnp.asarray(self.t)

    def __call__(self, ims, delta_t, invert=False):
        t = self._t[None].astype(ims.dtype) + self.sensitivity * delta_t
        if invert:
            return self.invert_transform(ims, t)
        return self.transform(ims, t)

    def get_default_param(self, as_tensor=True):
        return self._t if as_tensor else self.t

    def get_identity_param(self, as_tensor=True):
        return jnp.asarray(self.identity_t) if as_tensor else self.identity_t

    def get_opt_param(self):
        return self.t

    @staticmethod
    def _theta(scale, trans):
        """Build [N,2,3] affine matrices [[s,0,tx],[0,s,ty]]."""
        n = scale.shape[0]
        zeros = jnp.zeros_like(scale)
        row0 = jnp.stack([scale, zeros, trans[:, 0]], axis=-1)
        row1 = jnp.stack([zeros, scale, trans[:, 1]], axis=-1)
        return jnp.stack([row0, row1], axis=1)

    def transform(self, ims, t):
        """Warp ims by t=[s,tx,ty] (reference ``spatial_transform.py:69-84``).

        ims: [N, H, W, C]; t: [N, 3].
        """
        if self.use_matmul_warp:
            return affine_warp_matmul_t(ims, t)
        theta = self._theta(t[:, 0], t[:, 1:])
        return grid_sample(ims, affine_grid(theta, ims.shape[1:3]))

    def invert_transform(self, ims, t):
        """Exact inverse warp (reference ``spatial_transform.py:87-104``):

        >>> t_ims = transform(ims, t)
        >>> ims_hat = invert_transform(t_ims, t)   # ims_hat ≈ ims
        """
        if self.use_matmul_warp:
            return inverse_affine_warp_matmul_t(ims, t)
        inv_s = 1.0 / t[:, 0]
        inv_trans = -(t[:, 1:] / t[:, :1])
        theta = self._theta(inv_s, inv_trans)
        return grid_sample(ims, affine_grid(theta, ims.shape[1:3]))

    def __str__(self):
        return f"SpatialTransform: t={self.t.tolist()}"
