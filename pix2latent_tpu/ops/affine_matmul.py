"""Axis-aligned affine warp as two MXU matmuls.

The reference's SpatialTransform is scale + translation only — no rotation or
shear (``pix2latent/transform/spatial_transform.py:11-17``). For such warps
the bilinear resample is *separable*: every output row reads from a fixed
pair of source rows and every output column from a fixed pair of source
columns, so the whole warp is

    out[n] = R_y(t_n)^T @ im[n] @ R_x(t_n)

with dense interpolation matrices R built elementwise from the transform
parameter (``relu(1 - |px_j - i|)`` is exactly the bilinear weight, and goes
to zero outside the footprint, reproducing zero padding). Two matmuls per
sample run on the MXU with no gathers at all — the TPU-first replacement for
``F.grid_sample`` on this workload, and still differentiable w.r.t. ``t``
(the weights are piecewise-linear in the coordinates).

Matches ``ops.grid_sample`` (and torch ``grid_sample`` with
``align_corners=False``, zero padding) to float tolerance; parity-tested.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(in_size, out_size, scale, trans):
    """Bilinear interpolation matrix ``[in_size, out_size]`` for one axis.

    Output pixel j samples normalized coordinate ``g = c_j * scale + trans``
    (torch affine_grid convention, align_corners=False), i.e. source pixel
    ``px = ((g + 1) * in_size - 1) / 2``. Weight against source pixel i is
    ``max(0, 1 - |px - i|)`` — bilinear with zero padding.
    """
    coords = (2.0 * jnp.arange(out_size, dtype=jnp.float32) + 1.0) \
        / out_size - 1.0
    g = coords * scale + trans
    px = ((g + 1.0) * in_size - 1.0) * 0.5              # [out]
    idx = jnp.arange(in_size, dtype=jnp.float32)        # [in]
    return jnp.maximum(0.0, 1.0 - jnp.abs(px[None, :] - idx[:, None]))


def affine_warp_matmul(im, scale, trans_x, trans_y):
    """Warp ``im [N,H,W,C]`` by per-sample ``[s, tx, ty]``.

    Equivalent to ``grid_sample(im, affine_grid(theta))`` with
    ``theta = [[s,0,tx],[0,s,ty]]``.
    """
    n, h, w, c = im.shape
    scale = scale.astype(jnp.float32)

    wy = jax.vmap(lambda s, t: _axis_weights(h, h, s, t))(scale, trans_y)
    wx = jax.vmap(lambda s, t: _axis_weights(w, w, s, t))(scale, trans_x)

    # out[n, H, W, c] = sum_{h,w} wy[n,h,H] * im[n,h,w,c] * wx[n,w,W]
    tmp = jnp.einsum("nhwc,nhH->nHwc", im, wy,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("nHwc,nwW->nHWc", tmp, wx,
                      preferred_element_type=jnp.float32)


def affine_warp_matmul_t(im, t):
    """Convenience: ``t [N, 3] = [s, tx, ty]`` (SpatialTransform layout)."""
    return affine_warp_matmul(im, t[:, 0], t[:, 1], t[:, 2])


def inverse_affine_warp_matmul_t(im, t):
    """Exact inverse warp: parameters ``[1/s, -tx/s, -ty/s]``
    (reference ``spatial_transform.py:87-104``)."""
    inv_s = 1.0 / t[:, 0]
    return affine_warp_matmul(im, inv_s, -t[:, 1] * inv_s, -t[:, 2] * inv_s)
