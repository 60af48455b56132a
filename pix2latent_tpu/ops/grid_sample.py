"""Bilinear warp: ``affine_grid`` + ``grid_sample``.

TPU-native replacement for the cuDNN-backed ``F.affine_grid`` /
``F.grid_sample`` pair the reference's SpatialTransform rides on
(``pix2latent/transform/spatial_transform.py:84,104``). Semantics match
PyTorch's defaults at the reference's pin (torch 1.4):
``align_corners=False``, bilinear interpolation, zero padding.

The gather formulation below lowers to XLA dynamic-gathers that vectorize
over the CMA population via the leading batch dim; ``grid_sample`` is the
differentiation surface for the alignment search (gradients flow to the
transform parameters through the grid coordinates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(theta, size):
    """Normalized sampling grid for a batch of 2x3 affine maps.

    Args:
        theta: ``[N, 2, 3]`` affine matrices (row-major, torch convention:
            ``[x_src, y_src]^T = theta @ [x_dst, y_dst, 1]^T`` in normalized
            [-1, 1] coordinates).
        size: output spatial size ``(H, W)``.

    Returns:
        ``[N, H, W, 2]`` grid of (x, y) source coordinates, matching
        ``F.affine_grid(..., align_corners=False)``.
    """
    h, w = size
    # align_corners=False: pixel centers at (2i+1)/D - 1
    xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)                      # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)          # [H, W, 3]
    # [N, H, W, 2] = base [H,W,3] @ theta^T [N,3,2]
    return jnp.einsum("hwk,njk->nhwj", base, theta)


def grid_sample(im, grid):
    """Bilinear sample ``im`` at ``grid`` with zero padding.

    Args:
        im: ``[N, H, W, C]``.
        grid: ``[N, Ho, Wo, 2]`` normalized (x, y) coords in [-1, 1].

    Returns:
        ``[N, Ho, Wo, C]`` — matches ``F.grid_sample(mode='bilinear',
        padding_mode='zeros', align_corners=False)``.
    """
    n, h, w, c = im.shape

    gx = grid[..., 0]
    gy = grid[..., 1]
    # align_corners=False unnormalization: p = ((g + 1) * D - 1) / 2
    px = ((gx + 1.0) * w - 1.0) * 0.5
    py = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = px - x0          # weight for x1
    wy1 = py - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ims_b, yi, xi):
        """Zero-padded gather: ims_b [H,W,C], yi/xi [Ho,Wo] float."""
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = ims_b[yc, xc]                       # [Ho, Wo, C]
        return vals * valid[..., None]

    def sample_one(im_b, y0b, x0b, y1b, x1b, w00, w01, w10, w11):
        v00 = gather(im_b, y0b, x0b)
        v01 = gather(im_b, y0b, x1b)
        v10 = gather(im_b, y1b, x0b)
        v11 = gather(im_b, y1b, x1b)
        return (v00 * w00[..., None] + v01 * w01[..., None] +
                v10 * w10[..., None] + v11 * w11[..., None])

    return jax.vmap(sample_one)(
        im, y0, x0, y1, x1, wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1)


def affine_warp(im, theta):
    """Fused ``grid_sample(im, affine_grid(theta, im.shape))``."""
    return grid_sample(im, affine_grid(theta, im.shape[1:3]))
