"""Pallas TPU kernel for the separable FIR blur.

StyleGAN2 runs a 4-tap binomial blur after every upsampling convolution
(``ops/upfirdn2d.py``). The op is pure memory traffic (16 MACs/element), but
XLA's depthwise-conv lowering measures 6-10x off the HBM bandwidth bound at
StyleGAN2 shapes (13 ms vs a 1.8 ms bound for [22,512,512,64] bf16).

This kernel works in a ``[N*C, H, W]`` view (W in lanes, H in sublanes —
plane sizes are lane-tileable where NHWC's thin channel dim is not): the
Mosaic pipeline streams one padded image plane per grid step through VMEM
and the separable row/column FIR is shifted multiply-adds on the VPU.
Padding happens in XLA (fuses with the producing op inside larger programs).

Scope: up=1, down=1 (the post-conv blur — the hot case); resampling variants
stay on the XLA formulation. Taps are compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fir_plane_kernel(x_ref, o_ref, *, taps, h_out, w_out, k):
    a = x_ref[...].astype(jnp.float32)        # [B, H+K-1, W+K-1]
    rowacc = taps[0] * a[:, 0:h_out]
    for j in range(1, k):
        rowacc = rowacc + taps[j] * a[:, j:j + h_out]
    out = taps[0] * rowacc[:, :, 0:w_out]
    for j in range(1, k):
        out = out + taps[j] * rowacc[:, :, j:j + w_out]
    o_ref[...] = out.astype(o_ref.dtype)


def fir_blur_pallas(x, k1d, pad):
    """Separable zero-padded FIR: matches ``upfirdn2d(x, outer(k,k),
    pad=pad)`` for up=down=1. Differentiable: the op is linear, so the VJP
    is the same kernel with flipped taps and complementary padding.

    Args:
        x: [N, H, W, C].
        k1d: 1-D taps (length K) whose outer product is the 2-D kernel
            (host constants, not traced).
        pad: (pad0, pad1) applied to both spatial dims.
    """
    k1d = tuple(float(v) for v in np.asarray(k1d).reshape(-1))
    pad = (int(pad[0]), int(pad[1]))
    return _fir_blur_vjp(x, k1d, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fir_blur_vjp(x, k1d, pad):
    return _fir_blur_impl(x, k1d, pad)


def _fir_blur_fwd(x, k1d, pad):
    return _fir_blur_impl(x, k1d, pad), None


def _fir_blur_bwd(k1d, pad, _, g):
    k = len(k1d)
    adj_pad = (k - 1 - pad[0], k - 1 - pad[1])
    return (_fir_blur_impl(g, tuple(reversed(k1d)), adj_pad),)


_fir_blur_vjp.defvjp(_fir_blur_fwd, _fir_blur_bwd)


def _fir_blur_impl(x, k1d, pad, planes_per_block=None):
    n, h, w, c = x.shape
    k1d = np.asarray(k1d, np.float32)
    k = int(k1d.shape[0])
    p0, p1 = int(pad[0]), int(pad[1])
    h_out = h + p0 + p1 - k + 1
    w_out = w + p0 + p1 - k + 1

    nc = n * c

    def _tiled(hh, ww, itemsize):
        # VMEM pages: sublanes round to 8 (f32) / 16 (bf16), lanes to 128
        sub = 16 if itemsize == 2 else 8
        return (-(-hh // sub) * sub) * (-(-ww // 128) * 128) * itemsize

    if planes_per_block is None:
        # per plane: double-buffered input block + two f32 accumulators +
        # double-buffered output block; stay under the 16MB scoped limit
        hp, wp = h + p0 + p1, w + p0 + p1
        plane_bytes = (2 * _tiled(hp, wp, x.dtype.itemsize)
                       + _tiled(h_out, wp, 4) + _tiled(h_out, w_out, 4)
                       + 2 * _tiled(h_out, w_out, x.dtype.itemsize))
        planes_per_block = max(1, (12 * 1024 * 1024) // plane_bytes)
    b = min(planes_per_block, nc)
    while nc % b:
        b -= 1

    # NHWC -> [N*C, H, W] planes, zero-padded (both fuse in larger programs)
    planes = x.transpose(0, 3, 1, 2).reshape(nc, h, w)
    planes = jnp.pad(planes, ((0, 0), (p0, p1), (p0, p1)))

    taps = tuple(float(v) for v in k1d)
    kernel = functools.partial(_fir_plane_kernel, taps=taps, h_out=h_out,
                               w_out=w_out, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(nc // b,),
        in_specs=[pl.BlockSpec((b, h + p0 + p1, w + p0 + p1),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, h_out, w_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, h_out, w_out), x.dtype),
    )(planes)
    return out.reshape(n, c, h_out, w_out).transpose(0, 2, 3, 1)


def separable_taps(kernel2d):
    """If a 2-D FIR kernel is an outer product k k^T (all our binomial blurs
    are), return the 1-D taps whose outer product reproduces it; else None."""
    k2 = np.asarray(kernel2d, np.float32)
    if k2.ndim != 2 or k2.shape[0] != k2.shape[1]:
        return None
    u, s, vt = np.linalg.svd(k2)
    if s[0] <= 0 or (len(s) > 1 and s[1] > 1e-5 * s[0]):
        return None
    k1 = u[:, 0] * np.sqrt(s[0])
    if k1.sum() < 0:
        k1 = -k1
    if not np.allclose(np.outer(k1, k1), k2, atol=1e-6):
        return None
    return k1
