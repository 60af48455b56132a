"""upfirdn2d — upsample, FIR filter, downsample.

TPU-native replacement for the rosinality StyleGAN2 CUDA kernel
(``op/upfirdn2d.py`` in the repo the reference clones at import time,
``pix2latent/model/stylegan2.py:12-28``). Expressed as a single
``lax.conv_general_dilated``: upsampling via lhs dilation, the FIR tap as a
depthwise kernel, downsampling via window strides — XLA fuses it with
neighboring ops and tiles it onto the TPU convolution units. Layout NHWC.

Matches the native kernel's output size convention
``out = (in*up + pad0 + pad1 - k) // down + 1`` (the native op zero-pads
``up-1`` zeros *after* the last sample; lhs dilation does not, so the extra
zeros are folded into the trailing pad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k, gain=1.0):
    """1-D tap list or 2-D array -> normalized 2-D FIR kernel
    (rosinality ``make_kernel``)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    k = k / jnp.sum(k)
    return k * gain


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Args:
        x: [N, H, W, C].
        kernel: [kh, kw] FIR taps.
        up / down: integer resampling factors.
        pad: (pad0, pad1) applied to both spatial dims.

    Returns [N, H', W', C] with the native kernel's size convention.
    """
    kh, kw = kernel.shape
    c = x.shape[-1]
    pad0, pad1 = int(pad[0]), int(pad[1])
    # depthwise kernel [kh, kw, 1, C]; FIR is a correlation here — the
    # kernels used (binomial) are symmetric, matching the native op
    rhs = jnp.tile(kernel[:, :, None, None].astype(x.dtype), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, rhs,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class Blur:
    """FIR blur with optional upsample-gain (rosinality ``Blur``).

    ``use_pallas=True`` routes separable kernels to the Pallas plane kernel
    (``ops.pallas_fir``): measured 1.2x faster than the XLA depthwise conv
    *standalone* at StyleGAN2 shapes and exact f32 (the conv truncates to
    bf16 on the MXU) — but **slower inside the full generator graph** (the
    NHWC->plane transposes break XLA's fusion of the blur with neighboring
    ops; 226 -> 156 img/s on the cars-512 bench). Default off; useful when
    the blur runs standalone or when exact-precision FIR matters.
    """

    def __init__(self, kernel=(1, 3, 3, 1), pad=(0, 0), upsample_factor=1,
                 use_pallas=False):
        k = make_kernel(kernel)
        if upsample_factor > 1:
            k = k * (upsample_factor ** 2)
        self.kernel = k
        self.pad = pad
        self._taps = None
        # Blur may be constructed inside a traced module call, so derive the
        # separable taps from the raw Python kernel (host numpy), never from
        # the (possibly traced) 2-D kernel.
        k_np = np.asarray(kernel, np.float64)
        if use_pallas and k_np.ndim == 1:
            gain = float(upsample_factor ** 2)
            self._taps = (k_np / k_np.sum()) * np.sqrt(gain)

    def __call__(self, x):
        # pallas path pays off on large planes; tiny ones stay fused in XLA
        if (self._taps is not None and jax.default_backend() == "tpu"
                and x.shape[1] * x.shape[2] >= 128 * 128):
            from pix2latent_tpu.ops.pallas_fir import fir_blur_pallas
            return fir_blur_pallas(x, self._taps, self.pad)
        return upfirdn2d(x, self.kernel, pad=self.pad)


class Upsample:
    """2x FIR upsample (rosinality ``Upsample``)."""

    def __init__(self, kernel=(1, 3, 3, 1), factor=2):
        self.factor = factor
        k = make_kernel(kernel, gain=factor ** 2)
        self.kernel = k
        p = k.shape[0] - factor
        self.pad = ((p + 1) // 2 + factor - 1, p // 2)

    def __call__(self, x):
        return upfirdn2d(x, self.kernel, up=self.factor, pad=self.pad)


class Downsample:
    """FIR downsample (rosinality ``Downsample``)."""

    def __init__(self, kernel=(1, 3, 3, 1), factor=2):
        self.factor = factor
        k = make_kernel(kernel)
        self.kernel = k
        p = k.shape[0] - factor
        self.pad = ((p + 1) // 2, p // 2)

    def __call__(self, x):
        return upfirdn2d(x, self.kernel, down=self.factor, pad=self.pad)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    """Bias + LeakyReLU + gain — the rosinality ``fused_bias_act`` CUDA
    kernel as plain jnp (XLA fuses it into the surrounding convs)."""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * scale
