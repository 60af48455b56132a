"""Pallas FIR kernel tests.

On the CPU test harness the kernel runs in interpret mode; numerical parity
is checked against a float64 numpy reference (the XLA depthwise conv itself
runs at bf16 MXU precision on TPU, so it is NOT the gold standard).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2latent_tpu.ops.upfirdn2d import Blur, make_kernel, upfirdn2d
from pix2latent_tpu.ops.pallas_fir import separable_taps


def numpy_fir(x, k2d, pad):
    p0, p1 = pad
    k = k2d.shape[0]
    xp = np.pad(np.asarray(x, np.float64),
                ((0, 0), (p0, p1), (p0, p1), (0, 0)))
    h = x.shape[1] + p0 + p1 - k + 1
    w = x.shape[2] + p0 + p1 - k + 1
    out = np.zeros((x.shape[0], h, w, x.shape[3]))
    for i in range(k):
        for j in range(k):
            out += k2d[i, j] * xp[:, i:i + h, j:j + w, :]
    return out


class TestSeparableTaps:
    def test_binomial_kernel_is_separable(self):
        k2d = np.asarray(make_kernel([1, 3, 3, 1]))
        taps = separable_taps(k2d)
        assert taps is not None
        np.testing.assert_allclose(np.outer(taps, taps), k2d, atol=1e-6)

    def test_nonseparable_rejected(self):
        k2d = np.eye(4, dtype=np.float32)
        assert separable_taps(k2d) is None


class TestPallasFIRInterpret:
    """Interpret-mode execution on CPU (the kernel itself is TPU-compiled in
    production; interpret mode checks the indexing/taps logic)."""

    def test_matches_numpy_reference(self, key):
        from jax.experimental.pallas import tpu as pltpu
        from pix2latent_tpu.ops.pallas_fir import fir_blur_pallas
        k2d = np.asarray(make_kernel([1, 3, 3, 1]))
        taps = separable_taps(k2d)
        x = jax.random.normal(key, (2, 16, 16, 4), jnp.float32)
        want = numpy_fir(x, k2d, (2, 1))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fir_blur_pallas(x, taps, (2, 1)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_gradient_matches_xla(self, key):
        from jax.experimental.pallas import tpu as pltpu
        from pix2latent_tpu.ops.pallas_fir import fir_blur_pallas
        k2d = make_kernel([1, 3, 3, 1])
        taps = separable_taps(np.asarray(k2d))
        x = jax.random.normal(key, (1, 12, 12, 4), jnp.float32)

        def f_pallas(x):
            return jnp.sum(jnp.sin(fir_blur_pallas(x, taps, (2, 1))))

        def f_xla(x):
            return jnp.sum(jnp.sin(upfirdn2d(x, k2d, pad=(2, 1))))

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(f_pallas)(x)
        g2 = jax.grad(f_xla)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


class TestBlurDispatch:
    def test_default_stays_on_xla(self, key):
        blur = Blur((1, 3, 3, 1), pad=(2, 1))
        assert blur._taps is None  # pallas off by default
        x = jax.random.normal(key, (1, 16, 16, 4))
        out = blur(x)
        assert out.shape == (1, 16, 16, 4)

    def test_opt_in_falls_back_off_tpu(self, key):
        blur = Blur((1, 3, 3, 1), pad=(2, 1), use_pallas=True)
        assert blur._taps is not None
        # CPU backend in tests -> falls back to the XLA path
        x = jax.random.normal(key, (1, 256, 256, 4))
        out = blur(x)
        assert out.shape == (1, 256, 256, 4)
