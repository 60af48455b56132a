"""Fused Pallas modulation backward (ops/mod_backward.py).

Correctness of the one-pass (g_x, g_s) kernel vs plain-XLA autodiff, both
standalone and composed through the full StyleGAN2 generator (the op it
exists for — the top StyleGAN2 cost in the round-2 profile, BASELINE.md).
Runs interpreted on the CPU test mesh; the TPU speed verdict lives in
BASELINE.md.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.ops.mod_backward import fused_mod_backward, modulate


class TestKernel:
    @pytest.mark.parametrize("shape", [(3, 16, 16, 64), (2, 8, 8, 512),
                                       (2, 4, 4, 128)])
    def test_matches_reference(self, shape):
        rng = np.random.RandomState(0)
        n, h, w, c = shape
        g = jnp.asarray(rng.randn(*shape).astype(np.float32))
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        s = jnp.asarray(rng.rand(n, c).astype(np.float32) + 0.5)
        gx, gs = fused_mod_backward(g, x, s, interpret=True)
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(g * s[:, None, None, :]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(jnp.einsum("nhwc,nhwc->nc", g, x)),
            rtol=5e-5, atol=1e-5)
        assert gs.dtype == jnp.float32

    def test_bf16_inputs_accumulate_f32(self):
        rng = np.random.RandomState(1)
        shape = (2, 16, 16, 64)
        g = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        s = jnp.asarray(rng.rand(2, 64) + 0.5, jnp.bfloat16)
        gx, gs = fused_mod_backward(g, x, s, interpret=True)
        assert gx.dtype == jnp.bfloat16 and gs.dtype == jnp.float32
        want = jnp.einsum("nhwc,nhwc->nc", g.astype(jnp.float32),
                          x.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(gs), np.asarray(want),
                                   rtol=2e-2, atol=1e-2)

    def test_vjp_matches_plain(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
        s = jnp.asarray(rng.rand(2, 64).astype(np.float32) + 0.5)
        tgt = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))

        def loss(x, s, fused):
            y = modulate(x, s, fused=fused, interpret=True)
            return jnp.sum(jnp.sin(y) * tgt)

        g_plain = jax.grad(loss, argnums=(0, 1))(x, s, False)
        g_fused = jax.grad(loss, argnums=(0, 1))(x, s, True)
        for a, b in zip(g_plain, g_fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-5)


class TestInGenerator:
    def test_generator_grads_match_plain_path(self):
        """fused_mod_bwd=True must be gradient-identical (to fp noise)
        through the full synthesis net — every modulated conv, both search
        paths' gradient route."""
        from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator

        gen = StyleGAN2Generator(im_res=32, fused_mod_bwd=False)
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((2, 512)))
        params = params["params"]
        gen_f = StyleGAN2Generator(im_res=32, fused_mod_bwd=True)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))

        def loss(g_obj, z):
            return jnp.sum(g_obj.apply({"params": params}, z) ** 2)

        v0, g0 = jax.value_and_grad(lambda z: loss(gen, z))(z)
        v1, g1 = jax.value_and_grad(lambda z: loss(gen_f, z))(z)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        # grad magnitudes ~1e2; reduction-order fp drift through 15 convs
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-3, atol=1e-3)
