"""Fused SA-GAN attention kernel vs the plain-XLA reference.

The Pallas kernel (ops/attention.py) must match the einsum+softmax
formulation — forward AND gradients (its backward recomputes the
probabilities instead of saving them). Runs in interpreter mode so the CPU
suite covers the kernel math; the real-TPU compile is exercised by bench.py
and the verify drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.ops.attention import (attention_supported,
                                          sagan_attention,
                                          sagan_attention_reference)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.fixture
def qkv():
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    # SA-GAN shapes scaled down: q=1024 (two 512-blocks), k=256, d=16, dv=32
    theta = _rand(k0, 3, 1024, 16)
    phi = _rand(k1, 3, 256, 16)
    g = _rand(k2, 3, 256, 32)
    return theta, phi, g


class TestForward:
    def test_matches_reference_f32(self, qkv):
        theta, phi, g = qkv
        out = sagan_attention(theta, phi, g, True)
        ref = sagan_attention_reference(theta, phi, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_reference_bf16(self, qkv):
        theta, phi, g = (t.astype(jnp.bfloat16) for t in qkv)
        out = sagan_attention(theta, phi, g, True).astype(jnp.float32)
        ref = sagan_attention_reference(theta, phi, g).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)

    def test_single_block_q(self):
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
        theta = _rand(k0, 2, 256, 16)     # q=256 < BQ: one whole block
        phi = _rand(k1, 2, 64, 16)
        g = _rand(k2, 2, 64, 32)
        out = sagan_attention(theta, phi, g, True)
        ref = sagan_attention_reference(theta, phi, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestBackward:
    def test_grads_match_reference(self, qkv):
        theta, phi, g = qkv
        cot = _rand(jax.random.PRNGKey(9), 3, 1024, 32)

        def loss_kernel(t, p, v):
            return jnp.sum(sagan_attention(t, p, v, True) * cot)

        def loss_ref(t, p, v):
            return jnp.sum(sagan_attention_reference(t, p, v) * cot)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(theta, phi, g)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, phi, g)
        for a, b, name in zip(gk, gr, ("dtheta", "dphi", "dg")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4, err_msg=name)

    def test_grads_match_reference_bf16(self, qkv):
        theta, phi, g = (t.astype(jnp.bfloat16) for t in qkv)
        cot = _rand(jax.random.PRNGKey(9), 3, 1024, 32, dtype=jnp.bfloat16)

        def loss_kernel(t, p, v):
            return jnp.sum((sagan_attention(t, p, v, True)
                            * cot).astype(jnp.float32))

        def loss_ref(t, p, v):
            return jnp.sum((sagan_attention_reference(t, p, v)
                            * cot).astype(jnp.float32))

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(theta, phi, g)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, phi, g)
        for a, b, name in zip(gk, gr, ("dtheta", "dphi", "dg")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-2, atol=5e-2, err_msg=name)


class TestGating:
    def test_default_off(self, qkv, monkeypatch):
        # the kernel measured SLOWER than XLA's einsum fusion on v5e
        # (see ops/attention.py docstring): it must be opt-in
        monkeypatch.delenv("PIX2LATENT_FUSED_ATTENTION", raising=False)
        assert not attention_supported(*qkv)

    def test_cpu_backend_unsupported(self, qkv, monkeypatch):
        monkeypatch.setenv("PIX2LATENT_FUSED_ATTENTION", "1")
        # the suite runs on the CPU mesh -> einsum path must be selected
        assert jax.default_backend() == "cpu"
        assert not attention_supported(*qkv)

    def test_kv_vmem_budget(self, monkeypatch):
        monkeypatch.setenv("PIX2LATENT_FUSED_ATTENTION", "1")
        theta = jnp.zeros((1, 512, 64))
        phi = jnp.zeros((1, 600_000, 64))   # k*d alone blows the budget
        g = jnp.zeros((1, 600_000, 64))
        assert not attention_supported(theta, phi, g)
