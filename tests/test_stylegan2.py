"""StyleGAN2 Flax model tests (random-init mechanics + converter shapes +
upfirdn2d/fused ops parity with the native-kernel conventions)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.ops.upfirdn2d import (Blur, Downsample, Upsample,
                                          fused_leaky_relu, make_kernel,
                                          upfirdn2d)


class TestUpfirdn:
    def test_identity_kernel(self, key):
        x = jax.random.normal(key, (2, 8, 8, 3))
        k = jnp.asarray([[1.0]])
        out = upfirdn2d(x, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_size_convention(self, key):
        # out = (in*up + pad0 + pad1 - k) // down + 1
        x = jax.random.normal(key, (1, 8, 8, 1))
        k = make_kernel([1, 3, 3, 1])
        out = upfirdn2d(x, k, up=2, pad=(2, 1))
        assert out.shape == (1, 16, 16, 1)
        out = upfirdn2d(x, k, down=2, pad=(1, 1))
        assert out.shape == (1, 4, 4, 1)

    def test_upsample_downsample_shapes(self, key):
        x = jax.random.normal(key, (1, 16, 16, 4))
        assert Upsample()(x).shape == (1, 32, 32, 4)
        assert Downsample()(x).shape == (1, 8, 8, 4)

    def test_upsample_preserves_mean(self, key):
        # gain=factor^2 with a normalized kernel keeps total energy
        x = jnp.ones((1, 16, 16, 1))
        up = Upsample()(x)
        interior = up[:, 8:24, 8:24]
        np.testing.assert_allclose(np.asarray(interior), 1.0, atol=1e-4)

    def test_fused_leaky_relu(self):
        x = jnp.asarray([[-1.0, 1.0]])
        b = jnp.asarray([0.0, 0.0])
        out = fused_leaky_relu(x, b)
        np.testing.assert_allclose(
            np.asarray(out),
            [[-0.2 * math.sqrt(2), math.sqrt(2)]], atol=1e-6)

    def test_blur_matches_torch_conv(self, key):
        """FIR depthwise conv parity against a torch reference computation."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        x = np.asarray(jax.random.normal(key, (1, 9, 9, 2)), np.float32)
        k = np.asarray(make_kernel([1, 3, 3, 1]), np.float32)
        got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                                   pad=(2, 1)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        tk = torch.from_numpy(k)[None, None].repeat(2, 1, 1, 1)
        want = F.conv2d(F.pad(tx, (2, 1, 2, 1)), tk, groups=2)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def sg2():
    from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator
    # tiny 32x32 config keeps CPU tests fast; same machinery as 512/1024
    mod = StyleGAN2Generator(im_res=32, channel_multiplier=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 512)))["params"]
    return mod, params


class TestGenerator:
    def test_forward_shapes(self, sg2):
        mod, params = sg2
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
        out = mod.apply({"params": params}, z)
        assert out.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_latent_path_w(self, sg2):
        mod, params = sg2
        w = jax.random.normal(jax.random.PRNGKey(2), (2, 512))
        out = mod.apply({"params": params}, w, input_is_latent=True)
        assert out.shape == (2, 32, 32, 3)

    def test_style_method(self, sg2):
        from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator
        mod, params = sg2
        z = jax.random.normal(jax.random.PRNGKey(3), (4, 512))
        w = mod.apply({"params": params}, z,
                      method=StyleGAN2Generator.style)
        assert w.shape == (4, 512)

    def test_noise_count_and_shapes(self, sg2):
        mod, _ = sg2
        shapes = mod.noise_shapes()
        # im_res 32: num_layers = (5-2)*2+1 = 7
        assert len(shapes) == 7
        assert shapes[0] == (1, 4, 4, 1)
        assert shapes[-1] == (1, 32, 32, 1)

    def test_explicit_noise_changes_output(self, sg2):
        mod, params = sg2
        z = jax.random.normal(jax.random.PRNGKey(4), (1, 512))
        noises = [jnp.zeros((1, *s[1:])) for s in mod.noise_shapes()]
        a = mod.apply({"params": params}, z, noises=noises)
        noises2 = [n + 100.0 for n in noises]
        b = mod.apply({"params": params}, z, noises=noises2)
        # noise weights are zero-init at random... params here are flax-init
        # (normal), so noise path should not be identically zero
        assert a.shape == b.shape


class TestWrapper:
    def test_z_search_wrapper(self):
        from pix2latent_tpu.models.stylegan2 import (StyleGAN2,
                                                     StyleGAN2Generator)
        # monkey-patch a small resolution through the class table
        StyleGAN2.MODELS = dict(StyleGAN2.MODELS, tiny=32)
        with pytest.warns(UserWarning):
            m = StyleGAN2(model="tiny", search="z", channel_multiplier=1)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
        out = m(z=z)
        assert out.shape == (2, 32, 32, 3)
        assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= -1.0
        ml = m.mean_latent(128)
        assert ml.shape == (1, 512)

    def test_wplus_search_with_flattened_noise(self):
        from pix2latent_tpu.models.stylegan2 import StyleGAN2
        StyleGAN2.MODELS = dict(StyleGAN2.MODELS, tiny=32)
        with pytest.warns(UserWarning):
            m = StyleGAN2(model="tiny", search="w+", channel_multiplier=1)
        w = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
        nd = m.noise_dim()
        noises = jax.random.normal(jax.random.PRNGKey(1), (2, nd))
        out = m(z=w, noises=noises)
        assert out.shape == (2, 32, 32, 3)
        # wrong noise length rejected (reshape TypeError or length assert)
        with pytest.raises((AssertionError, TypeError)):
            m(z=w, noises=noises[:, :-1])


class TestConverter:
    def test_synthetic_rosinality_state_dict(self):
        torch = pytest.importorskip("torch")
        from pix2latent_tpu.models.stylegan2 import (StyleGAN2Generator,
                                                     convert_torch_stylegan2,
                                                     channels_for)
        im_res, cm = 32, 1
        log_size = int(math.log2(im_res))
        sd = {}

        def eql(prefix, dout, din, bias_init=0.0):
            sd[f"{prefix}.weight"] = torch.randn(dout, din)
            sd[f"{prefix}.bias"] = torch.full((dout,), bias_init)

        for i in range(8):
            eql(f"style.{i + 1}", 512, 512)
        sd["input.input"] = torch.randn(1, channels_for(4, cm), 4, 4)

        def styled(prefix, cin, cout, k=3):
            sd[f"{prefix}.conv.weight"] = torch.randn(1, cout, cin, k, k)
            eql(f"{prefix}.conv.modulation", cin, 512, bias_init=1.0)
            sd[f"{prefix}.noise.weight"] = torch.zeros(())
            sd[f"{prefix}.activate.bias"] = torch.zeros(cout)

        def torgb(prefix, cin):
            sd[f"{prefix}.conv.weight"] = torch.randn(1, 3, cin, 1, 1)
            eql(f"{prefix}.conv.modulation", cin, 512, bias_init=1.0)
            sd[f"{prefix}.bias"] = torch.zeros(1, 3, 1, 1)

        styled("conv1", channels_for(4, cm), channels_for(4, cm))
        torgb("to_rgb1", channels_for(4, cm))
        for li in range(log_size - 2):
            res = 2 ** (li + 3)
            cin = channels_for(res // 2, cm)
            cout = channels_for(res, cm)
            styled(f"convs.{2 * li}", cin, cout)
            styled(f"convs.{2 * li + 1}", cout, cout)
            torgb(f"to_rgbs.{li}", cout)
        num_layers = (log_size - 2) * 2 + 1
        for i in range(num_layers):
            r = 2 ** ((i + 5) // 2)
            sd[f"noises.noise_{i}"] = torch.randn(1, 1, r, r)

        params = convert_torch_stylegan2(sd, im_res, cm)
        mod = StyleGAN2Generator(im_res=im_res, channel_multiplier=cm)
        z = jnp.zeros((1, 512))
        out = mod.apply({"params": params}, z)
        assert out.shape == (1, im_res, im_res, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestPopulationPairPacking:
    """Exactness invariant behind scripts/bench_packed_pairs.py: packing two
    population members into the channel dim turns the frozen shared-weight
    conv into a 2-group conv with the kernel tiled along O — bit-identical,
    so the thin-channel (c=64, 2x lane padding) res-512 layers could run
    fully lane-packed if the TPU microbench justifies integration."""

    def test_grouped_conv_matches_batched(self):
        import jax
        import jax.numpy as jnp
        from jax import lax

        P, H, C, K = 4, 16, 8, 3
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (K, K, C, C), jnp.float32) * 0.1
        x = jax.random.normal(jax.random.PRNGKey(1), (P, H, H, C))

        def conv(x, w, g=1):
            dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn,
                                            feature_group_count=g)

        y = conv(x, w)
        xp = x.reshape(P // 2, 2, H, H, C).transpose(0, 2, 3, 1, 4) \
              .reshape(P // 2, H, H, 2 * C)
        yp = conv(xp, jnp.concatenate([w, w], axis=3), g=2)
        yp = yp.reshape(P // 2, H, H, 2, C).transpose(0, 3, 1, 2, 4) \
               .reshape(P, H, H, C)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yp))

        # input grads through the packed form are identical too (the
        # frozen-generator case: only input/style grads matter)
        def f_batch(x):
            return jnp.sum(conv(x, w) ** 2)

        def f_packed(x):
            xp = x.reshape(P // 2, 2, H, H, C).transpose(0, 2, 3, 1, 4) \
                  .reshape(P // 2, H, H, 2 * C)
            return jnp.sum(conv(xp, jnp.concatenate([w, w], 3), g=2) ** 2)

        gb = jax.grad(f_batch)(x)
        gp = jax.grad(f_packed)(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gp),
                                   rtol=1e-6, atol=1e-6)

    def test_packed_generator_matches_default(self, sg2):
        """pack_pairs_max_ch forward == default forward on identical params
        (z path, w path, explicit per-sample noise, and input grads). Only
        the reduction order differs (block-diagonal kernels sum 2C
        channels), so allclose, not bit-equal."""
        from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator
        mod, params = sg2
        packed_mod = StyleGAN2Generator(im_res=32, channel_multiplier=1,
                                        pack_pairs_max_ch=512)
        z = jax.random.normal(jax.random.PRNGKey(5), (4, 512))

        a = mod.apply({"params": params}, z)
        b = packed_mod.apply({"params": params}, z)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

        # w path with explicit per-sample noise (the w+ search surface)
        noises = [jax.random.normal(jax.random.PRNGKey(10 + i), (4, *s[1:]))
                  for i, s in enumerate(mod.noise_shapes())]
        a = mod.apply({"params": params}, z, noises=noises,
                      input_is_latent=True)
        b = packed_mod.apply({"params": params}, z, noises=noises,
                             input_is_latent=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

        # input grads (the inversion workload: frozen params, z grads).
        # Scale-aware tolerance: reduction-order noise through 7 layers +
        # the squared loss amplifies to ~1e-6 of the gradient scale
        # (measured 1.3e-3 at scale 1200); a real packing bug (cross-member
        # leakage, wrong demod blocks) shows up at O(scale).
        def loss(m):
            def f(z):
                return jnp.sum(m.apply({"params": params}, z) ** 2)
            return f

        ga = np.asarray(jax.grad(loss(mod))(z))
        gb = np.asarray(jax.grad(loss(packed_mod))(z))
        assert np.abs(ga - gb).max() < 1e-4 * np.abs(ga).max(), (
            np.abs(ga - gb).max(), np.abs(ga).max())

    def test_packed_members_are_isolated(self, sg2):
        """Block-diagonal kernels keep pair members EXACTLY independent
        (the off-block zeros kill cross-member terms bit-exactly): changing
        member 1's latent must not move member 0's output at all."""
        from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator
        mod, params = sg2
        packed_mod = StyleGAN2Generator(im_res=32, channel_multiplier=1,
                                        pack_pairs_max_ch=512)
        z = jax.random.normal(jax.random.PRNGKey(6), (4, 512))
        a = packed_mod.apply({"params": params}, z)
        z2 = z.at[1].set(-z[1]).at[3].set(2.0 * z[3])
        b = packed_mod.apply({"params": params}, z2)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
        assert np.abs(np.asarray(a[1] - b[1])).max() > 0

    def test_transition_block_matches_default(self):
        """The pack boundary sits at the transition block's ENTRY, so its
        up-conv runs blkdiag with an asymmetric kernel (input = the thicker
        previous-block channels). im_res=64/cm=1 with max_ch=256 builds
        exactly that boundary: res-64 ch=256, previous block 512 — the
        up-conv packs [3,3,1024,512] while later layers are square."""
        from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator
        mod = StyleGAN2Generator(im_res=64, channel_multiplier=1)
        packed_mod = StyleGAN2Generator(im_res=64, channel_multiplier=1,
                                        pack_pairs_max_ch=256)
        params = mod.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 512)))["params"]
        z = jax.random.normal(jax.random.PRNGKey(7), (4, 512))
        a = mod.apply({"params": params}, z)
        b = packed_mod.apply({"params": params}, z)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

        ga = np.asarray(jax.grad(lambda z: jnp.sum(
            mod.apply({"params": params}, z) ** 2))(z))
        gb = np.asarray(jax.grad(lambda z: jnp.sum(
            packed_mod.apply({"params": params}, z) ** 2))(z))
        assert np.abs(ga - gb).max() < 1e-4 * np.abs(ga).max(), (
            np.abs(ga - gb).max(), np.abs(ga).max())

    def test_packed_requires_even_population(self):
        from pix2latent_tpu.models.stylegan2 import StyleGAN2Generator
        mod = StyleGAN2Generator(im_res=32, channel_multiplier=1,
                                 pack_pairs_max_ch=512)
        params = mod.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 512)))["params"]
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 512))
        with pytest.raises(AssertionError, match="even population"):
            mod.apply({"params": params}, z)
