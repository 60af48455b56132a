"""BigGAN-deep Flax model tests (random-init; weight parity needs the HF
checkpoint, unavailable offline — shapes/mechanics are validated here and the
converter is shape-checked synthetically)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2latent_tpu.models.biggan import (BIGGAN_CONFIGS, BigGAN,
                                          BigGANDeepGenerator,
                                          convert_torch_biggan)


@pytest.fixture(scope="module")
def model():
    with pytest.warns(UserWarning):
        # 128 variant keeps the test fast; identical machinery to 256
        return BigGAN("biggan-deep-128")


class TestForward:
    def test_output_shape_and_range(self, model):
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 128))
        c = model.get_class_embedding(153)
        c = jnp.broadcast_to(c, (2, 128))
        out = model(z=z, c=c)
        assert out.shape == (2, 128, 128, 3)
        assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= -1.0
        assert np.isfinite(np.asarray(out)).all()

    def test_class_embedding_shapes(self, model):
        e1 = model.get_class_embedding(7)
        assert e1.shape == (1, 128)
        onehot = np.zeros((3, 1000), np.float32)
        onehot[:, 5] = 1
        e3 = model.get_class_embedding(onehot)
        assert e3.shape == (3, 128)
        np.testing.assert_allclose(np.asarray(e3[0]), np.asarray(e3[1]))

    def test_truncation_changes_bn_stats_path(self, model):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 128))
        c = model.get_class_embedding(1)
        a = model(z=z, c=c, truncation=1.0)
        b = model(z=z, c=c, truncation=0.5)
        # random-init stats are constant across truncation, so outputs match;
        # the point is the interpolation path executes at any truncation
        assert a.shape == b.shape

    def test_invalid_inputs_rejected(self, model):
        z = jnp.zeros((1, 128))
        c = jnp.zeros((1, 64))
        with pytest.raises(AssertionError):
            model(z=z, c=c)
        with pytest.raises(AssertionError):
            model(z=z, c=jnp.zeros((1, 128)), truncation=0.0)

    def test_jit_and_vmap_population(self, model):
        # the inversion hot path: jitted population forward
        fwd = jax.jit(lambda p, z, c: model.apply(p, z=z, c=c))
        z = jax.random.normal(jax.random.PRNGKey(2), (6, 128))
        c = jnp.broadcast_to(model.get_class_embedding(3), (6, 128))
        out = fwd(model.params, z, c)
        assert out.shape == (6, 128, 128, 3)


class TestArchitecture:
    def test_resolution_doubling_chain(self):
        for version, cfg in BIGGAN_CONFIGS.items():
            ups = sum(1 for up, _, _ in cfg["layers"] if up)
            assert 4 * (2 ** ups) == cfg["output_dim"], version

    def test_attention_at_64(self):
        for version, cfg in BIGGAN_CONFIGS.items():
            res = 4
            for i, (up, _, _) in enumerate(cfg["layers"]):
                if i == cfg["attention_position"]:
                    assert res == 64, version
                if up:
                    res *= 2


class TestConverter:
    def test_synthetic_state_dict_roundtrip(self):
        """Build a fake HF-layout state_dict with the right shapes and check
        the converter produces a tree the Flax module accepts and that
        spectral norm baking divides by sigma."""
        torch = pytest.importorskip("torch")
        cfg = BIGGAN_CONFIGS["biggan-deep-128"]
        ch = 128
        sd = {}

        def add_sn_linear(prefix, dout, din):
            w = torch.randn(dout, din)
            sd[f"{prefix}.weight_orig"] = w
            sd[f"{prefix}.weight_u"] = torch.nn.functional.normalize(
                torch.randn(dout), dim=0)
            sd[f"{prefix}.weight_v"] = torch.nn.functional.normalize(
                torch.randn(din), dim=0)
            sd[f"{prefix}.bias"] = torch.randn(dout)

        def add_sn_conv(prefix, cout, cin, k):
            w = torch.randn(cout, cin, k, k)
            sd[f"{prefix}.weight_orig"] = w
            sd[f"{prefix}.weight_u"] = torch.nn.functional.normalize(
                torch.randn(cout), dim=0)
            sd[f"{prefix}.weight_v"] = torch.nn.functional.normalize(
                torch.randn(cin * k * k), dim=0)
            sd[f"{prefix}.bias"] = torch.randn(cout)

        def add_bn(prefix, c, conditional=True):
            sd[f"{prefix}.running_means"] = torch.randn(51, c) * 0.01
            sd[f"{prefix}.running_vars"] = torch.rand(51, c) + 0.5
            if conditional:
                add_sn_linear(f"{prefix}.scale", c, 256)
                del sd[f"{prefix}.scale.bias"]
                add_sn_linear(f"{prefix}.offset", c, 256)
                del sd[f"{prefix}.offset.bias"]
            else:
                sd[f"{prefix}.weight"] = torch.ones(c)
                sd[f"{prefix}.bias"] = torch.zeros(c)

        sd["embeddings.weight"] = torch.randn(128, 1000)
        add_sn_linear("generator.gen_z", 4 * 4 * 16 * ch, 256)

        t_idx = 0
        for i, (up, im, om) in enumerate(cfg["layers"]):
            if i == cfg["attention_position"]:
                ap = f"generator.layers.{t_idx}"
                cin = im * ch
                add_sn_conv(f"{ap}.snconv1x1_theta", cin // 8, cin, 1)
                del sd[f"{ap}.snconv1x1_theta.bias"]
                add_sn_conv(f"{ap}.snconv1x1_phi", cin // 8, cin, 1)
                del sd[f"{ap}.snconv1x1_phi.bias"]
                add_sn_conv(f"{ap}.snconv1x1_g", cin // 2, cin, 1)
                del sd[f"{ap}.snconv1x1_g.bias"]
                add_sn_conv(f"{ap}.snconv1x1_o_conv", cin, cin // 2, 1)
                del sd[f"{ap}.snconv1x1_o_conv.bias"]
                sd[f"{ap}.gamma"] = torch.zeros(())
                t_idx += 1
            bp = f"generator.layers.{t_idx}"
            cin, cout, mid = im * ch, om * ch, im * ch // 4
            add_bn(f"{bp}.bn_0", cin)
            add_sn_conv(f"{bp}.conv_0", mid, cin, 1)
            add_bn(f"{bp}.bn_1", mid)
            add_sn_conv(f"{bp}.conv_1", mid, mid, 3)
            add_bn(f"{bp}.bn_2", mid)
            add_sn_conv(f"{bp}.conv_2", mid, mid, 3)
            add_bn(f"{bp}.bn_3", mid)
            add_sn_conv(f"{bp}.conv_3", cout, mid, 1)
            t_idx += 1

        add_bn("generator.bn", ch, conditional=False)
        add_sn_conv("generator.conv_to_rgb", ch, ch, 3)

        params = convert_torch_biggan(sd, "biggan-deep-128")
        model = BigGAN("biggan-deep-128", params=params)
        z = jnp.zeros((1, 128))
        c = model.get_class_embedding(0)
        out = model(z=z, c=c)
        assert out.shape == (1, 128, 128, 3)
        assert np.isfinite(np.asarray(out)).all()

        # SN baking: effective weight has sigma approx 1 along (u, v)
        w_eff = np.asarray(params["generator"]["gen_z"]["kernel"]).T
        u = sd["generator.gen_z.weight_u"].numpy()
        wmat = w_eff.reshape(w_eff.shape[0], -1)
        v = wmat.T @ u
        v /= np.linalg.norm(v)
        sigma = float((wmat @ v) @ u)
        assert abs(sigma - 1.0) < 1e-3


class TestSlicedOutputConv:
    def test_equals_full_conv_then_slice(self, key):
        """Slicing the kernel must be bit-identical to conv-then-slice (the
        HF conv_to_rgb quirk) — this is the profile-guided perf fix that
        removed the generator's largest tensor write."""
        from flax import linen as nn
        from pix2latent_tpu.models.biggan import SlicedOutputConv

        x = jax.random.normal(key, (2, 16, 16, 8))
        full = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
        params = full.init(jax.random.PRNGKey(1), x)["params"]
        want = full.apply({"params": params}, x)[..., :3]

        sliced = SlicedOutputConv(features=8, used=3)
        got = sliced.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
