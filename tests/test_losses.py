"""Loss function tests (shapes, masking semantics, LPIPS plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF


def imgs(key, n=2, hw=16):
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (n, hw, hw, 3), minval=-1, maxval=1)
    b = jax.random.uniform(k2, (n, hw, hw, 3), minval=-1, maxval=1)
    return a, b


class TestElementwise:
    def test_l1_l2(self, key):
        a, b = imgs(key)
        assert jnp.allclose(LF.l1_loss(a, b), jnp.abs(b - a))
        assert jnp.allclose(LF.l2_loss(a, b), (b - a) ** 2)

    def test_masked_l1_normalization(self, key):
        a, b = imgs(key)
        full = jnp.ones_like(a)
        # full mask == plain spatial mean
        got = LF.masked_l1_loss(a, b, full)
        want = jnp.mean(jnp.abs(b - a), axis=(1, 2, 3))
        assert jnp.allclose(got, want, atol=1e-6)

    def test_masked_loss_ignores_masked_out(self, key):
        a, b = imgs(key)
        mask = jnp.zeros_like(a).at[:, :8].set(1.0)
        b_corrupt = b.at[:, 8:].set(5.0)  # differs only outside the mask
        assert jnp.allclose(LF.masked_l2_loss(a, b, mask),
                            LF.masked_l2_loss(a, b_corrupt, mask), atol=1e-5)

    def test_mask_broadcasts_single(self, key):
        a, b = imgs(key, n=4)
        mask = jnp.ones((1, 16, 16, 3))
        target = b[:1]
        out = LF.masked_l1_loss(a, target, mask)
        assert out.shape == (4,)


class TestReconstructionLoss:
    def test_weighted_pooling(self, key):
        a, b = imgs(key)
        loss_fn = LF.ReconstructionLoss("l1")
        w = jnp.ones_like(a)
        got = loss_fn(a, b, weight=w)
        want = jnp.mean(jnp.abs(b - a), axis=(1, 2, 3))
        assert got.shape == (2,)
        assert jnp.allclose(got, want, atol=1e-6)

    def test_no_weight_returns_map(self, key):
        a, b = imgs(key)
        loss_fn = LF.ReconstructionLoss("l2")
        got = loss_fn(a, b)
        assert got.shape == a.shape  # elementwise; core reduces per-sample

    def test_loss_mask_multiplies_weight(self, key):
        a, b = imgs(key)
        loss_fn = LF.ReconstructionLoss("l1")
        w = jnp.full_like(a, 0.5)
        lm = jnp.zeros_like(a).at[:, :4].set(1.0)
        got = loss_fn(a, b, weight=w, loss_mask=lm)
        want = loss_fn(a, b, weight=lm * w)
        assert jnp.allclose(got, want)

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError):
            LF.ReconstructionLoss("huber")


class TestLPIPS:
    def test_spatial_map_shape_and_nonneg(self, key):
        from pix2latent_tpu.losses.lpips import LPIPS
        a, b = imgs(key, n=2, hw=64)
        with pytest.warns(UserWarning):
            lp = LPIPS(net="alex", spatial=True)
        m = lp(a, b)
        assert m.shape == (2, 64, 64, 1)
        assert float(jnp.min(m)) >= 0.0

    def test_identity_is_zero(self, key):
        from pix2latent_tpu.losses.lpips import LPIPS
        a, _ = imgs(key, n=1, hw=64)
        with pytest.warns(UserWarning):
            lp = LPIPS(net="alex", spatial=False)
        assert float(lp(a, a)[0]) < 1e-6

    def test_vgg_backbone(self, key):
        from pix2latent_tpu.losses.lpips import LPIPS
        a, b = imgs(key, n=1, hw=64)
        with pytest.warns(UserWarning):
            lp = LPIPS(net="vgg", spatial=True)
        m = lp(a, b)
        assert m.shape == (1, 64, 64, 1)

    def test_projection_loss_fused_and_jittable(self, key):
        a, b = imgs(key, n=2, hw=64)
        with pytest.warns(UserWarning):
            loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0)
        w = jnp.ones_like(a)

        @jax.jit
        def run(a, b, w):
            return loss_fn(a, target=b, weight=w)

        out = run(a, b, w)
        assert out.shape == (2,)
        assert bool(jnp.all(out > 0))
        # identical images: only the (zero) lpips+rec remain
        assert float(run(a, a, w)[0]) < 1e-6


class TestInvertibility:
    def test_invertibility_loss_zero_for_identity_transform(self, key):
        a, _ = imgs(key, n=3)
        ident = lambda ims, t, invert=False: ims
        t = jnp.zeros((3, 3))
        out = LF.invertibility_loss(a, ident, t)
        assert jnp.allclose(out, 0.0)


class TestPrecomputeProtocol:
    """The precompute/from_ctx split must be numerically equivalent to the
    direct call — the execution core relies on it to hoist the target-side
    work out of the inner scan (VERDICT.md round 1, item 2)."""

    def test_lpips_features_distance_equals_call(self, key):
        from pix2latent_tpu.losses.lpips import LPIPS
        a, b = imgs(key, n=3, hw=32)
        lp = LPIPS(net="alex", spatial=True)
        direct = lp(a, b)
        split = lp.distance(a, lp.features(b))
        assert jnp.allclose(direct, split, atol=0, rtol=0)  # identical ops

    def test_lpips_one_row_target_broadcasts_exactly(self, key):
        from pix2latent_tpu.losses.lpips import LPIPS
        a, b = imgs(key, n=3, hw=32)
        target = b[:1]
        lp = LPIPS(net="alex", spatial=True)
        direct = lp(a, jnp.broadcast_to(target, a.shape))
        split = lp.distance(a, lp.features(target))
        assert jnp.allclose(direct, split, atol=1e-6)

    @pytest.mark.parametrize("cls_kwargs", [
        ("ReconstructionLoss", {"loss_type": "l1"}),
        ("PerceptualLoss", {"net": "alex"}),
        ("ProjectionLoss", {"lpips_net": "alex", "beta": 10.0}),
    ])
    def test_from_ctx_equals_call(self, key, cls_kwargs):
        name, kwargs = cls_kwargs
        a, b = imgs(key, n=3, hw=32)
        w = jnp.ones((1, 32, 32, 3)) * 0.7
        loss_fn = getattr(LF, name)(**kwargs)
        direct = loss_fn(a, b[:1], weight=w)
        ctx = loss_fn.precompute(b[:1], weight=w)
        split = loss_fn.from_ctx(a, ctx)
        assert jnp.allclose(direct, split, atol=1e-6)

    def test_grad_scan_with_and_without_precompute_match(self, key):
        """End-to-end: the fused grad scan must produce the same trajectory
        whether or not the loss context is hoisted."""
        from pix2latent_tpu import VariableManager
        from pix2latent_tpu.core.step import ExecutionCore
        from pix2latent_tpu.models.toy import make_toy_model

        model = make_toy_model(z_dim=8, res=32)
        target = jax.random.uniform(jax.random.PRNGKey(7), (32, 32, 3),
                                    minval=-1, maxval=1)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=1.0)

        def build():
            vm = VariableManager(seed=3)
            vm.register("z", shape=(8,), var_type="input",
                        learning_rate=0.05)
            vm.register("target", shape=(32, 32, 3), var_type="output",
                        requires_grad=False, default=target)
            return vm, ExecutionCore(model, vm, loss_fn)

        vm1, core1 = build()
        assert core1._can_precompute()
        vm2, core2 = build()
        core2._can_precompute = lambda: False   # force the direct path

        results = []
        for vm, core in [(vm1, core1), (vm2, core2)]:
            variables = vm.initialize(6, key=jax.random.PRNGKey(1))
            opt_state = core.init_opt_state(variables)
            variables, _, _, ys = core.grad_steps(
                variables, opt_state, jax.random.PRNGKey(2), 5)
            results.append((np.asarray(ys["loss"]),
                            np.asarray(variables["input"]["z"])))
        np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5)
        np.testing.assert_allclose(results[0][1], results[1][1], rtol=2e-4,
                                   atol=1e-6)
