"""Transform tests: torch-parity of the warp, invertibility, color ops,
composition, and the transform-search driver."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager
from pix2latent_tpu.ops.grid_sample import affine_grid, affine_warp, grid_sample
from pix2latent_tpu.transform import (BrightnessTransform, ComposeTransform,
                                      ContrastTransform, GammaTransform,
                                      HueTransform, SaturationTransform,
                                      SpatialTransform,
                                      TransformBasinCMAOptimizer)
from pix2latent_tpu.transform.utils import (bbox_from_mask,
                                            compute_pre_alignment,
                                            compute_stat_from_mask,
                                            convert_to_t, get_biggan_stats)


class TestGridSampleTorchParity:
    """Golden parity with F.affine_grid/F.grid_sample at the reference's
    defaults (align_corners=False, bilinear, zeros padding) — the exact ops
    SpatialTransform rides on (spatial_transform.py:84,104)."""

    @pytest.mark.parametrize("hw", [(16, 16), (17, 23)])
    def test_matches_torch(self, hw):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        n, c = 3, 3
        im = rng.randn(n, *hw, c).astype(np.float32)
        theta = np.stack([
            np.array([[0.8, 0.0, 0.1], [0.0, 0.8, -0.2]], np.float32),
            np.array([[1.3, 0.0, -0.4], [0.0, 1.3, 0.3]], np.float32),
            np.array([[1.0, 0.1, 0.0], [-0.1, 1.0, 0.0]], np.float32),
        ])

        got = np.asarray(grid_sample(jnp.asarray(im),
                                     affine_grid(jnp.asarray(theta), hw)))

        t_im = torch.from_numpy(im).permute(0, 3, 1, 2)
        t_grid = F.affine_grid(torch.from_numpy(theta), t_im.shape,
                               align_corners=False)
        want = F.grid_sample(t_im, t_grid, mode="bilinear",
                             padding_mode="zeros", align_corners=False)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_grad_flows_to_theta(self):
        im = jnp.ones((1, 8, 8, 3))
        theta0 = jnp.asarray([[[1.0, 0.0, 0.3], [0.0, 1.0, 0.0]]])

        def f(theta):
            return jnp.sum(affine_warp(im, theta))

        g = jax.grad(f)(theta0)
        assert float(jnp.max(jnp.abs(g))) > 0.0


class TestSpatialTransform:
    def test_identity(self, key):
        tf = SpatialTransform()
        im = jax.random.uniform(key, (2, 16, 16, 3), minval=-1, maxval=1)
        delta = jnp.zeros((2, 3))
        out = tf(im, delta)
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-4)

    def test_invertibility_contract(self, key):
        # spatial_transform.py:96-98: invert(transform(x)) ≈ x.
        # Bilinear resampling only round-trips smooth content, so use a
        # low-frequency image (the contract the reference relies on for
        # its inverted_loss is on natural images, not white noise).
        tf = SpatialTransform(sensitivity=1.0)
        ys = jnp.linspace(-1, 1, 32)
        xs = jnp.linspace(-1, 1, 32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        im = jnp.stack([jnp.sin(2 * gy), jnp.cos(2 * gx), gy * gx], -1)
        im = jnp.broadcast_to(im[None], (2, 32, 32, 3))
        t = jnp.asarray([[0.7, 0.05, -0.1], [0.9, 0.0, 0.2]])
        warped = tf.transform(im, t)
        back = tf.invert_transform(warped, t)
        center = np.s_[:, 10:22, 10:22, :]
        err = float(jnp.mean(jnp.abs(back[center] - im[center])))
        assert err < 0.02

    def test_sensitivity_scales_delta(self, key):
        tf = SpatialTransform(sensitivity=0.1)
        im = jax.random.uniform(key, (1, 16, 16, 3))
        big = tf(im, jnp.asarray([[1.0, 0.0, 0.0]]))
        same = tf.transform(im, jnp.asarray([[1.1, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(big), np.asarray(same),
                                   atol=1e-5)

    def test_pre_align_from_mask(self):
        mask = np.zeros((64, 64, 3), np.float32)
        mask[16:48, 8:40] = 1.0
        tf = SpatialTransform(pre_align=jnp.asarray(mask))
        assert tf.t.shape == (3,)
        assert tf.t[0] > 0  # positive scale


class TestTransformUtils:
    def test_bbox(self):
        mask = np.zeros((32, 32, 1), np.float32)
        mask[4:20, 8:28] = 1.0
        assert bbox_from_mask(mask) == (4, 8, 19, 27)

    def test_empty_mask_full_range(self):
        mask = np.zeros((16, 16, 1), np.float32)
        st_h, st_w, en_h, en_w = bbox_from_mask(mask)
        assert (st_h, st_w) == (0, 0) and en_h == 16 and en_w == 16

    def test_stats_and_t_roundtrip(self):
        mask = np.zeros((64, 64, 3), np.float32)
        mask[16:48, 16:48] = 1.0
        center, size = compute_stat_from_mask(jnp.asarray(mask))
        assert abs(center[0] - 0.5) < 0.05 and abs(size[0] - 0.5) < 0.05
        t = convert_to_t(center, size, *get_biggan_stats())
        assert t.shape == (3,)


class TestColorTransforms:
    @pytest.mark.parametrize("cls", [BrightnessTransform, GammaTransform,
                                     SaturationTransform, ContrastTransform])
    def test_identity_param(self, key, cls):
        tf = cls()
        im = jax.random.uniform(key, (2, 8, 8, 3), minval=-0.9, maxval=0.9)
        out = tf(im, jnp.ones((2, 1)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-4)

    def test_hue_identity_and_shift(self, key):
        tf = HueTransform()
        im = jax.random.uniform(key, (2, 8, 8, 3), minval=-0.9, maxval=0.9)
        out = tf(im, jnp.zeros((2, 1)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-4)
        # full-period shift (0.5 then 0.5) returns (approximately) the input
        shifted = tf(tf(im, jnp.full((2, 1), 0.49)), jnp.full((2, 1), 0.49))
        re = tf(shifted, jnp.full((2, 1), -0.98 + 1.0))  # wraps mod 1
        assert np.asarray(out).shape == (2, 8, 8, 3)

    def test_brightness_invert(self, key):
        tf = BrightnessTransform()
        im = jax.random.uniform(key, (2, 8, 8, 3), minval=-0.9, maxval=0.0)
        t = jnp.full((2, 1), 0.8)
        out = tf(tf(im, t), t, invert=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-3)

    def test_differentiable(self, key):
        # capability upgrade over the PIL-based reference: color ops admit
        # gradients
        tf = SaturationTransform()
        im = jax.random.uniform(key, (1, 8, 8, 3), minval=-0.9, maxval=0.9)

        def f(t):
            return jnp.sum(tf(im, t))

        g = jax.grad(f)(jnp.full((1, 1), 1.2))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g[0, 0])) > 0

    def test_range_clamped(self, key):
        tf = BrightnessTransform(t_min=0.8, t_max=1.2)
        im = jax.random.uniform(key, (1, 8, 8, 3), minval=-0.5, maxval=0.5)
        a = tf(im, jnp.full((1, 1), 99.0))
        b = tf(im, jnp.full((1, 1), 1.2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestComposeTransform:
    def test_concatenated_params_and_apply(self, key):
        spatial = SpatialTransform(sensitivity=1.0)
        bright = BrightnessTransform()
        comp = ComposeTransform([(spatial, 1.0), (bright, 1.0)])
        im = jax.random.uniform(key, (2, 16, 16, 3), minval=-0.9, maxval=0.0)
        t = jnp.concatenate(
            [jnp.zeros((2, 3)), jnp.ones((2, 1))], axis=1)
        out = comp(im, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-3)
        assert comp.get_param(as_tensor=True).shape == (4,)

    def test_only_spatial(self, key):
        spatial = SpatialTransform(sensitivity=1.0)
        bright = BrightnessTransform()
        comp = ComposeTransform([spatial, bright])
        im = jax.random.uniform(key, (1, 16, 16, 3), minval=-0.9, maxval=0.0)
        t = jnp.concatenate([jnp.zeros((1, 3)),
                             jnp.full((1, 1), 0.7)], axis=1)
        out = comp(im, t, only_spatial=True)  # brightness skipped
        np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-3)

    def test_broadcast_single_t(self, key):
        comp = ComposeTransform([BrightnessTransform()])
        im = jax.random.uniform(key, (4, 8, 8, 3))
        out = comp(im, jnp.ones((1, 1)))
        assert out.shape == im.shape


class TestTransformBasinCMA:
    def test_alignment_search_recovers_shift(self):
        """End-to-end: the target is a shifted rendering of the generator's
        own output; the transform search should find a t that un-shifts it."""
        from pix2latent_tpu.models.toy import make_toy_model

        RES, ZD = 16, 8
        model = make_toy_model(z_dim=ZD, res=RES, width=16, seed=0)
        z_true = jax.random.normal(jax.random.PRNGKey(3), (1, ZD))
        clean = model(z=z_true)

        # shift the target by a known warp
        true_warp = SpatialTransform(sensitivity=1.0)
        shifted = true_warp.transform(clean, jnp.asarray([[1.0, 0.4, 0.0]]))[0]

        vm = VariableManager(seed=0)
        vm.register("z", shape=(ZD,), var_type="input", learning_rate=0.05)
        vm.register("target", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False, default=shifted)
        vm.register("weight", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False,
                    default=jnp.ones((RES, RES, 3)))
        tf = SpatialTransform(sensitivity=1.0)
        vm.register("t", shape=(3,), var_type="transform",
                    requires_grad=False, grad_free=(np.array([1.0, 0, 0]),
                                                    0.3))

        def loss_fn(out, target, weight):
            return LF.masked_l1_loss(out, target, weight)

        opt = TransformBasinCMAOptimizer(model, vm, loss_fn)
        opt.register_transform(tf, "t", "target")
        opt.register_transform(SpatialTransform(sensitivity=1.0), "t",
                               "weight")
        opt.set_variable_propagation("z")

        variables, results, loss = opt.optimize(meta_steps=6, grad_steps=8)
        candidate = opt.get_candidate()
        assert candidate is not None and candidate.shape == (3,)
        assert opt._best_loss < 0.2
        assert len(opt.transform_tracked) == 6
        # results bundle mirrors the reference
        outs, targets, candidate_out = results
        assert candidate_out.shape == (RES, RES, 3)

    def test_propagation_bookkeeping(self):
        from pix2latent_tpu.models.toy import make_toy_model
        model = make_toy_model(z_dim=4, res=16, width=8, seed=0)
        vm = VariableManager(seed=0)
        vm.register("z", shape=(4,), var_type="input")
        vm.register("target", shape=(16, 16, 3), var_type="output",
                    requires_grad=False, default=jnp.zeros((16, 16, 3)))
        vm.register("weight", shape=(16, 16, 3), var_type="output",
                    requires_grad=False, default=jnp.ones((16, 16, 3)))
        vm.register("t", shape=(3,), var_type="transform",
                    requires_grad=False, grad_free=True)

        opt = TransformBasinCMAOptimizer(
            model, vm, lambda out, target, weight: LF.masked_l2_loss(
                out, target, weight))
        opt.register_transform(SpatialTransform(), "t", "target")
        opt.set_variable_propagation("z")
        opt.set_variable_propagation("z")  # duplicate: warned, not added twice
        assert opt.variables_to_propagate == ["z"]
        opt.optimize(meta_steps=3, grad_steps=2)
        assert "z" in opt.vp_means

    def test_checkpoint_resume(self, tmp_path):
        """checkpoint_path= on the transform driver restores the CMA carry
        AND the propagation EMA / best-candidate tracking (VERDICT.md round
        1, item 9: resumability is a uniform driver property)."""
        from pix2latent_tpu.models.toy import make_toy_model
        model = make_toy_model(z_dim=4, res=16, width=8, seed=0)

        def build():
            vm = VariableManager(seed=0)
            vm.register("z", shape=(4,), var_type="input")
            vm.register("target", shape=(16, 16, 3), var_type="output",
                        requires_grad=False, default=jnp.zeros((16, 16, 3)))
            vm.register("weight", shape=(16, 16, 3), var_type="output",
                        requires_grad=False, default=jnp.ones((16, 16, 3)))
            vm.register("t", shape=(3,), var_type="transform",
                        requires_grad=False, grad_free=True)
            opt = TransformBasinCMAOptimizer(
                model, vm, lambda out, target, weight: LF.masked_l2_loss(
                    out, target, weight))
            opt.register_transform(SpatialTransform(), "t", "target")
            opt.set_variable_propagation("z")
            return opt

        ckpt = str(tmp_path / "tsearch.npz")
        opt1 = build()
        opt1.optimize(meta_steps=3, grad_steps=2, checkpoint_path=ckpt)
        assert os.path.exists(ckpt)
        sigma_after = float(opt1.cma_state.sigma)
        vp_after = np.asarray(opt1.vp_means["z"])

        # resume: generations 0..1 checkpointed -> only the final one re-runs
        opt2 = build()
        opt2.optimize(meta_steps=3, grad_steps=2, checkpoint_path=ckpt)
        assert abs(float(opt2.cma_state.sigma) - sigma_after) < 1e-6
        # restored propagation EMA seeds the resumed final generation; the
        # candidate tracking came back non-placeholder
        assert opt2.get_candidate() is not None
        assert np.isfinite(float(opt2._best_loss))
        assert vp_after.shape == np.asarray(opt2.vp_means["z"]).shape

    def test_propagating_missing_variable_raises(self):
        from pix2latent_tpu.models.toy import make_toy_model
        model = make_toy_model(z_dim=4, res=16, width=8, seed=0)
        vm = VariableManager(seed=0)
        vm.register("z", shape=(4,), var_type="input")
        vm.register("target", shape=(16, 16, 3), var_type="output",
                    requires_grad=False, default=jnp.zeros((16, 16, 3)))
        vm.register("t", shape=(3,), var_type="transform",
                    requires_grad=False, grad_free=True)
        opt = TransformBasinCMAOptimizer(
            model, vm, lambda out, target: LF.l2_loss(out, target))
        opt.register_transform(SpatialTransform(), "t", "target")
        opt.set_variable_propagation("nope")
        with pytest.raises(RuntimeError):
            opt.optimize(meta_steps=2, grad_steps=1)


class TestAffineMatmulWarp:
    """The MXU-matmul reformulation must match the gather grid_sample
    exactly for axis-aligned affine warps."""

    @pytest.mark.parametrize("t_row", [
        [1.0, 0.0, 0.0],     # identity
        [0.8, 0.2, -0.3],    # zoom-in + shift
        [1.4, -0.5, 0.1],    # zoom-out + shift (exercises zero padding)
    ])
    def test_matches_gather_grid_sample(self, key, t_row):
        from pix2latent_tpu.ops.affine_matmul import affine_warp_matmul_t
        from pix2latent_tpu.ops.grid_sample import affine_grid, grid_sample
        im = jax.random.normal(key, (2, 24, 20, 3))
        t = jnp.asarray([t_row, [1.1, 0.05, 0.4]])
        theta = jnp.zeros((2, 2, 3))
        theta = theta.at[:, 0, 0].set(t[:, 0]).at[:, 1, 1].set(t[:, 0])
        theta = theta.at[:, :, 2].set(t[:, 1:])
        want = grid_sample(im, affine_grid(theta, (24, 20)))
        got = affine_warp_matmul_t(im, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_spatial_transform_both_paths_agree(self, key):
        im = jax.random.normal(key, (2, 16, 16, 3))
        t = jnp.asarray([[0.9, 0.1, -0.2], [1.2, 0.0, 0.3]])
        fast = SpatialTransform(sensitivity=1.0, use_matmul_warp=True)
        ref = SpatialTransform(sensitivity=1.0, use_matmul_warp=False)
        np.testing.assert_allclose(
            np.asarray(fast.transform(im, t)),
            np.asarray(ref.transform(im, t)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fast.invert_transform(im, t)),
            np.asarray(ref.invert_transform(im, t)), atol=1e-5)

    def test_differentiable_wrt_t(self, key):
        from pix2latent_tpu.ops.affine_matmul import affine_warp_matmul_t
        im = jax.random.normal(key, (1, 16, 16, 3))

        def f(t):
            return jnp.sum(affine_warp_matmul_t(im, t) ** 2)

        g = jax.grad(f)(jnp.asarray([[1.1, 0.1, -0.1]]))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0


class TestSetupTransformFn:
    def test_spatial_plus_colors(self):
        from pix2latent_tpu.transform.utils import setup_transform_fn
        fn, t = setup_transform_fn(spatial_transform=True,
                                   color_transform=("brightness", "hue"))
        assert fn is not None
        assert t.shape == (1, 5)  # 3 spatial + 1 hue + 1 brightness
        im = jnp.zeros((2, 8, 8, 3))
        out = fn(im, jnp.broadcast_to(t, (2, 5)))
        assert out.shape == im.shape

    def test_nothing_enabled(self):
        from pix2latent_tpu.transform.utils import setup_transform_fn
        fn, t = setup_transform_fn()
        assert fn is None and t is None

    def test_align_uses_mask(self):
        from pix2latent_tpu.transform.utils import setup_transform_fn
        mask = np.zeros((32, 32, 3), np.float32)
        mask[8:24, 8:24] = 1.0
        fn, t = setup_transform_fn(align=True, weight=jnp.asarray(mask))
        assert t.shape == (1, 3)
        assert float(t[0, 0]) > 0  # positive scale from pre-alignment


class TestFusedTransformBasinCMA:
    def _problem(self):
        from pix2latent_tpu.models.toy import make_toy_model
        RES, ZD = 16, 8
        model = make_toy_model(z_dim=ZD, res=RES, width=16, seed=0)
        z_true = jax.random.normal(jax.random.PRNGKey(3), (1, ZD))
        clean = model(z=z_true)
        true_warp = SpatialTransform(sensitivity=1.0)
        shifted = true_warp.transform(clean, jnp.asarray([[1.0, 0.4, 0.0]]))[0]

        vm = VariableManager(seed=0)
        vm.register("z", shape=(ZD,), var_type="input", learning_rate=0.05)
        vm.register("target", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False, default=shifted)
        vm.register("weight", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False, default=jnp.ones((RES, RES, 3)))
        vm.register("t", shape=(3,), var_type="transform",
                    requires_grad=False,
                    grad_free=(np.array([1.0, 0, 0]), 0.3))

        def loss_fn(out, target, weight):
            return LF.masked_l1_loss(out, target, weight)

        opt = TransformBasinCMAOptimizer(model, vm, loss_fn)
        opt.register_transform(SpatialTransform(sensitivity=1.0), "t",
                               "target")
        opt.register_transform(SpatialTransform(sensitivity=1.0), "t",
                               "weight")
        opt.set_variable_propagation("z")
        return opt, RES

    def test_fused_alignment_search_recovers_shift(self):
        """optimize_fused must solve the same alignment problem the unfused
        driver does (VERDICT.md round 1, item 6)."""
        opt, RES = self._problem()
        variables, results, loss = opt.optimize_fused(meta_steps=6,
                                                      grad_steps=8)
        candidate = opt.get_candidate()
        assert candidate is not None and candidate.shape == (3,)
        assert opt._best_loss < 0.2
        assert "z" in opt.vp_means
        outs, targets, candidate_out = results
        assert candidate_out.shape == (RES, RES, 3)
        # per-sample losses may be non-finite for degenerate candidates
        # (near-zero-scale warps), same as the unfused driver's self.loss;
        # the population best must be finite
        assert np.isfinite(np.asarray(loss)).any()
        assert np.nanmin(np.asarray(loss)) < 1.0

    def test_fused_quality_matches_unfused(self):
        """Same budget, independent RNG streams: both drivers should reach
        comparable alignment quality."""
        opt1, _ = self._problem()
        opt1.optimize(meta_steps=5, grad_steps=6)
        opt2, _ = self._problem()
        opt2.optimize_fused(meta_steps=5, grad_steps=6)
        assert opt2._best_loss < max(2.0 * opt1._best_loss, 0.25), (
            opt1._best_loss, opt2._best_loss)

    def test_fused_results_bundle_and_loss_curve(self):
        """The fused driver's results bundle carries REAL inverted frames
        (not the round-2 ``[None]`` placeholder) and a per-generation loss
        curve (VERDICT.md round 2, item 6 / weak #4)."""
        opt, RES = self._problem()
        META = 4
        variables, results, loss = opt.optimize_fused(meta_steps=META,
                                                      grad_steps=3)
        outs, targets, candidate_out = results
        assert outs[0] is not None
        assert outs[0].ndim == 3 and np.isfinite(np.asarray(outs[0])).all()
        assert targets[0].ndim == 3
        assert candidate_out.shape == (RES, RES, 3)
        assert len(opt.losses) == META
        assert all(np.isfinite(v) for v in opt.losses)

    def test_fused_checkpoint_resume(self, tmp_path):
        """Kill-and-resume on the fused transform search: the carry (CMA
        state + propagation EMA + candidate tracking) and RNG stream
        round-trip; the resumed run matches the uninterrupted one."""
        ckpt = str(tmp_path / "fused_tsearch.npz")
        META, GRAD = 4, 3

        full, _ = self._problem()
        full.optimize_fused(meta_steps=META, grad_steps=GRAD)

        part, _ = self._problem()
        orig = TransformBasinCMAOptimizer._get_fused_generation
        try:
            def dies_on_final(self, grad_steps, meta_steps, with_tell,
                              batched=False):
                fn = orig(self, grad_steps, meta_steps, with_tell,
                          batched=batched)
                if with_tell:
                    return fn

                def boom(*a, **k):
                    raise KeyboardInterrupt
                return boom

            TransformBasinCMAOptimizer._get_fused_generation = dies_on_final
            with pytest.raises(KeyboardInterrupt):
                part.optimize_fused(meta_steps=META, grad_steps=GRAD,
                                    checkpoint_path=ckpt)
        finally:
            TransformBasinCMAOptimizer._get_fused_generation = orig
        assert os.path.exists(ckpt)

        res, _ = self._problem()
        res.optimize_fused(meta_steps=META, grad_steps=GRAD,
                           checkpoint_path=ckpt)
        np.testing.assert_allclose(np.asarray(res._candidate),
                                   np.asarray(full._candidate),
                                   rtol=1e-5, atol=1e-6)
        assert abs(res._best_loss - full._best_loss) < 1e-6

    def test_fused_returns_warped_frame_loss_like_unfused(self):
        """Both drivers must report the same QUANTITY in self.loss: the
        final Adam step's per-sample loss on the WARPED target
        (base.py:_run_inner) — not the inverted-frame tell loss, which is
        systematically different (inverse warps of shifted candidates pull
        in out-of-frame borders) and stays internal to selection."""
        opt, RES = self._problem()
        variables, _, loss = opt.optimize_fused(meta_steps=3, grad_steps=4)
        assert np.asarray(loss).shape == np.asarray(opt.loss).shape
        # independent warped-frame evaluation of the returned population
        # (variables already carry the transformed target); the reported
        # loss is one Adam step behind this, so compare loosely
        _, ev = opt.core.eval(variables, jax.random.PRNGKey(0), step=12)
        ev, rep = np.asarray(ev), np.asarray(opt.loss)
        assert rep.shape == ev.shape
        finite = np.isfinite(ev) & np.isfinite(rep)
        assert finite.any()
        ratio = rep[finite] / np.maximum(ev[finite], 1e-6)
        assert np.median(ratio) < 3.0, (
            "reported loss is not on the warped-frame scale", ratio)

    def test_batched_returns_inner_loss(self):
        """The batched driver's dict must carry the warped-frame
        inner_loss alongside the inverted-frame tell loss."""
        opt, RES = self._problem()
        target = np.asarray(opt.var_manager.defaults()["target"])
        batch = {"target": np.stack([target, target])}
        res = opt.optimize_fused_batched(batch, meta_steps=3, grad_steps=3)
        assert res["inner_loss"].shape == res["loss"].shape
        # degenerate candidates may be non-finite (parity with the unfused
        # driver); each search's best must be finite
        assert np.isfinite(res["inner_loss"]).any(axis=1).all()


class TestComposedColorSearch:
    """The composed spatial+color search plumbing added for the on-chip
    hue+shift recovery bench (``scripts/bench_color_transform.py``,
    VERDICT.md round 4, task 4)."""

    def _compose(self):
        from pix2latent_tpu.transform import setup_transform_fn
        fn, _ = setup_transform_fn(spatial_transform=True,
                                   color_transform=("hue", "brightness"))
        return fn

    def test_search_identity_is_identity(self, key):
        """fn(ims, get_search_identity()) must reproduce ims — the CMA seed
        for composed searches (a zero seed clips brightness to 0.667)."""
        fn = self._compose()
        ident = fn.get_search_identity(as_tensor=True)
        assert ident.shape == (5,)
        np.testing.assert_allclose(np.asarray(ident), [0, 0, 0, 0, 1],
                                   atol=1e-6)
        ims = jax.random.uniform(key, (2, 12, 12, 3), minval=-1, maxval=1)
        out = fn(ims, jnp.broadcast_to(ident[None], (2, 5)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ims),
                                   rtol=1e-4, atol=1e-4)
        # the zero seed is NOT identity for the composed space
        out0 = fn(ims, jnp.zeros((2, 5)))
        assert float(jnp.abs(out0 - ims).max()) > 0.1

    def test_spatial_only_preserves_mask(self, key):
        """SpatialOnly(fn) must equal the bare spatial warp on a 0/1 mask —
        color ops corrupt masks (brightness maps zeros to t-1)."""
        from pix2latent_tpu.transform import SpatialOnly
        fn = self._compose()
        mask = jnp.ones((1, 16, 16, 3))
        # searched t: real spatial shift + a non-identity brightness
        # (2.0 -> effective 1.2 at the 0.2 color weight)
        t = jnp.asarray([[0.0, 2.0, 0.0, 0.0, 2.0]])
        spatial_ref = SpatialTransform(sensitivity=0.1)
        want = spatial_ref(mask, t[:, :3])
        got = SpatialOnly(fn)(mask, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # the full compose does NOT preserve the mask (that's the point)
        full = fn(mask, t)
        assert float(jnp.abs(full - want).max()) > 0.05

    def test_composed_search_recovers_hue_and_shift(self):
        """End-to-end CPU: corrupt a toy rendering with a known hue shift +
        translation; the composed search must find effective parameters of
        the right sign/ballpark and beat the corrupted baseline loss."""
        from pix2latent_tpu.models.toy import make_toy_model
        from pix2latent_tpu.transform import (HueTransform, SpatialOnly,
                                              TransformBasinCMAOptimizer)

        RES, ZD = 16, 8
        HUE_TRUE, TX_TRUE = 0.15, 0.3
        model = make_toy_model(z_dim=ZD, res=RES, width=16, seed=0)
        z_true = jax.random.normal(jax.random.PRNGKey(3), (1, ZD))
        clean = model(z=z_true)
        target = SpatialTransform(sensitivity=1.0).transform(
            HueTransform().apply(clean, jnp.asarray([HUE_TRUE])),
            jnp.asarray([[1.0, TX_TRUE, 0.0]]))[0]

        fn = self._compose()
        seed_mu = fn.get_search_identity()

        vm = VariableManager(seed=0)
        vm.register("z", shape=(ZD,), var_type="input", learning_rate=0.05)
        vm.register("target", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False, default=target)
        vm.register("weight", shape=(RES, RES, 3), var_type="output",
                    requires_grad=False, default=jnp.ones((RES, RES, 3)))
        vm.register("t", shape=(5,), var_type="transform",
                    requires_grad=False, grad_free=(seed_mu, 1.0))

        def loss_fn(out, target, weight):
            return LF.masked_l1_loss(out, target, weight)

        opt = TransformBasinCMAOptimizer(model, vm, loss_fn,
                                         track_variables=False)
        opt.register_transform(fn, "t", "target")
        opt.register_transform(SpatialOnly(fn), "t", "weight")
        opt.set_variable_propagation("z")
        opt.optimize_fused(meta_steps=8, grad_steps=6)

        best_t = np.asarray(opt.get_candidate())
        assert best_t is not None and best_t.shape == (5,)
        w_hue = fn.transform_list[1][1]
        eff_hue = float(np.clip(w_hue * best_t[3], -0.5, 0.5))
        # hue must be recovered with the right sign and ballpark magnitude.
        # The SPATIAL slice is deliberately not asserted: the toy generator
        # (tanh of a linear map) absorbs translation into z through the
        # inner Adam loop, so t_x is under-determined at toy scale — the
        # chip bench at BigGAN-256 (scripts/bench_color_transform.py, where
        # the class prior pins the object pose) carries the spatial
        # recovery number.
        assert -0.45 < eff_hue < -0.02, (eff_hue, best_t)
        assert np.isfinite(best_t).all() and np.isfinite(opt._best_loss)
        assert len(opt.losses) == 8          # one tell min per generation
