"""Two-phase pipeline: frozen-transform phase 2 == precomputed-warp phase 2.

The fully-batched two-phase recipe (``scripts/bench_two_phase.py``,
``examples/invert_biggan_transform_batched.py``) rests on two facts about a
FROZEN alignment parameter t (the reference keeps the transform applied
inside its phase-2 loop, ``/root/reference/examples/
invert_biggan_with_transform.py:178-226``):

1. The inner gradient objective sees only ``warp(target, t)`` /
   ``warp(ones, t)`` — constants once t is frozen, so they can be
   precomputed and the Adam trajectory is EXACT (the reference applies
   transforms once, before the loop: ``gradient_optimizer.py:37``).
2. The CMA tells are NOT in the warped frame: the reference scores the
   generated image un-warped back to the original frame against the
   original target with the binarized original weight (``inverted_loss``,
   ``base_cma_optimizer.py:113-139``). ``BatchedBasinCMAOptimizer``
   reproduces this via ``optimize(tell_inverted=...)``.

NOTE the registered transform variable is a DELTA: ``apply_transforms``
invokes the transform's ``__call__``, ``t_eff = default_t + sensitivity*Δt``
(``transform/spatial.py:51-55``) — precomputes must go through ``__call__``
too, NOT ``.transform(ims, Δt)`` which reads Δt as the absolute parameter.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager
from pix2latent_tpu.models.toy import make_toy_model
from pix2latent_tpu.optimizers import GradientOptimizer
from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
from pix2latent_tpu.transform import SpatialTransform

RES, ZD = 16, 8
T_FROZEN = np.array([1.0, 0.25, -0.1], np.float32)


def _model():
    return make_toy_model(z_dim=ZD, res=RES, width=16, seed=0)


def _target(model):
    z_true = jax.random.normal(jax.random.PRNGKey(3), (1, ZD))
    return model(z=z_true)[0]                            # [RES, RES, 3]


def _vm(target, weight):
    vm = VariableManager(seed=0)
    vm.register("z", shape=(ZD,), var_type="input", learning_rate=0.05)
    vm.register("target", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=weight)
    # phase-2 state: t frozen at phase 1's candidate (a plain constant)
    vm.register("t", shape=(3,), var_type="transform", requires_grad=False,
                default=jnp.asarray(T_FROZEN))
    return vm


def _loss(out, target, weight):
    return LF.masked_l1_loss(out, target, weight)


class TestFrozenTransformEqualsPrecompute:
    def test_gradient_trajectories_match(self):
        """Registered warp with frozen t vs precomputed warped target/weight:
        bit-equal Adam loss trajectories under the same seed (the inner
        objective only ever sees the warped constants)."""
        model = _model()
        target = _target(model)
        warp = SpatialTransform(sensitivity=1.0)
        ones = jnp.ones((RES, RES, 3))

        # in-graph transform (the reference's phase-2 'adam' shape)
        opt_a = GradientOptimizer(model, _vm(target, ones), _loss,
                                  track_variables=False)
        opt_a.register_transform(warp, "t", "target")
        opt_a.register_transform(warp, "t", "weight")
        opt_a.optimize(num_samples=6, grad_steps=8)
        loss_a = np.asarray(opt_a.loss)

        # precomputed warp via __call__ (delta semantics), no transform
        # registered; t stays registered so the init RNG stream is identical
        t_rows = jnp.asarray(T_FROZEN)[None]
        warped_t = warp(target[None], t_rows)[0]
        warped_w = warp(ones[None], t_rows)[0]
        opt_b = GradientOptimizer(model, _vm(warped_t, warped_w), _loss,
                                  track_variables=False)
        opt_b.optimize(num_samples=6, grad_steps=8)
        loss_b = np.asarray(opt_b.loss)

        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6, atol=1e-7)

    def test_inverted_tell_identity_transform_is_noop(self):
        """With Δt = 0 (identity warp) the inverted tell must reproduce the
        plain batched run EXACTLY — pins the tell plumbing (per-image
        repeat layout, chunking, winner selection) end to end."""
        model = _model()
        z_true = jax.random.normal(jax.random.PRNGKey(5), (2, ZD))
        targets = model(z=z_true)
        warp = SpatialTransform(sensitivity=1.0)

        def run(tell):
            opt = BatchedBasinCMAOptimizer(
                model, lambda out, target: LF.l1_loss(out, target),
                z_dim=ZD, popsize=6, seed=11, max_batch_size=5)
            return opt.optimize(
                targets, meta_steps=2, grad_steps=3, last_grad_steps=4,
                tell_inverted=tell), opt

        plain, opt_p = run(None)
        inv, opt_i = run({"transform_fn": warp,
                          "t": jnp.zeros((2, 3)), "targets": targets})
        np.testing.assert_allclose(np.asarray(plain["z"]),
                                   np.asarray(inv["z"]), rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(plain["loss"]),
                                   np.asarray(inv["loss"]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.stack(opt_p.losses),
                                   np.stack(opt_i.losses),
                                   rtol=1e-6, atol=1e-7)

    def test_inverted_tell_scores_original_frame(self):
        """With a real frozen Δt, the reported per-image loss must equal the
        hand-computed inverted-frame loss of the returned winner: un-warp
        the winner's render, score against the ORIGINAL target (reference
        ``inverted_loss`` semantics)."""
        model = _model()
        z_true = jax.random.normal(jax.random.PRNGKey(7), (2, ZD))
        targets = model(z=z_true)
        warp = SpatialTransform(sensitivity=1.0)
        t = jnp.asarray(np.stack([T_FROZEN, -0.5 * T_FROZEN]))  # [2, 3]
        warped_t = jnp.concatenate(
            [warp(targets[i:i + 1], t[i:i + 1]) for i in range(2)])

        opt = BatchedBasinCMAOptimizer(
            model, lambda out, target: LF.l1_loss(out, target),
            z_dim=ZD, popsize=6, seed=3)
        res = opt.optimize(warped_t, meta_steps=2, grad_steps=3,
                           last_grad_steps=4,
                           tell_inverted={"transform_fn": warp, "t": t,
                                          "targets": targets})
        out = model(z=res["z"])                              # [2, RES, RES, 3]
        expected = np.asarray(jnp.stack([
            jnp.mean(jnp.abs(warp(out[i:i + 1], t[i:i + 1],
                                  invert=True)[0] - targets[i]))
            for i in range(2)]))
        np.testing.assert_allclose(np.asarray(res["loss"]), expected,
                                   rtol=1e-5, atol=1e-6)

    def test_warped_weight_masks_out_of_frame(self):
        """warp(ones, Δt) must zero the regions the shift pulled out of
        frame — the mask travels with the target, as in the reference."""
        warp = SpatialTransform(sensitivity=1.0)
        w = np.asarray(warp(jnp.ones((1, RES, RES, 3)),
                            jnp.asarray(T_FROZEN)[None])[0])
        assert w.max() > 0.99
        assert w.min() < 1e-6, "expected zero padding outside the warp"
        assert 0.05 < (w < 0.5).mean() < 0.9

    def test_inverted_tell_precompute_ctx_matches_direct(self):
        """A precompute-capable loss routes the inverted tell through a
        per-batch ``tell_ctx`` on the M unique ORIGINAL targets (ADVICE
        round 4: no target-pyramid re-extraction on M*pop repeated rows at
        every tell); trajectories must equal the direct-loss path bit for
        bit under the same seed."""

        class _PrecomputeL1:
            def __call__(self, output, target, weight=None):
                return jnp.abs(target - output)

            def precompute(self, target, weight=None, loss_mask=None):
                return {"target": target}

            def from_ctx(self, output, ctx):
                return jnp.abs(ctx["target"] - output)

        model = _model()
        z_true = jax.random.normal(jax.random.PRNGKey(7), (2, ZD))
        targets = model(z=z_true)
        warp = SpatialTransform(sensitivity=1.0)
        t = jnp.asarray(np.stack([T_FROZEN, -0.5 * T_FROZEN]))  # [2, 3]
        warped_t = jnp.concatenate(
            [warp(targets[i:i + 1], t[i:i + 1]) for i in range(2)])

        def run(loss):
            opt = BatchedBasinCMAOptimizer(model, loss, z_dim=ZD,
                                           popsize=6, seed=3)
            res = opt.optimize(warped_t, meta_steps=2, grad_steps=3,
                               last_grad_steps=4,
                               tell_inverted={"transform_fn": warp, "t": t,
                                              "targets": targets})
            return res, opt

        direct, od = run(lambda out, target: LF.l1_loss(out, target))
        ctxed, oc = run(_PrecomputeL1())
        np.testing.assert_allclose(np.asarray(direct["z"]),
                                   np.asarray(ctxed["z"]), rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(direct["loss"]),
                                   np.asarray(ctxed["loss"]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.stack(od.losses), np.stack(oc.losses),
                                   rtol=1e-6, atol=1e-7)

    def test_gen_program_cache_keyed_on_transform_identity(self):
        """Reusing ONE optimizer instance across optimize() calls with a
        different transform_fn must not silently reuse the previously traced
        transform in the tells (ADVICE round 4): the second run must match a
        fresh optimizer built with the second transform."""
        model = _model()
        z_true = jax.random.normal(jax.random.PRNGKey(9), (2, ZD))
        targets = model(z=z_true)
        warp_a = SpatialTransform(sensitivity=1.0)
        warp_b = SpatialTransform(sensitivity=0.25)   # same shapes, new fn
        t = jnp.asarray(np.stack([T_FROZEN, -0.5 * T_FROZEN]))

        def tell(warp):
            return {"transform_fn": warp, "t": t, "targets": targets}

        shared = BatchedBasinCMAOptimizer(
            model, lambda out, target: LF.l1_loss(out, target),
            z_dim=ZD, popsize=6, seed=3)
        shared.optimize(targets, meta_steps=1, grad_steps=2,
                        last_grad_steps=2, tell_inverted=tell(warp_a))
        shared._key = jax.random.PRNGKey(3)          # replay the key stream
        reused = shared.optimize(targets, meta_steps=1, grad_steps=2,
                                 last_grad_steps=2,
                                 tell_inverted=tell(warp_b))

        fresh_opt = BatchedBasinCMAOptimizer(
            model, lambda out, target: LF.l1_loss(out, target),
            z_dim=ZD, popsize=6, seed=3)
        fresh = fresh_opt.optimize(targets, meta_steps=1, grad_steps=2,
                                   last_grad_steps=2,
                                   tell_inverted=tell(warp_b))
        np.testing.assert_allclose(np.asarray(reused["loss"]),
                                   np.asarray(fresh["loss"]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(reused["z"]),
                                   np.asarray(fresh["z"]), rtol=0, atol=1e-6)
