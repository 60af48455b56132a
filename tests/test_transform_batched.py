"""Batched transform search: M independent alignment searches fused into one
compiled program (VERDICT.md round 2, item 1).

The parity contract: ``optimize_fused_batched(..., seeds=[s0, s1, ...])``
must reproduce, search-for-search, what M sequential solo
``optimize_fused`` runs under ``seed=s_i`` produce — same RNG streams, same
CMA trajectories, same candidates. (The reference runs one transform search
per process, ``pix2latent/transform/transform_optimizer.py:165-255``.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager
from pix2latent_tpu.models.toy import make_toy_model
from pix2latent_tpu.transform import (SpatialTransform,
                                      TransformBasinCMAOptimizer)

RES, ZD = 16, 8
SHIFTS = [0.4, -0.3, 0.2]


def _model():
    return make_toy_model(z_dim=ZD, res=RES, width=16, seed=0)


def _targets(model, m):
    """m differently-shifted renderings of the generator's own output."""
    z_true = jax.random.normal(jax.random.PRNGKey(3), (1, ZD))
    clean = model(z=z_true)
    warp = SpatialTransform(sensitivity=1.0)
    return jnp.concatenate([
        warp.transform(clean, jnp.asarray([[1.0, SHIFTS[i % len(SHIFTS)],
                                            0.0]]))
        for i in range(m)], axis=0)                      # [m, RES, RES, 3]


def _build_opt(model, target, seed=0):
    vm = VariableManager(seed=0)
    vm.register("z", shape=(ZD,), var_type="input", learning_rate=0.05)
    vm.register("target", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=jnp.ones((RES, RES, 3)))
    vm.register("t", shape=(3,), var_type="transform", requires_grad=False,
                grad_free=(np.array([1.0, 0, 0]), 0.3))

    def loss_fn(out, target, weight):
        return LF.masked_l1_loss(out, target, weight)

    opt = TransformBasinCMAOptimizer(model, vm, loss_fn, seed=seed)
    opt.register_transform(SpatialTransform(sensitivity=1.0), "t", "target")
    opt.register_transform(SpatialTransform(sensitivity=1.0), "t", "weight")
    opt.set_variable_propagation("z")
    return opt


class TestBatchedTransformSearch:
    def test_matches_sequential_solo_runs(self):
        """M=2 batched searches == 2 solo runs with the same seeds."""
        model = _model()
        targets = _targets(model, 2)
        seeds = [11, 29]
        META, GRAD = 4, 4

        solo_cand, solo_best = [], []
        for i in range(2):
            opt = _build_opt(model, targets[i], seed=seeds[i])
            opt.optimize_fused(meta_steps=META, grad_steps=GRAD)
            solo_cand.append(np.asarray(opt._candidate))
            solo_best.append(float(opt._best_loss))

        opt_b = _build_opt(model, targets[0])
        res = opt_b.optimize_fused_batched(
            {"target": targets}, meta_steps=META, grad_steps=GRAD,
            seeds=seeds)

        assert res["candidate"].shape == (2, 3)
        assert res["loss"].shape[0] == 2
        np.testing.assert_allclose(res["best_loss"], np.asarray(solo_best),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(res["candidate"], np.stack(solo_cand),
                                   rtol=2e-4, atol=2e-4)

    def test_recovers_per_search_shifts(self):
        """Each search's candidate must undo ITS OWN target's shift — the
        searches are independent (block-diagonal), not mixed."""
        model = _model()
        m = 3
        targets = _targets(model, m)
        opt = _build_opt(model, targets[0])
        res = opt.optimize_fused_batched(
            {"target": targets}, meta_steps=6, grad_steps=8)
        assert np.isfinite(res["best_loss"]).all()
        assert (res["best_loss"] < 0.25).all(), res["best_loss"]
        # searches see different targets and different RNG streams: their
        # candidates must differ pairwise (no cross-search state bleed; the
        # exact per-search trajectory is pinned by the parity test above)
        cand = res["candidate"]
        for i in range(m):
            for j in range(i + 1, m):
                assert not np.allclose(cand[i], cand[j], atol=1e-6), (i, j)
        assert res["candidate_out"].shape == (m, RES, RES, 3)

    def test_checkpoint_resume(self, tmp_path):
        """Kill-and-resume: the batched carry + per-search key streams
        round-trip, and the resumed run finishes identically."""
        model = _model()
        targets = _targets(model, 2)
        ckpt = str(tmp_path / "batched_tsearch.npz")

        opt1 = _build_opt(model, targets[0])
        full = opt1.optimize_fused_batched(
            {"target": targets}, meta_steps=4, grad_steps=3, seeds=[1, 2])

        # run generations 0..2 only (checkpointing each), then "crash"
        opt2 = _build_opt(model, targets[0])
        try:
            orig = TransformBasinCMAOptimizer._get_fused_generation

            def dies_on_final(self, grad_steps, meta_steps, with_tell,
                              batched=False):
                fn = orig(self, grad_steps, meta_steps, with_tell,
                          batched=batched)
                if with_tell:
                    return fn

                def boom(*a, **k):          # the final generation dispatch
                    raise KeyboardInterrupt
                return boom

            TransformBasinCMAOptimizer._get_fused_generation = dies_on_final
            with pytest.raises(KeyboardInterrupt):
                opt2.optimize_fused_batched(
                    {"target": targets}, meta_steps=4, grad_steps=3,
                    seeds=[1, 2], checkpoint_path=ckpt)
        finally:
            TransformBasinCMAOptimizer._get_fused_generation = orig
        assert os.path.exists(ckpt)

        # resume: only the final generation re-runs; result matches the
        # uninterrupted run
        opt3 = _build_opt(model, targets[0])
        res = opt3.optimize_fused_batched(
            {"target": targets}, meta_steps=4, grad_steps=3, seeds=[1, 2],
            checkpoint_path=ckpt)
        np.testing.assert_allclose(res["candidate"], full["candidate"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(res["best_loss"], full["best_loss"],
                                   rtol=1e-5, atol=1e-7)

    def test_loss_curves_recorded(self):
        """Per-generation per-search min tell losses come back as
        ``loss_curves [meta_steps, M]`` (one-behind fetch — the batched
        path is the recommended production path and must be observable,
        VERDICT.md round 3 weak #5)."""
        model = _model()
        m, META = 2, 5
        targets = _targets(model, m)
        opt = _build_opt(model, targets[0])
        res = opt.optimize_fused_batched(
            {"target": targets}, meta_steps=META, grad_steps=3,
            seeds=[7, 8])
        curves = res["loss_curves"]
        assert curves.shape == (META, m)
        # the final row is sanitized; tell rows may contain inf for
        # degenerate warps but never NaN
        assert not np.any(np.isnan(curves))
        # the recorded best matches the curves' running minimum (candidate
        # tracking runs on every generation, including the final one)
        np.testing.assert_allclose(np.min(curves, axis=0),
                                   res["best_loss"], rtol=1e-6)

    def test_rejects_unregistered_default(self):
        model = _model()
        targets = _targets(model, 2)
        opt = _build_opt(model, targets[0])
        with pytest.raises(AssertionError, match="unregistered"):
            opt.optimize_fused_batched(
                {"nope": targets}, meta_steps=2, grad_steps=2)
