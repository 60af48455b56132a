"""End-to-end optimizer tests against a frozen toy generator.

The reference had no tests; this suite plays the role of its runnable
examples (SURVEY.md §4): each driver must actually invert a known target.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager, distribution as dist, hooks
from pix2latent_tpu.models.toy import make_toy_model
from pix2latent_tpu.optimizers import (BasinCMAOptimizer, CMAOptimizer,
                                       GradientOptimizer,
                                       HybridNevergradOptimizer,
                                       NevergradOptimizer)

Z_DIM = 8
RES = 16


@pytest.fixture(scope="module")
def model():
    return make_toy_model(z_dim=Z_DIM, res=RES, width=16, seed=0)


@pytest.fixture(scope="module")
def target_and_z(model):
    z_true = jax.random.normal(jax.random.PRNGKey(7), (1, Z_DIM))
    target = model(z=z_true)[0]
    return target, z_true


def make_vm(target, grad_free=False, lr=0.05):
    vm = VariableManager(seed=0)
    vm.register("z", shape=(Z_DIM,), var_type="input", grad_free=grad_free,
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=lr, hook_fn=hooks.Clamp(4.0))
    vm.register("target", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=jnp.ones((RES, RES, 3)))
    return vm


def loss_fn(out, target, weight):
    return LF.masked_l1_loss(out, target, weight)


class TestGradientOptimizer:
    def test_inverts_toy_generator(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target)
        opt = GradientOptimizer(model, vm, loss_fn, log=False)
        variables, outs, losses = opt.optimize(num_samples=4, grad_steps=150)
        final = np.asarray(losses[-1][1]["loss"])
        assert final.shape == (4,)
        assert final.min() < 0.05
        # collage frame returned
        assert outs[0].ndim == 3

    def test_log_mode_collects_curve_and_frames(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target)
        opt = GradientOptimizer(model, vm, loss_fn, log=True)
        variables, outs, losses = opt.optimize(num_samples=2, grad_steps=20)
        assert len(losses) == 4  # every log_iter=5
        iters = [it for it, _ in losses]
        assert iters == [5, 10, 15, 20]
        assert len(outs) == 4
        assert outs[0].dtype == np.uint8
        # loss decreases
        assert losses[-1][1]["loss"].min() < losses[0][1]["loss"].min()

    def test_tracked_variables(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target)
        opt = GradientOptimizer(model, vm, loss_fn, track_variables=True)
        opt.optimize(num_samples=2, grad_steps=10)
        assert "z" in opt.tracked
        assert opt.tracked["z"].shape == (10, 2, Z_DIM)

    def test_hooks_enforced_during_optimization(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target)
        vm.edit_variable("z", {"hook_fn": hooks.Clamp(0.1)})
        opt = GradientOptimizer(model, vm, loss_fn)
        variables, _, _ = opt.optimize(num_samples=2, grad_steps=5)
        # values drift at most one Adam step beyond the clamp
        assert float(jnp.max(jnp.abs(variables["input"]["z"]))) <= 0.1 + 0.06


class TestCMAOptimizer:
    def test_gradient_free_inversion_improves(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = CMAOptimizer(model, vm, loss_fn)
        variables, outs, losses = opt.optimize(meta_steps=30, grad_steps=0)
        assert losses[-1][1]["loss"].min() < 0.25

    def test_popsize_matches_formula(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = CMAOptimizer(model, vm, loss_fn)
        opt.setup_cma(vm)
        from pix2latent_tpu.strategies.cma import default_popsize
        assert opt.num_samples == default_popsize(Z_DIM)

    def test_num_samples_must_be_none(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = CMAOptimizer(model, vm, loss_fn)
        with pytest.raises(AssertionError):
            opt.optimize(meta_steps=1, num_samples=9)

    def test_fused_eval_only_converges_like_host_loop(self, model,
                                                      target_and_z):
        """The one-dispatch eval-only generation (promoted after the 4.4x
        on-chip measurement, scripts/bench_evalonly.py) optimizes the same
        objective to comparable quality; per-generation losses are
        recorded one-behind."""
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = CMAOptimizer(model, vm, loss_fn, seed=3)
        variables, outs, losses = opt.optimize_fused(meta_steps=30,
                                                     grad_steps=0,
                                                     progress_every=0)
        assert len(opt.losses) == 30
        assert min(opt.losses) < 0.25
        # finetune path: grad_steps Adam on a final ask
        vm2 = make_vm(target, grad_free=True)
        opt2 = CMAOptimizer(model, vm2, loss_fn, seed=3)
        opt2.optimize_fused(meta_steps=10, grad_steps=30, progress_every=0)
        assert float(np.min(np.asarray(opt2.loss))) < 0.25

    def test_fused_eval_only_checkpoint_resume(self, model, target_and_z,
                                               tmp_path):
        target, _ = target_and_z
        path = str(tmp_path / "cma_fused.npz")

        def run(meta, ckpt):
            vm = make_vm(target, grad_free=True)
            opt = CMAOptimizer(model, vm, loss_fn, seed=7)
            opt.optimize_fused(meta_steps=meta, grad_steps=5,
                               progress_every=0, checkpoint_path=ckpt)
            return np.asarray(opt.loss)

        run(3, path)                    # "crash" after 3 of 6 generations
        resumed = run(6, path)          # resumes at 3
        straight = run(6, None)
        np.testing.assert_allclose(straight, resumed, rtol=0, atol=1e-6)


class TestBasinCMA:
    def test_flagship_beats_pure_cma_at_matched_meta_budget(
            self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn)
        variables, outs, losses = opt.optimize(
            meta_steps=8, grad_steps=10, last_grad_steps=40)
        final = losses[-1][1]["loss"]
        assert final.min() < 0.05

    def test_grad_free_seed_tuple(self, model, target_and_z):
        target, z_true = target_and_z
        vm = make_vm(target,
                     grad_free=(np.asarray(z_true[0]), 0.2))
        opt = BasinCMAOptimizer(model, vm, loss_fn)
        variables, outs, losses = opt.optimize(
            meta_steps=2, grad_steps=5, last_grad_steps=10)
        assert losses[-1][1]["loss"].min() < 0.05


class TestNGOptimizers:
    @pytest.mark.parametrize("method", ["CMA", "DE", "TwoPointsDE", "PSO",
                                        "OnePlusOne", "TBPSA",
                                        "RandomSearch"])
    def test_strategies_improve_on_toy(self, model, target_and_z, method):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = NevergradOptimizer(method, model, vm, loss_fn)
        variables, outs, losses = opt.optimize(
            num_samples=12, meta_steps=15, grad_steps=0)
        first = float(np.asarray(losses[0][1]["loss"]).min()) \
            if len(losses) > 1 else None
        final = float(np.asarray(losses[-1][1]["loss"]).min())
        assert final < 0.4

    def test_hybrid_ng(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = HybridNevergradOptimizer("CMA", model, vm, loss_fn)
        variables, outs, losses = opt.optimize(
            num_samples=8, meta_steps=4, grad_steps=8, last_grad_steps=20)
        assert losses[-1][1]["loss"].min() < 0.08

    @pytest.mark.parametrize("method,thresh", [("ActiveCMA", 0.08),
                                               ("TBPSA", 0.2)])
    def test_hybrid_ng_fused(self, model, target_and_z, method, thresh):
        """optimize_fused (one XLA dispatch per generation) reaches the
        same quality class as the host-loop hybrid driver (TBPSA adapts
        step size by selection only — slower on this tiny budget)."""
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = HybridNevergradOptimizer(method, model, vm, loss_fn,
                                       track_variables=False)
        variables, outs, losses = opt.optimize_fused(
            num_samples=8, meta_steps=4, grad_steps=8, last_grad_steps=20)
        final = np.asarray(losses[-1][1]["loss"])
        assert np.isfinite(final).all() and final.min() < thresh

    def test_unknown_method_rejected(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        with pytest.raises(AssertionError):
            NevergradOptimizer("NoSuchMethod", model, vm, loss_fn)

    def test_fused_eval_only_ng(self, model, target_and_z, tmp_path):
        """NevergradOptimizer.optimize_fused: one-dispatch eval-only
        generations (3.8x on-chip, scripts/bench_evalonly.py) converge,
        record one-behind losses, and checkpoint-resume exactly."""
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = NevergradOptimizer("CMA", model, vm, loss_fn, seed=5)
        opt.optimize_fused(num_samples=12, meta_steps=15, grad_steps=0,
                           progress_every=0)
        assert len(opt.losses) == 15
        assert min(opt.losses) < 0.4

        path = str(tmp_path / "ng_fused.npz")

        def run(meta, ckpt):
            vm2 = make_vm(target, grad_free=True)
            o = NevergradOptimizer("CMA", model, vm2, loss_fn, seed=9)
            o.optimize_fused(num_samples=8, meta_steps=meta, grad_steps=5,
                             progress_every=0, checkpoint_path=ckpt)
            return np.asarray(o.loss)

        run(3, path)
        resumed = run(6, path)
        straight = run(6, None)
        np.testing.assert_allclose(straight, resumed, rtol=0, atol=1e-6)


class TestShardedPopulation:
    def test_population_sharded_over_mesh(self, model, target_and_z):
        from pix2latent_tpu.parallel import make_mesh
        target, _ = target_and_z
        mesh = make_mesh()  # 8 virtual CPU devices (conftest)
        assert mesh.shape["pop"] == 8
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn, mesh=mesh)
        variables, outs, losses = opt.optimize(
            meta_steps=2, grad_steps=5, last_grad_steps=5)
        # popsize padded to a multiple of 8 (default for d=8 is 10 -> 16)
        assert opt.num_samples % 8 == 0
        assert losses[-1][1]["loss"].shape == (opt.num_samples,)


class TestFusedBasinCMA:
    def test_fused_matches_standard_quality(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
        variables, outs, losses = opt.optimize_fused(
            meta_steps=6, grad_steps=10, last_grad_steps=30)
        final = np.asarray(losses[-1][1]["loss"])
        assert final.min() < 0.05
        # one compiled generation per (grad_steps, popsize, active) key,
        # reused across calls
        assert len(opt._fused_gens) == 1
        variables2, _, losses2 = opt.optimize_fused(
            meta_steps=2, grad_steps=10, last_grad_steps=10)
        assert len(opt._fused_gens) == 1
        # a different CMA mode must NOT reuse the traced program (the
        # weights are embedded as constants)
        opt.optimize_fused(meta_steps=1, grad_steps=10, last_grad_steps=10,
                           active=True)
        assert len(opt._fused_gens) == 2

    def test_fused_sharded_over_mesh(self, model, target_and_z):
        """optimize_fused with a mesh: the in-graph sharding constraint
        (core.place_in_graph) pins the population layout, so the fused
        one-dispatch generation is also the multi-chip production path."""
        from pix2latent_tpu.parallel import make_mesh
        target, _ = target_and_z
        mesh = make_mesh()  # 8 virtual CPU devices (conftest)
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn, mesh=mesh,
                                track_variables=False)
        variables, outs, losses = opt.optimize_fused(
            meta_steps=4, grad_steps=8, last_grad_steps=20)
        assert opt.num_samples % 8 == 0  # padded to the mesh
        final = np.asarray(losses[-1][1]["loss"])
        assert np.isfinite(final).all() and final.min() < 0.1

    def test_fused_returns_reference_convention(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
        variables, outs, losses = opt.optimize_fused(
            meta_steps=1, grad_steps=2, last_grad_steps=2)
        assert "input" in variables and "z" in variables["input"]
        assert outs[0].ndim == 3
        assert losses[-1][0] == 1 * 2 + 2


class TestMicrobatching:
    def test_chunked_grads_match_whole(self, model, target_and_z):
        """max_batch_size runs must produce the same optimization trajectory
        as whole-population runs (chunked lax.map is exact, not approximate)."""
        target, _ = target_and_z
        # pop 6 / mbs 2 divides evenly; pop 7 / mbs 3 exercises the
        # wrap-padded last chunk (7 = 2*3 + 1) — both must be EXACT
        for pop, mbs in ((6, 2), (7, 3)):
            results = []
            for m in (None, mbs):
                vm = make_vm(target)
                opt = GradientOptimizer(model, vm, loss_fn, max_batch_size=m,
                                        track_variables=False, seed=0)
                variables, outs, losses = opt.optimize(num_samples=pop,
                                                       grad_steps=10)
                results.append((np.asarray(variables["input"]["z"]),
                                np.asarray(losses[-1][1]["loss"])))
            np.testing.assert_allclose(results[0][0], results[1][0],
                                       atol=1e-5)
            np.testing.assert_allclose(results[0][1], results[1][1],
                                       atol=1e-5)

    def test_nondivisible_population_handled(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target)
        opt = GradientOptimizer(model, vm, loss_fn, max_batch_size=4)
        # pop 10 with max 4 -> 3 chunks of 4, last wrap-padded by 2
        variables, outs, losses = opt.optimize(num_samples=10, grad_steps=5)
        assert losses[-1][1]["loss"].shape == (10,)

    def test_basincma_fused_with_microbatch(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn, max_batch_size=5,
                                track_variables=False)
        variables, outs, losses = opt.optimize_fused(
            meta_steps=2, grad_steps=5, last_grad_steps=10)
        assert np.isfinite(np.asarray(losses[-1][1]["loss"])).all()


class TestBatchedBasinCMA:
    def test_inverts_multiple_images_simultaneously(self, model):
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        M = 3
        z_true = jax.random.normal(jax.random.PRNGKey(11), (M, Z_DIM))
        targets = model(z=z_true)                       # [M, RES, RES, 3]

        opt = BatchedBasinCMAOptimizer(
            model, lambda out, target: LF.l1_loss(out, target),
            z_dim=Z_DIM, learning_rate=0.05, popsize=8, seed=0)
        res = opt.optimize(targets, meta_steps=5, grad_steps=8,
                           last_grad_steps=30)
        assert res["z"].shape == (M, Z_DIM)
        assert res["loss"].shape == (M,)
        assert res["out"].shape == targets.shape
        # every image individually inverted
        assert float(np.asarray(res["loss"]).max()) < 0.05

    def test_independent_searches(self, model):
        """Image i's result must not depend on the other images in the
        batch (block-diagonal independence)."""
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        z_true = jax.random.normal(jax.random.PRNGKey(12), (2, Z_DIM))
        targets = model(z=z_true)

        def run(tgts, seed=0):
            opt = BatchedBasinCMAOptimizer(
                model, lambda out, target: LF.l1_loss(out, target),
                z_dim=Z_DIM, popsize=8, seed=seed)
            return opt.optimize(tgts, meta_steps=3, grad_steps=5,
                                last_grad_steps=10)

        both = run(targets)
        # solo run of image 0 with the same RNG uses different key splits,
        # so compare quality rather than bitwise equality
        solo = run(targets[:1])
        assert abs(float(both["loss"][0]) - float(solo["loss"][0])) < 0.1

    def test_learnable_fixed_inputs(self):
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        model_c = make_toy_model(z_dim=Z_DIM, c_dim=4, res=RES, width=16,
                                 seed=2)
        z_true = jax.random.normal(jax.random.PRNGKey(13), (2, Z_DIM))
        c_true = jax.random.normal(jax.random.PRNGKey(14), (2, 4))
        targets = model_c(z=z_true, c=c_true)

        opt = BatchedBasinCMAOptimizer(
            model_c, lambda out, target: LF.l1_loss(out, target),
            z_dim=Z_DIM, popsize=8, learnable_inputs={"c": 0.01})
        res = opt.optimize(targets, fixed_inputs={"c": c_true},
                           meta_steps=3, grad_steps=5, last_grad_steps=20)
        assert res["c"].shape == (2, 4)
        assert float(np.asarray(res["loss"]).max()) < 0.1

    def test_microbatched_matches_plain(self, model):
        """max_batch_size chunking is exact: same seeds land the same
        optimum (wrap-padded chunks + grad rescale reproduce the whole-
        batch mean gradient up to float reassociation)."""
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        z_true = jax.random.normal(jax.random.PRNGKey(21), (2, Z_DIM))
        targets = model(z=z_true)

        def run(mbs):
            opt = BatchedBasinCMAOptimizer(
                model, LF.ReconstructionLoss(), z_dim=Z_DIM, popsize=8,
                seed=3, max_batch_size=mbs)
            return opt.optimize(targets, meta_steps=3, grad_steps=5,
                                last_grad_steps=10)

        plain = run(None)
        # total = 2*8 = 16 rows -> 6 chunks of 3 with a wrap-padded last
        chunked = run(3)
        np.testing.assert_allclose(np.asarray(plain["z"]),
                                   np.asarray(chunked["z"]),
                                   rtol=0, atol=5e-3)
        np.testing.assert_allclose(np.asarray(plain["loss"]),
                                   np.asarray(chunked["loss"]),
                                   rtol=0, atol=1e-4)

    def test_loss_curves_recorded(self, model):
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        z_true = jax.random.normal(jax.random.PRNGKey(22), (2, Z_DIM))
        targets = model(z=z_true)
        opt = BatchedBasinCMAOptimizer(
            model, lambda out, target: LF.l1_loss(out, target),
            z_dim=Z_DIM, popsize=8, seed=0)
        res = opt.optimize(targets, meta_steps=4, grad_steps=5,
                           last_grad_steps=10)
        curves = res["loss_curves"]
        assert curves.shape == (4, 2)
        assert np.all(np.isfinite(curves))
        # searches make progress: last generation's min beats the first
        assert np.all(curves[-1] <= curves[0] + 1e-6)

    def test_checkpoint_resume(self, model, tmp_path):
        """A run killed after 2 generations resumes from the checkpoint and
        lands exactly where an uninterrupted run does."""
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        z_true = jax.random.normal(jax.random.PRNGKey(23), (2, Z_DIM))
        targets = model(z=z_true)
        path = str(tmp_path / "batched.npz")

        def make():
            return BatchedBasinCMAOptimizer(
                model, lambda out, target: LF.l1_loss(out, target),
                z_dim=Z_DIM, popsize=8, seed=5)

        # "crash" after 2 of 4 generations (finalize records meta_iter=2)
        make().optimize(targets, meta_steps=2, grad_steps=5,
                        last_grad_steps=10, checkpoint_path=path)
        # resume: picks up at generation 2, runs 2 and 3, then the final gen
        resumed = make().optimize(targets, meta_steps=4, grad_steps=5,
                                  last_grad_steps=10, checkpoint_path=path)
        straight = make().optimize(targets, meta_steps=4, grad_steps=5,
                                   last_grad_steps=10)
        np.testing.assert_allclose(np.asarray(straight["z"]),
                                   np.asarray(resumed["z"]),
                                   rtol=0, atol=1e-6)

    @pytest.mark.parametrize("mbs", [None, 3])
    def test_segmented_final_matches_one_scan(self, model, mbs):
        """The segmented final refinement (the axon long-scan-fault
        workaround, ``batched.py:_build_final_fns``) reproduces the
        single-program final trajectory: same ask, same per-step keys/step
        indices, bounded dispatches."""
        from pix2latent_tpu.optimizers.batched import BatchedBasinCMAOptimizer
        z_true = jax.random.normal(jax.random.PRNGKey(31), (2, Z_DIM))
        targets = model(z=z_true)

        def run(seg):
            opt = BatchedBasinCMAOptimizer(
                model, lambda out, target: LF.l1_loss(out, target),
                z_dim=Z_DIM, popsize=8, seed=7, max_batch_size=mbs)
            return opt.optimize(targets, meta_steps=2, grad_steps=5,
                                last_grad_steps=10, final_segment_steps=seg)

        one_scan = run(None)          # single 10-step final program
        segmented = run(4)            # 3 bounded dispatches: 4 + 4 + 2
        np.testing.assert_allclose(np.asarray(one_scan["z"]),
                                   np.asarray(segmented["z"]),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(one_scan["loss"]),
                                   np.asarray(segmented["loss"]),
                                   rtol=0, atol=1e-6)


class TestMultihost:
    """parallel/multihost.py: jax.distributed wrapper + local-row mapping."""

    def test_topology_single_process(self):
        from pix2latent_tpu.parallel import multihost
        info = multihost.topology()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8

    def test_local_population_rows_single_process(self):
        from pix2latent_tpu.parallel import make_mesh, multihost
        mesh = make_mesh()
        rows = multihost.local_population_rows(mesh, 24)
        assert list(rows) == list(range(24))
        with pytest.raises(AssertionError):
            multihost.local_population_rows(mesh, 23)  # not divisible

    def test_initialize_multihost_real_coordinator(self):
        """Run jax.distributed.initialize for real (single-process
        coordinator) in a subprocess so the main test process stays
        uninitialized. Non-tautological: asserts the distributed CLIENT
        actually exists afterwards (a swallowed init would leave it None),
        then shards a population over the global mesh."""
        import subprocess
        import sys
        import textwrap

        code = textwrap.dedent("""
            import os
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["XLA_FLAGS"] = \
                "--xla_force_host_platform_device_count=8"
            import sys; sys.path.insert(0, %r)
            # config updates are allowed pre-init; backend init is not
            # (the axon plugin overrides JAX_PLATFORMS, so force cpu)
            import jax
            jax.config.update("jax_platforms", "cpu")
            from pix2latent_tpu.parallel import (make_mesh, multihost,
                                                 shard_variables)
            info = multihost.initialize_multihost(
                coordinator_address="localhost:12397",
                num_processes=1, process_id=0)
            assert multihost._distributed_client() is not None, \\
                "jax.distributed did not actually initialize"
            assert info["process_count"] == 1, info
            assert info["global_devices"] == 8, info
            # idempotent second call
            info2 = multihost.initialize_multihost()
            assert info2 == info
            mesh = make_mesh()
            import jax.numpy as jnp
            vs = {"input": {"z": jnp.arange(24.0).reshape(24, 1)}}
            vs = shard_variables(vs, mesh)
            assert float(jnp.sum(vs["input"]["z"])) == sum(range(24))
            assert list(multihost.local_population_rows(mesh, 24)) == \\
                list(range(24))
            print("MH_OK")
        """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=300)
        assert "MH_OK" in r.stdout, (r.stdout, r.stderr[-2000:])

    def test_initialize_after_backend_raises_helpfully(self):
        """Calling after the XLA backend exists must fail LOUDLY (silent
        single-host degradation on a pod would compute garbage)."""
        import subprocess
        import sys
        import textwrap

        code = textwrap.dedent("""
            import os
            os.environ["JAX_PLATFORMS"] = "cpu"
            import sys; sys.path.insert(0, %r)
            import jax
            jax.config.update("jax_platforms", "cpu")  # axon overrides env
            jax.devices()                      # initialize the backend FIRST
            from pix2latent_tpu.parallel import multihost
            try:
                multihost.initialize_multihost(
                    coordinator_address="localhost:12398",
                    num_processes=1, process_id=0)
            except RuntimeError as e:
                assert "before any JAX call" in str(e), e
                print("RAISED_HELPFULLY")
        """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=300)
        assert "RAISED_HELPFULLY" in r.stdout, (r.stdout, r.stderr[-2000:])

    def test_pod_marker_init_failure_raises_loudly(self, monkeypatch):
        """When genuine pod markers triggered the init (>1 worker
        hostnames), a failed jax.distributed.initialize must NOT silently
        degrade to independent single-host runs (advisor round 2, medium)."""
        import jax

        from pix2latent_tpu.parallel import multihost

        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
        for v in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID", "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(v, raising=False)
        assert multihost._multi_host_markers()

        def boom(**kwargs):
            raise ConnectionError("coordinator unreachable")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="multi-host slice"):
            multihost.initialize_multihost()

    def test_no_config_is_noop(self):
        """Single-process with no distributed config must not try to spin
        up a coordinator (and must not raise)."""
        import subprocess
        import sys
        import textwrap

        code = textwrap.dedent("""
            import os
            os.environ["JAX_PLATFORMS"] = "cpu"
            for v in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                      "JAX_PROCESS_ID", "MEGASCALE_COORDINATOR_ADDRESS",
                      "TPU_WORKER_HOSTNAMES"):
                os.environ.pop(v, None)
            import sys; sys.path.insert(0, %r)
            import jax
            jax.config.update("jax_platforms", "cpu")
            from pix2latent_tpu.parallel import multihost
            info = multihost.initialize_multihost()
            assert multihost._distributed_client() is None
            assert info["process_count"] == 1
            print("NOOP_OK")
        """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=300)
        assert "NOOP_OK" in r.stdout, (r.stdout, r.stderr[-2000:])


class TestFusedCheckpointing:
    """checkpoint_path= on the FUSED drivers (VERDICT.md round 2, item 6):
    the fastest paths must be as crash-safe as the host loops, and resuming
    must continue the exact trajectory (same strategy state + RNG stream)."""

    def test_basincma_fused_resume_matches_uninterrupted(
            self, model, target_and_z, tmp_path):
        target, _ = target_and_z
        ckpt = str(tmp_path / "fused_basincma.npz")

        vm = make_vm(target, grad_free=True)
        full = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
        full.optimize_fused(meta_steps=4, grad_steps=3, last_grad_steps=5)
        sigma_full = float(full.cma_state.sigma)
        loss_full = np.asarray(full.loss)

        # phase 1: two generations, checkpointed, then "crash" (the final
        # long generation of this call runs but never touches the carry)
        vm2 = make_vm(target, grad_free=True)
        part = BasinCMAOptimizer(model, vm2, loss_fn, track_variables=False)
        part.optimize_fused(meta_steps=2, grad_steps=3, last_grad_steps=5,
                            checkpoint_path=ckpt)
        assert os.path.exists(ckpt)

        # phase 2: resume with the FULL budget -> only gens 2..3 re-run
        vm3 = make_vm(target, grad_free=True)
        res = BasinCMAOptimizer(model, vm3, loss_fn, track_variables=False)
        res.optimize_fused(meta_steps=4, grad_steps=3, last_grad_steps=5,
                           checkpoint_path=ckpt)
        assert abs(float(res.cma_state.sigma) - sigma_full) < 1e-6
        np.testing.assert_allclose(np.asarray(res.loss), loss_full,
                                   rtol=1e-5, atol=1e-6)

    def test_basincma_fused_records_loss_curve(self, model, target_and_z):
        target, _ = target_and_z
        vm = make_vm(target, grad_free=True)
        opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
        opt.optimize_fused(meta_steps=5, grad_steps=3, last_grad_steps=5)
        assert len(opt.losses) == 5          # one min tell loss per gen
        assert all(np.isfinite(v) for v in opt.losses)

    def test_hybrid_fused_resume_matches_uninterrupted(
            self, model, target_and_z, tmp_path):
        target, _ = target_and_z
        ckpt = str(tmp_path / "fused_hybrid.npz")

        def build():
            vm = make_vm(target, grad_free=True)
            return HybridNevergradOptimizer("TBPSA", model, vm, loss_fn,
                                            track_variables=False)

        full = build()
        full.optimize_fused(num_samples=6, meta_steps=4, grad_steps=3,
                            last_grad_steps=5)
        mean_full = np.asarray(full.ng_state.mean)
        loss_full = np.asarray(full.loss)

        part = build()
        part.optimize_fused(num_samples=6, meta_steps=2, grad_steps=3,
                            last_grad_steps=5, checkpoint_path=ckpt)
        res = build()
        res.optimize_fused(num_samples=6, meta_steps=4, grad_steps=3,
                           last_grad_steps=5, checkpoint_path=ckpt)
        np.testing.assert_allclose(np.asarray(res.ng_state.mean), mean_full,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.loss), loss_full,
                                   rtol=1e-5, atol=1e-6)
        assert len(res.losses) == 2          # gens 2..3 after resume


class TestNonImageModelOutput:
    """The drivers must not assume the model emits NHWC images: collage
    building (``_BaseOptimizer._final_results`` / ``log_result``) is
    image-only presentation and has to degrade gracefully for vector
    outputs (caught driving a linear model on the chip, round 5)."""

    def _setup(self, log):
        d_out = 24
        W = jax.random.normal(jax.random.PRNGKey(3), (Z_DIM, d_out)) / 2.0
        target = np.asarray(
            jax.random.normal(jax.random.PRNGKey(4), (Z_DIM,)) @ W)
        vm = VariableManager(seed=0)
        vm.register("z", shape=(Z_DIM,), var_type="input", grad_free=True,
                    distribution=dist.TruncatedNormalModulo(1.0, 2.0))
        vm.register("target", shape=(d_out,), var_type="output",
                    requires_grad=False, default=target)
        opt = CMAOptimizer(
            lambda z: z @ W, vm,
            lambda out, target: jnp.mean((out - target) ** 2, axis=-1),
            log=log)
        return opt

    def test_fused_returns_raw_outputs(self):
        opt = self._setup(log=False)
        variables, outs, losses = opt.optimize_fused(meta_steps=8,
                                                     grad_steps=0)
        assert np.asarray(outs[0]).ndim == 2      # raw [pop, d_out]
        assert np.isfinite(losses[-1][1]["loss"]).all()

    def test_host_loop_log_mode(self):
        opt = self._setup(log=True)
        variables, outs, losses = opt.optimize(meta_steps=6, grad_steps=0)
        assert len(losses) >= 1
        for o in outs:
            assert np.asarray(o).ndim == 2        # no uint8 collage frames
