"""Execution-core unit tests: output dedupe, microbatch chunk selection,
and the memory-layout invariants found on real hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager, hooks
from pix2latent_tpu.core.step import ExecutionCore
from pix2latent_tpu.models.toy import make_toy_model


@pytest.fixture()
def setup():
    model = make_toy_model(z_dim=4, res=8, width=8, seed=0)
    vm = VariableManager(seed=0)
    vm.register("z", shape=(4,), var_type="input")
    vm.register("target", shape=(8, 8, 3), var_type="output",
                requires_grad=False, default=jnp.zeros((8, 8, 3)))
    vm.register("weight", shape=(8, 8, 3), var_type="output",
                requires_grad=False, default=jnp.ones((8, 8, 3)))
    loss = lambda out, target, weight: LF.masked_l1_loss(out, target, weight)
    return model, vm, loss


class TestDedupeOutputs:
    def test_constant_outputs_shrink_to_one_row(self, setup):
        model, vm, loss = setup
        core = ExecutionCore(model, vm, loss)
        v = vm.initialize(6)
        d = core._dedupe_outputs(v)
        assert d["output"]["target"].shape[0] == 1
        assert d["output"]["weight"].shape[0] == 1
        assert d["input"]["z"].shape[0] == 6

    def test_transformed_output_not_deduped(self, setup):
        model, vm, loss = setup
        core = ExecutionCore(model, vm, loss)
        core.register_transform(lambda ims, t, invert=False: ims, "z",
                                "target")
        v = vm.initialize(6)
        d = core._dedupe_outputs(v)
        assert d["output"]["target"].shape[0] == 6   # per-sample warps differ
        assert d["output"]["weight"].shape[0] == 1

    def test_hooked_output_not_deduped(self, setup):
        model, vm, loss = setup
        vm.edit_variable("weight", {"hook_fn": hooks.NormalPerturb(0.1)})
        core = ExecutionCore(model, vm, loss)
        d = core._dedupe_outputs(vm.initialize(4))
        assert d["output"]["weight"].shape[0] == 4

    def test_dedupe_is_loss_exact(self, setup, key):
        model, vm, loss = setup
        core = ExecutionCore(model, vm, loss)
        v = vm.initialize(5)
        v["input"]["z"] = jax.random.normal(key, (5, 4))
        _, (ps_full, _) = core._forward_loss(model.params, v)
        _, (ps_dedup, _) = core._forward_loss(model.params,
                                              core._dedupe_outputs(v))
        np.testing.assert_allclose(np.asarray(ps_full), np.asarray(ps_dedup),
                                   atol=1e-6)


class TestChunkSelection:
    @pytest.mark.parametrize("pop,mbs,expect,pad", [
        (22, 6, 4, 2), (22, 11, 2, 0), (18, 9, 2, 0), (18, 5, 4, 2),
        (10, 4, 3, 2), (7, 4, 2, 1), (6, 6, 1, 0), (6, None, 1, 0),
    ])
    def test_chunk_spec(self, setup, pop, mbs, expect, pad):
        """Chunks are exactly mbs rows with a wrap-padded last chunk — the
        old nearest-divisor rule silently over-serialized awkward pops
        (22/6 ran 11 chunks of 2; a prime pop degenerated to chunks of 1)."""
        model, vm, loss = setup
        core = ExecutionCore(model, vm, loss, max_batch_size=mbs)
        v = vm.initialize(pop)
        n, chunk, got_pad = core._chunk_spec(v)
        assert (n, got_pad) == (expect, pad)
        assert core._n_chunks(v) == expect
        if mbs is not None and pop > mbs:
            assert chunk == mbs

    def test_pop_ignores_deduped_rows(self, setup):
        model, vm, loss = setup
        core = ExecutionCore(model, vm, loss, max_batch_size=2)
        v = core._dedupe_outputs(vm.initialize(6))
        assert core._pop(v) == 6
        assert core._n_chunks(v) == 3

    @pytest.mark.parametrize("pop,mbs", [(7, 4), (6, 2)])
    def test_per_sample_ctx_is_chunked(self, pop, mbs):
        """Per-sample precomputed loss context must chunk WITH the
        population: a per-sample transform warps the target per sample, so
        ``loss_fn.precompute`` returns pop-leading tensors. Leaving them
        whole under the chunked map broadcast against the chunk and mixed
        rows (silently, when the old divisor rule picked chunks of 1)."""
        from pix2latent_tpu.transform import SpatialTransform
        model = make_toy_model(z_dim=4, res=8, width=8, seed=0)
        vm = VariableManager(seed=0)
        vm.register("z", shape=(4,), var_type="input")
        vm.register("target", shape=(8, 8, 3), var_type="output",
                    requires_grad=False, default=jnp.zeros((8, 8, 3)))
        vm.register("weight", shape=(8, 8, 3), var_type="output",
                    requires_grad=False, default=jnp.ones((8, 8, 3)))
        vm.register("t", shape=(3,), var_type="transform",
                    requires_grad=False,
                    grad_free=(np.array([1.0, 0.0, 0.0]), 0.3))
        loss = LF.ReconstructionLoss(loss_type="l1")

        def run(mbs):
            core = ExecutionCore(model, vm, loss, max_batch_size=mbs)
            core.register_transform(SpatialTransform(sensitivity=0.5),
                                    "t", "target")
            v = vm.initialize(pop, key=jax.random.PRNGKey(0))
            v["input"]["z"] = jax.random.normal(jax.random.PRNGKey(1),
                                                (pop, 4))
            v["transform"]["t"] = jnp.asarray(
                np.stack([[1.0, 0.05 * i, 0.0] for i in range(pop)]))
            v = core.apply_transforms(v)
            v = core._dedupe_outputs(v)
            ctx = core._make_ctx(v)
            assert ctx is not None
            assert any(jnp.ndim(a) > 0 and a.shape[0] == pop
                       for a in jax.tree.leaves(ctx))
            ps, out, g = core._value_and_grad(model.params, v, ctx)
            return (np.asarray(ps), np.asarray(out),
                    np.asarray(g["input"]["z"]))

        ps0, out0, g0 = run(None)
        ps1, out1, g1 = run(mbs)
        np.testing.assert_allclose(ps0, ps1, atol=1e-6)
        np.testing.assert_allclose(out0, out1, atol=1e-6)
        np.testing.assert_allclose(g0, g1, atol=1e-6)


class TestDonation:
    def test_grad_steps_usable_after_donation(self, setup, key):
        """variables/opt_state are donated to the scan; the returned values
        must be fully usable and the old references never reused by the
        drivers (this exercises the driver pattern)."""
        model, vm, loss = setup
        core = ExecutionCore(model, vm, loss)
        v = vm.initialize(3)
        st = core.init_opt_state(v)
        v, st, out, ys = core.grad_steps(v, st, key, 4)
        # chain a second call on the returned values
        v, st, out, ys = core.grad_steps(v, st, key, 4, start_step=4)
        assert np.isfinite(np.asarray(ys["loss"])).all()


class TestBringYourOwnGenerator:
    """The reference's README template: plug an arbitrary callable model and
    a lambda loss into VariableManager + GradientOptimizer
    (``/root/reference/README.md:89-118``). A bare function (no Flax, no
    params) must drive the whole stack."""

    def test_plain_function_model_inverts(self, key):
        import numpy as np

        from pix2latent_tpu import VariableManager
        from pix2latent_tpu.optimizers import GradientOptimizer

        proj = jax.random.normal(key, (8, 4 * 4 * 3))

        def generator(z):                       # (**inputs) -> NHWC image
            return jnp.tanh(z @ proj).reshape(-1, 4, 4, 3)

        z_true = jax.random.normal(jax.random.PRNGKey(3), (1, 8))
        target = generator(z_true)[0]

        def loss_fn(out, target):               # lambda-style loss
            return jnp.mean(jnp.abs(target - out), axis=(1, 2, 3))

        vm = VariableManager(seed=0)
        vm.register("z", shape=(8,), var_type="input", learning_rate=0.1)
        vm.register("target", shape=(4, 4, 3), var_type="output",
                    requires_grad=False, default=target)

        opt = GradientOptimizer(generator, vm, loss_fn)
        variables, outs, losses = opt.optimize(num_samples=4, grad_steps=200)
        assert float(np.asarray(losses[-1][1]["loss"]).min()) < 0.02

    def test_function_model_with_params(self, key):
        from pix2latent_tpu.models.base import FunctionModel

        w = jax.random.normal(key, (8, 8))
        m = FunctionModel(lambda params, z: z @ params, params=w)
        out = m(z=jnp.ones((2, 8)))
        assert out.shape == (2, 8)
        # params travel as arguments (cache rule), not closures
        out2 = m.apply(2.0 * w, z=jnp.ones((2, 8)))
        assert float(jnp.max(jnp.abs(out2 - 2.0 * out))) < 1e-6


class TestSegmentedGradSteps:
    """Library-level long-scan segmentation (``core/step.py:grad_steps``):
    budgets past ``segment_steps`` run as bounded per-dispatch scan segments
    whose trajectory is bit-equal to the single scan — the axon TPU worker
    faults on single scans >=300-500 steps over a big forward (CLAUDE.md),
    so segmentation is a library property, not a bench trick (VERDICT.md
    round 4, task 2)."""

    def _problem(self, hook=True):
        model = make_toy_model(z_dim=4, res=8, width=8, seed=0)
        z_true = jax.random.normal(jax.random.PRNGKey(5), (1, 4))
        target = model(z=z_true)[0]
        vm = VariableManager(seed=0)
        vm.register("z", shape=(4,), var_type="input", learning_rate=0.05,
                    hook_fn=hooks.NormalPerturb(0.01) if hook else None)
        vm.register("target", shape=(8, 8, 3), var_type="output",
                    requires_grad=False, default=target)
        loss = lambda out, target: LF.l1_loss(out, target)
        return model, vm, loss

    def _init(self, core, vm, pop=5):
        v = vm.initialize(pop, key=jax.random.PRNGKey(11))
        return v, core.init_opt_state(v)

    @pytest.mark.parametrize("seg", [3, 4, 10])
    def test_trajectory_equals_single_scan(self, seg):
        """Same master key, same step indices -> segmented == one scan,
        including the per-step hook noise (the keys are the one-scan
        program's exact splits)."""
        model, vm, loss = self._problem(hook=True)
        key = jax.random.PRNGKey(42)

        core1 = ExecutionCore(model, vm, loss, segment_steps=None)
        v1, s1 = self._init(core1, vm)
        v1, s1, out1, ys1 = core1.grad_steps(v1, s1, key, 10, start_step=7)

        core2 = ExecutionCore(model, vm, loss, segment_steps=seg)
        v2, s2 = self._init(core2, vm)
        v2, s2, out2, ys2 = core2.grad_steps(v2, s2, key, 10, start_step=7)

        np.testing.assert_array_equal(np.asarray(v1["input"]["z"]),
                                      np.asarray(v2["input"]["z"]))
        np.testing.assert_array_equal(np.asarray(ys1["loss"]),
                                      np.asarray(ys2["loss"]))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_tracked_concatenates_across_segments(self):
        model, vm, loss = self._problem(hook=False)
        core = ExecutionCore(model, vm, loss, track_variables=True,
                             segment_steps=4)
        v, s = self._init(core, vm)
        _, _, _, ys = core.grad_steps(v, s, jax.random.PRNGKey(0), 10)
        assert ys["tracked"]["z"].shape == (10, 5, 4)
        assert ys["loss"].shape == (10, 5)

    def test_checkpoint_resume_after_crash(self, tmp_path):
        """Kill the run mid-segment; the resumed call (fresh initial state,
        replayed key — what a restarted driver passes) continues from the
        one-behind checkpoint and lands on the uninterrupted trajectory."""
        model, vm, loss = self._problem(hook=True)
        key = jax.random.PRNGKey(9)
        p = str(tmp_path / "final.ckpt")

        core = ExecutionCore(model, vm, loss, segment_steps=3)
        v0, s0 = self._init(core, vm)
        expected, _, _, eys = core.grad_steps(v0, s0, key, 10)

        core2 = ExecutionCore(model, vm, loss, segment_steps=3)
        cache_key = ("grad_scan_xs", (("track", False),))
        real = core2._get("grad_scan_xs", track=False)
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("injected crash")
            return real(*a, **k)

        core2._compiled[cache_key] = flaky
        v0, s0 = self._init(core2, vm)
        with pytest.raises(RuntimeError, match="injected crash"):
            core2.grad_steps(v0, s0, key, 10, checkpoint_path=p)
        core2._compiled[cache_key] = real

        # restart: fresh initial state + same key, as a replaying driver
        v0, s0 = self._init(core2, vm)
        v2, _, _, ys2 = core2.grad_steps(v0, s0, key, 10, checkpoint_path=p)
        np.testing.assert_array_equal(np.asarray(expected["input"]["z"]),
                                      np.asarray(v2["input"]["z"]))
        # post-resume losses match the tail of the uninterrupted run
        n_tail = ys2["loss"].shape[0]
        assert 0 < n_tail < 10
        np.testing.assert_array_equal(np.asarray(eys["loss"])[-n_tail:],
                                      np.asarray(ys2["loss"]))

        # a re-run of the COMPLETED checkpoint skips all compute and
        # returns the checkpointed variables
        v0, s0 = self._init(core2, vm)
        v3, _, out3, ys3 = core2.grad_steps(v0, s0, key, 10,
                                            checkpoint_path=p)
        np.testing.assert_array_equal(np.asarray(expected["input"]["z"]),
                                      np.asarray(v3["input"]["z"]))
        assert out3.shape == (5, 8, 8, 3)
        assert ys3["loss"].shape[0] == 1

    def test_gradient_optimizer_end_to_end_equal(self):
        """Driver-level: GradientOptimizer trajectories are independent of
        the segmentation config (same seed, same budget)."""
        from pix2latent_tpu.optimizers import GradientOptimizer

        def run(seg):
            model, vm, loss = self._problem(hook=True)
            opt = GradientOptimizer(model, vm, loss, seed=3,
                                    track_variables=False, segment_steps=seg)
            variables, _, losses = opt.optimize(num_samples=4, grad_steps=12)
            return np.asarray(variables["input"]["z"]), losses[-1][1]["loss"]

        z_one, l_one = run(None)
        z_seg, l_seg = run(5)
        np.testing.assert_array_equal(z_one, z_seg)
        np.testing.assert_array_equal(np.asarray(l_one), np.asarray(l_seg))
