"""Benchmark: BigGAN-256 BasinCMA inversion throughput on one TPU chip.

Measures the flagship workload (BASELINE.md): BasinCMA on BigGAN-deep-256
with the ProjectionLoss (masked L1 + 10x LPIPS-alex), population 18, the
reference's exact budget shape (30 inner Adam steps per generation,
``examples/invert_biggan_basincma.py:109``). Reported metric:

    images/sec/chip = (population x fused fwd+bwd+Adam steps) / second

i.e. generator evaluations per second during steady-state BasinCMA — the
quantity that divides the reference's fixed 21.6k-eval budget into wall time.

``vs_baseline`` compares against PYTORCH_V100_BASELINE below: the estimated
steady-state rate of the reference implementation on its era hardware
(BigGAN-deep-256 fwd+bwd ~180 GFLOPs/image at V100 fp32 ~15 TFLOP/s peak and
the reference's max_batch_size=9 chunking + per-step host sync,
``closure.py:60``) — no upstream-published numbers exist (BASELINE.md).

Quality gate: alongside throughput, the JSON carries the per-generation best
tell loss of a short fixed-seed run in the bench dtype AND in float32
(``final_loss`` / ``final_loss_f32`` / ``f32_delta``), so a perf change that
silently breaks optimization fails loudly. Timing uses >= 10 generations with
per-generation wall times (mean + stddev); the CMA state evolves between
dispatches, so the axon runtime's dispatch memoization cannot fake the
numbers.

Prints ONE JSON line. Weights are random-init (zero-egress environment):
identical FLOPs/memory traffic to the pretrained checkpoint.
"""

import json
import os
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()

PYTORCH_V100_BASELINE_IMAGES_PER_SEC = 30.0

# bfloat16 generator/LPIPS compute (variables, Adam state and loss pooling
# stay float32). Override with PIX2LATENT_BENCH_DTYPE=float32.
_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
_DTYPE_NAME = os.environ.get("PIX2LATENT_BENCH_DTYPE", "bfloat16")
if _DTYPE_NAME not in _DTYPES:
    raise SystemExit(
        f"PIX2LATENT_BENCH_DTYPE={_DTYPE_NAME!r} — must be one of "
        f"{sorted(_DTYPES)}")
BENCH_DTYPE = _DTYPES[_DTYPE_NAME]

POP = 18            # reference CMA popsize for d=128
GRAD_STEPS = 30     # reference inner-loop budget per generation
WARMUP_GENS = 2
TIMED_GENS = 12
QUALITY_GENS = 5    # fixed-seed convergence check (bench dtype vs f32)


def _build(dtype):
    """(opt, gen_fn, defaults) for a BigGAN-256 BasinCMA problem at dtype."""
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager, distribution as dist, hooks
    from pix2latent_tpu.models.biggan import BigGAN
    from pix2latent_tpu.optimizers import BasinCMAOptimizer

    model = BigGAN("biggan-deep-256", dtype=dtype)
    loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)

    # fixed non-trivial target: a smooth ramp (a zero target makes the
    # masked-L1 trivially separable; a ramp keeps both loss terms active)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 255.0
    target = jnp.asarray(
        np.stack([xx, yy, 0.5 * (xx + yy)], axis=-1) * 2.0 - 1.0)
    weight = jnp.ones((256, 256, 3), jnp.float32)

    vm = VariableManager(seed=0)
    vm.register("z", shape=(128,), var_type="input", grad_free=True,
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=jnp.zeros((128,)))
    vm.register("target", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=weight)

    opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
    opt.setup_cma(vm)
    assert opt.num_samples == POP, opt.num_samples

    # fused generation: ask + 30 scanned fwd/bwd/Adam steps + inverted
    # tell + CMA update in ONE XLA dispatch (optimize_fused machinery)
    gen_fn = opt._build_fused_generation(GRAD_STEPS)
    return opt, gen_fn, vm.defaults()


TPU_V5E_PEAK_BF16_FLOPS = 197e12   # per-chip MXU peak (bf16)


def step_flops(opt, defaults):
    """HLO FLOPs of ONE fused fwd+bwd inner step over the population, via
    the compiled XLA cost analysis (the machinery behind BASELINE.md's
    162 GFLOP/image figure). Measured on a standalone single-step program
    because the cost analysis counts a ``lax.scan`` body ONCE, not times
    its trip count — analyzing the whole generation underreports ~30x.
    Returns None when the backend can't report it (never fails the bench)."""
    try:
        import jax as _jax
        core, vm = opt.core, opt.var_manager
        variables = vm.initialize(num_samples=opt.num_samples,
                                  key=_jax.random.PRNGKey(0),
                                  defaults=defaults)
        variables = core._dedupe_outputs(variables)
        ctx = core._make_ctx(variables)
        # return the FULL (per_sample, out, grads) tuple: selecting only the
        # losses lets XLA dead-code-eliminate the whole backward pass and
        # the analysis reports forward-only FLOPs (measured 59.6 forward-only
        # vs 122.8 GFLOP/image for the full fwd+bwd program; BASELINE.md's
        # older 162 figure came from a hand-derived f32 estimate)
        f = _jax.jit(lambda p, v, c: core._value_and_grad(p, v, c))
        ca = f.lower(opt.model.params, variables, ctx).compile()\
             .cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        v = float(ca.get("flops", 0.0))
        return v if v > 0 else None
    except Exception:
        return None


def mfu_fields(flops_per_step, gen_time_s, grad_steps, pop):
    """achieved TFLOP/s + MFU (vs the bf16 MXU peak) — makes the
    structural-ceiling claims in BASELINE.md mechanically auditable each
    round (VERDICT.md round 3, weak #6). Counts the generation's inner-loop
    FLOPs only (the CMA ask/tell and tell-eval are excluded), so achieved
    TFLOP/s is a slight lower bound."""
    if not flops_per_step or not gen_time_s:
        return {"achieved_tflops": None, "mfu_vs_bf16_peak": None,
                "gflops_per_image": None}
    achieved = flops_per_step * grad_steps / gen_time_s
    return {
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_vs_bf16_peak": round(achieved / TPU_V5E_PEAK_BF16_FLOPS, 4),
        "gflops_per_image": round(flops_per_step / pop / 1e9, 1),
    }


def _run_gens(opt, gen_fn, defaults, n_gens, seed, state=None,
              time_each=False):
    """Run ``n_gens`` fused generations. Returns (state, gen_mins, times).

    Timing integrity on the axon tunnel: ``jax.block_until_ready`` does NOT
    reliably await device completion here (CLAUDE.md), so when timing we
    bound the WHOLE span with a host value fetch of the last generation's
    scalar ``gen_min`` — via the CMA-state dependency chain that cannot
    complete before every dispatch has executed, and the one ~25 ms
    tunnel round-trip amortizes to <0.2% over the span. Per-generation
    wall times (dispatch-queue backpressure) are kept as a variance
    diagnostic. Both paths end fully synchronized: the final
    ``[float(m) for m in mins]`` fetch drains every queued generation (so
    warmup work cannot bleed into a subsequent timed span).
    """
    if state is None:
        opt.setup_cma(opt.var_manager)   # fresh CMA state
        state = opt.cma_state
    key = jax.random.PRNGKey(seed)
    mins, times = [], []
    span_t0 = time.time()
    for i in range(n_gens):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, gen_min = gen_fn(opt.model.params, defaults, state, sub,
                                jnp.asarray(i, jnp.int32))
        if time_each:
            jax.block_until_ready(gen_min)
            times.append(time.time() - t0)
        mins.append(gen_min)
    mins = [float(m) for m in mins]      # terminal fetch = true sync point
    span = time.time() - span_t0
    if time_each:
        return state, mins, (span, times)
    return state, mins, times


def main():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt, gen_fn, defaults = _build(BENCH_DTYPE)

        # ---- throughput: warmup, then value-fetch-bounded span ----------- #
        state, _, _ = _run_gens(opt, gen_fn, defaults, WARMUP_GENS, seed=17)
        state, timed_mins, (span, times) = _run_gens(
            opt, gen_fn, defaults, TIMED_GENS, seed=18, state=state,
            time_each=True)
        times = np.asarray(times)
        gen_time = span / TIMED_GENS
        steps_per_sec = GRAD_STEPS / gen_time
        images_per_sec = steps_per_sec * POP

        # ---- quality gate: fixed-seed short run, bench dtype vs f32 ------ #
        _, q_mins, _ = _run_gens(opt, gen_fn, defaults, QUALITY_GENS, seed=42)
        final_loss = q_mins[-1]
        assert np.isfinite(q_mins).all(), f"non-finite tell losses: {q_mins}"
        assert final_loss < q_mins[0], (
            f"no convergence: gen0 {q_mins[0]} -> gen{QUALITY_GENS} "
            f"{final_loss}")

        if BENCH_DTYPE is jnp.float32:
            final_loss_f32, f32_delta = final_loss, 0.0
        else:
            opt32, gen_fn32, defaults32 = _build(jnp.float32)
            _, q32_mins, _ = _run_gens(opt32, gen_fn32, defaults32,
                                       QUALITY_GENS, seed=42)
            final_loss_f32 = q32_mins[-1]
            f32_delta = abs(final_loss - final_loss_f32) / final_loss_f32
            assert f32_delta < 0.15, (
                f"{_DTYPE_NAME} diverged from f32: {final_loss} vs "
                f"{final_loss_f32} (delta {f32_delta:.3f})")

    # one full reference inversion = 30*30+300 = 1200 fused steps
    inversions_per_hour = 3600.0 / (1200.0 / steps_per_sec)

    # achieved TFLOP/s + MFU of the timed program (cost analysis of a
    # standalone single-step program; compile cached, no timed device work)
    mfu = mfu_fields(step_flops(opt, defaults), gen_time, GRAD_STEPS, POP)

    result = {
        "metric": "BigGAN-256 BasinCMA images/sec/chip "
                  "(pop x fused fwd+bwd+Adam steps, incl. CMA ask/tell)",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(
            images_per_sec / PYTORCH_V100_BASELINE_IMAGES_PER_SEC, 2),
        "detail": {
            "steps_per_sec": round(steps_per_sec, 3),
            "population": POP,
            "grad_steps_per_generation": GRAD_STEPS,
            "timed_generations": TIMED_GENS,
            "gen_time_mean_s": round(gen_time, 4),
            "gen_time_std_s": round(float(times.std()), 4),
            "images_per_sec_std": round(
                float(images_per_sec * times.std() / gen_time), 2),
            "final_loss": round(final_loss, 5),
            "final_loss_f32": round(final_loss_f32, 5),
            "f32_delta": round(f32_delta, 4),
            "quality_generations": QUALITY_GENS,
            "full_inversions_per_hour": round(inversions_per_hour, 2),
            "baseline_estimate_images_per_sec":
                PYTORCH_V100_BASELINE_IMAGES_PER_SEC,
            "compute_dtype": _DTYPE_NAME,
            "backend": jax.default_backend(),
            **mfu,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
