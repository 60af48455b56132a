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
# stay float32): measured 205 img/s vs 122 img/s at f32 on TPU v5e with
# finite, converging losses. Override with PIX2LATENT_BENCH_DTYPE=float32.
_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
_DTYPE_NAME = os.environ.get("PIX2LATENT_BENCH_DTYPE", "bfloat16")
if _DTYPE_NAME not in _DTYPES:
    raise SystemExit(
        f"PIX2LATENT_BENCH_DTYPE={_DTYPE_NAME!r} — must be one of "
        f"{sorted(_DTYPES)}")
BENCH_DTYPE = _DTYPES[_DTYPE_NAME]

POP = 18            # reference CMA popsize for d=128
GRAD_STEPS = 30     # reference inner-loop budget per generation
WARMUP_GENS = 1
TIMED_GENS = 3


def main():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pix2latent_tpu.loss_functions as LF
        from pix2latent_tpu import VariableManager, distribution as dist, hooks
        from pix2latent_tpu.models.biggan import BigGAN
        from pix2latent_tpu.optimizers import BasinCMAOptimizer

        model = BigGAN("biggan-deep-256", dtype=BENCH_DTYPE)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0,
                                    dtype=BENCH_DTYPE)

        target = jnp.zeros((256, 256, 3), jnp.float32)
        weight = jnp.ones((256, 256, 3), jnp.float32)

        vm = VariableManager(seed=0)
        vm.register("z", shape=(128,), var_type="input", grad_free=True,
                    distribution=dist.TruncatedNormalModulo(sigma=1.0,
                                                            trunc=2.0),
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
        gen_fn = opt._fused_gens.setdefault(
            GRAD_STEPS, opt._build_fused_generation(GRAD_STEPS)) \
            if hasattr(opt, "_fused_gens") else None
        if gen_fn is None:
            opt._fused_gens = {GRAD_STEPS:
                               opt._build_fused_generation(GRAD_STEPS)}
            gen_fn = opt._fused_gens[GRAD_STEPS]

        state = opt.cma_state
        for i in range(WARMUP_GENS):
            state, gen_min = gen_fn(model.params, state, opt.next_key(),
                                    jnp.asarray(i, jnp.int32))
        jax.block_until_ready(gen_min)

        t0 = time.time()
        for i in range(TIMED_GENS):
            state, gen_min = gen_fn(model.params, state, opt.next_key(),
                                    jnp.asarray(i, jnp.int32))
        jax.block_until_ready(gen_min)
        dt = time.time() - t0

    steps = TIMED_GENS * GRAD_STEPS
    steps_per_sec = steps / dt
    images_per_sec = steps_per_sec * POP
    # one full reference inversion = 30*30+300 = 1200 fused steps
    inversions_per_hour = 3600.0 / (1200.0 / steps_per_sec)

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
            "full_inversions_per_hour": round(inversions_per_hour, 2),
            "baseline_estimate_images_per_sec":
                PYTORCH_V100_BASELINE_IMAGES_PER_SEC,
            "compute_dtype": str(BENCH_DTYPE.__name__),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
