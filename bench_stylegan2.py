"""Secondary benchmark: StyleGAN2-cars (512x512) BasinCMA throughput.

Same shape as the flagship bench but on the second model family
(BASELINE.md: LSUN-Cars 512^2, popsize 22 for d=512). Prints ONE JSON line.
The driver-facing headline benchmark remains ``bench.py``.
"""

import json
import os
import time
import warnings

import jax
import jax.numpy as jnp

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()

POP = 22          # reference popsize for d=512 (README.md:74)
GRAD_STEPS = 30
TIMED_GENS = 10

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
BENCH_DTYPE = _DTYPES[os.environ.get("PIX2LATENT_BENCH_DTYPE", "bfloat16")]


def _build(dtype):
    """(opt, gen_fn, defaults) for the StyleGAN2-cars BasinCMA problem —
    shared by this bench and ``scripts/profile_bench.py`` so the profiler
    always traces exactly the benched program."""
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager, hooks
    from pix2latent_tpu.models.stylegan2 import StyleGAN2
    from pix2latent_tpu.optimizers import BasinCMAOptimizer

    # PIX2LATENT_FUSED_MOD_BWD=1: route the style-modulation backward
    # through the fused Pallas kernel (ops/mod_backward.py) — the A/B
    # switch for the round-3 attack on the top profiled cost
    fused = os.environ.get("PIX2LATENT_FUSED_MOD_BWD", "0") == "1"
    # PIX2LATENT_PACK_PAIRS=<max_ch>: population-pair channel packing for
    # thin-channel blocks (stylegan2.py pack_pairs_max_ch; 64 packs the
    # res-512 block) — the A/B switch for the lane-padding-ceiling attack
    pack = int(os.environ.get("PIX2LATENT_PACK_PAIRS", "0"))
    model = StyleGAN2("cars", search="z", dtype=dtype, fused_mod_bwd=fused,
                      pack_pairs_max_ch=pack)
    loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)
    im = model.im_res

    vm = VariableManager(seed=0)
    vm.register("z", shape=(512,), var_type="input", grad_free=True,
                learning_rate=0.05,
                hook_fn=hooks.Compose(hooks.Normalize(),
                                      hooks.NormalPerturb(0.05)))
    vm.register("target", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=jnp.zeros((im, im, 3)))
    vm.register("weight", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=jnp.ones((im, im, 3)))

    opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
    opt.setup_cma(vm)
    assert opt.num_samples == POP, opt.num_samples
    gen_fn = opt._build_fused_generation(GRAD_STEPS)
    return opt, gen_fn, vm.defaults()


def main():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt, gen_fn, defaults = _build(BENCH_DTYPE)
        model = opt.model

        state = opt.cma_state
        state, gen_min = gen_fn(model.params, defaults, state, opt.next_key(),
                                jnp.asarray(0, jnp.int32))
        float(gen_min)   # warmup sync: a host value fetch, NOT
        # block_until_ready — the axon tunnel's block does not reliably
        # await completion (CLAUDE.md)

        times, span_t0 = [], time.time()
        for i in range(TIMED_GENS):
            t0 = time.time()
            state, gen_min = gen_fn(model.params, defaults, state,
                                    opt.next_key(),
                                    jnp.asarray(i + 1, jnp.int32))
            jax.block_until_ready(gen_min)   # backpressure diagnostic
            times.append(time.time() - t0)
        float(gen_min)                       # terminal true sync
        span = time.time() - span_t0

        from bench import mfu_fields, step_flops
        gen_time = span / TIMED_GENS
        mfu = mfu_fields(step_flops(opt, defaults), gen_time,
                         GRAD_STEPS, POP)

    import numpy as np
    times = np.asarray(times)
    steps_per_sec = GRAD_STEPS / gen_time
    print(json.dumps({
        "metric": "StyleGAN2-cars-512 BasinCMA images/sec/chip",
        "value": round(steps_per_sec * POP, 2),
        "unit": "images/sec",
        "vs_baseline": None,
        "detail": {"steps_per_sec": round(steps_per_sec, 3),
                   "population": POP,
                   "timed_generations": TIMED_GENS,
                   "gen_time_mean_s": round(gen_time, 4),
                   "gen_time_std_s": round(float(times.std()), 4),
                   "compute_dtype": str(BENCH_DTYPE.__name__),
                   "backend": jax.default_backend(),
                   **mfu},
    }))


if __name__ == "__main__":
    main()
