"""Adjudicate the eval-only host-loop overhead (VERDICT.md round 3, weak #2).

``CMAOptimizer.optimize`` (reference budget 200 meta evals,
``/root/reference/examples/invert_biggan_cma.py:108``) and
``NevergradOptimizer.optimize`` (budget 1000,
``examples/invert_biggan_nevergrad.py:111``) run one host round trip per
generation with grad_steps=0 — each generation is milliseconds of device
work (ask + two population forwards + tell; the reference double-evaluates
too: ``cma_optimizer.py:46-57`` steps, then ``base_cma_optimizer.py:113-114``
re-evaluates inside cma_update), so the per-generation host/dispatch
overhead could be a material fraction. This script measures it directly on
chip:

  host   — the exact CMAOptimizer/NevergradOptimizer loop body
            (cma_init -> core.eval -> cma_update), ~5 dispatches/generation
  fused  — the BasinCMA/Hybrid fused generation with grad_steps=0
            (ask + tell eval + strategy update in ONE dispatch/generation)

Timing is value-fetch bounded (a host fetch of a scalar reachable only
through the final strategy state — axon's block_until_ready is unreliable,
CLAUDE.md). Prints ONE JSON line with s/gen for both paths and the overhead
fraction; the decision rule (BASELINE.md): promote fused eval-only drivers
only if host overhead > 5%.
"""

import argparse
import json
import sys
import time
import warnings

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()


def _problem(dtype, grad_free=True):
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager, distribution as dist, hooks
    from pix2latent_tpu.models.biggan import BigGAN

    model = BigGAN("biggan-deep-256", dtype=dtype)
    loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 255.0
    target = jnp.asarray(
        np.stack([xx, yy, 0.5 * (xx + yy)], axis=-1) * 2.0 - 1.0)

    vm = VariableManager(seed=0)
    vm.register("z", shape=(128,), var_type="input", grad_free=grad_free,
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=jnp.zeros((128,)))
    vm.register("target", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(256, 256, 3), var_type="output",
                requires_grad=False,
                default=jnp.ones((256, 256, 3), jnp.float32))
    return model, vm, loss_fn


def _sync_scalar(state):
    """Host fetch of a scalar reachable only through the full state chain."""
    leaf = jax.tree.leaves(state)[0]
    return float(jnp.sum(leaf))


def time_host_cma(opt, n_gens, warmup):
    """The exact CMAOptimizer.optimize generation body (eval + fresh-loss
    tell), timed value-fetch bounded."""
    for i in range(warmup):
        variables = opt.cma_init(opt.var_manager)
        opt.core.eval(variables, opt.next_key(), i)
        opt.cma_update(variables, inverted_loss=True, step=i)
    _sync_scalar(opt.cma_state)

    t0 = time.time()
    for i in range(n_gens):
        variables = opt.cma_init(opt.var_manager)
        opt.core.eval(variables, opt.next_key(), i)
        opt.cma_update(variables, inverted_loss=True, step=i)
    _sync_scalar(opt.cma_state)
    return (time.time() - t0) / n_gens


def time_host_ng(opt, n_gens, warmup):
    """The exact NevergradOptimizer.optimize generation body."""
    for i in range(warmup):
        variables = opt.ng_init(opt.var_manager)
        opt.core.eval(variables, opt.next_key(), i)
        opt.ng_update(variables, inverted_loss=True, step=i)
    _sync_scalar(opt.ng_state)

    t0 = time.time()
    for i in range(n_gens):
        variables = opt.ng_init(opt.var_manager)
        opt.core.eval(variables, opt.next_key(), i)
        opt.ng_update(variables, inverted_loss=True, step=i)
    _sync_scalar(opt.ng_state)
    return (time.time() - t0) / n_gens


def time_fused(opt, gen_fn, state, defaults, n_gens, warmup):
    """One-dispatch-per-generation (grad_steps=0) eval-only loop."""
    key = jax.random.PRNGKey(3)
    gen_min = None
    for i in range(warmup):
        key, sub = jax.random.split(key)
        state, gen_min = gen_fn(opt.model.params, defaults, state, sub,
                                jnp.asarray(i, jnp.int32))
    if gen_min is not None:
        float(gen_min)

    t0 = time.time()
    for i in range(n_gens):
        key, sub = jax.random.split(key)
        state, gen_min = gen_fn(opt.model.params, defaults, state, sub,
                                jnp.asarray(i, jnp.int32))
    float(gen_min)
    return (time.time() - t0) / n_gens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--ng_method", default="CMA")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from pix2latent_tpu.optimizers import (BasinCMAOptimizer, CMAOptimizer,
                                           HybridNevergradOptimizer,
                                           NevergradOptimizer)

    detail = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model, vm, loss_fn = _problem(dtype)

        # -- CMA eval-only: host loop vs fused one-dispatch generation ----- #
        opt = CMAOptimizer(model, vm, loss_fn, track_variables=False)
        opt.setup_cma(vm)
        host_cma = time_host_cma(opt, args.gens, args.warmup)

        fopt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
        fopt.setup_cma(vm)
        gen_fn = fopt._build_fused_generation(0)   # grad_steps=0: pure eval
        fused_cma = time_fused(fopt, gen_fn, fopt.cma_state, vm.defaults(),
                               args.gens, args.warmup)
        detail["cma"] = {
            "host_s_per_gen": round(host_cma, 4),
            "fused_s_per_gen": round(fused_cma, 4),
            "host_overhead_pct": round(100 * (host_cma / fused_cma - 1), 1),
            "budget_gens": 200,
            "budget_delta_s": round(200 * (host_cma - fused_cma), 1),
        }

        # -- NG eval-only (registry strategy): same comparison -------------- #
        nopt = NevergradOptimizer(args.ng_method, model, vm, loss_fn,
                                  track_variables=False)
        nopt.setup_ng(vm, 18, budget=1000 * 18)
        host_ng = time_host_ng(nopt, args.gens, args.warmup)

        hopt = HybridNevergradOptimizer(args.ng_method, model, vm, loss_fn,
                                        track_variables=False)
        hopt.setup_ng(vm, 18, budget=1000 * 18)
        hgen_fn = hopt._build_fused_generation(0)
        fused_ng = time_fused(hopt, hgen_fn, hopt.ng_state, vm.defaults(),
                              args.gens, args.warmup)
        detail["ng"] = {
            "method": args.ng_method,
            "host_s_per_gen": round(host_ng, 4),
            "fused_s_per_gen": round(fused_ng, 4),
            "host_overhead_pct": round(100 * (host_ng / fused_ng - 1), 1),
            "budget_gens": 1000,
            "budget_delta_s": round(1000 * (host_ng - fused_ng), 1),
        }

    worst = max(detail["cma"]["host_overhead_pct"],
                detail["ng"]["host_overhead_pct"])
    print(json.dumps({
        "metric": "eval-only host-loop overhead vs fused one-dispatch "
                  "generation (BigGAN-256, pop 18)",
        "value": worst,
        "unit": "percent",
        "vs_baseline": None,
        "detail": {**detail, "compute_dtype": args.dtype,
                   "backend": jax.default_backend(),
                   "decision_rule": "promote fused eval-only drivers "
                                    "only if host overhead > 5%"},
    }))


if __name__ == "__main__":
    main()
