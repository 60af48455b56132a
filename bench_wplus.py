"""w+ search benchmark: StyleGAN2-cars 512² inversion in w space.

The d≈500-dim w latent (plus the ~350k-dim flattened per-layer noise vector
refined by Adam) is the workload the low-rank LM-MA-ES strategy exists for:
full-covariance CMA paired with the w+ forward reproducibly faults the axon
TPU runtime (CLAUDE.md), so the verified gradient-free recipes are LMMAES
and DiagonalCMA (hybrid outer loop × Adam inner), with plain Adam as the
gradient baseline. Reference recipe: ``pix2latent/model/stylegan2.py:99-138``
(w+ mode) + ``examples/invert_stylegan2_cars_hybrid_ng.py`` budgets
(30 meta × 50 inner + 300 final; Adam: 500 steps).

Measures END-TO-END wall-clock of the full reference budget per method and
the final best loss (``_final_results`` fetches the output images to host —
a true terminal sync through the axon tunnel; the fused loops' one-behind
loss fetches keep the dispatch queue backpressured and the span honest).

Prints ONE JSON line; headline value = LMMAES effective images/sec/chip.
"""

import argparse
import json
import os
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()

POP = 22

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
BENCH_DTYPE = _DTYPES[os.environ.get("PIX2LATENT_BENCH_DTYPE", "bfloat16")]


def _build_model(dtype):
    from pix2latent_tpu.models.stylegan2 import StyleGAN2
    return StyleGAN2("cars", search="w+", dtype=dtype)


def _make_vm(model, target, weight, loss_mask, grad_free):
    """The canonical w+ registration (examples/common.py
    ``register_stylegan2_vars`` with --search w+): w seeded at the mean
    latent with a floored sigma, flattened noise vector as an Adam-only
    variable."""
    from pix2latent_tpu import VariableManager, distribution as dist, hooks

    im = model.im_res
    w_mean, w_std = model.latent_stats()
    w_sigma = max(0.1 * float(w_std), 0.05)
    gf = (np.asarray(w_mean), w_sigma) if grad_free else False

    vm = VariableManager(seed=0)
    vm.register("z", shape=(512,), var_type="input", grad_free=gf,
                distribution=dist.Normal(mu=w_mean, sigma=w_sigma),
                learning_rate=0.05, hook_fn=hooks.NormalPerturb(0.05))
    vm.register("noises", shape=(model.noise_dim(),), var_type="input",
                learning_rate=0.01,
                default=jnp.zeros((model.noise_dim(),)))
    vm.register("target", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=weight)
    vm.register("loss_mask", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=loss_mask)
    return vm


def _cars_mask(im):
    m = np.zeros((im, im, 3), np.float32)
    pad = im // 8
    m[pad:im - pad] = 1.0
    return jnp.asarray(m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", type=int, default=30)
    ap.add_argument("--grad", type=int, default=50)
    ap.add_argument("--last", type=int, default=300)
    ap.add_argument("--adam_steps", type=int, default=500)
    ap.add_argument("--methods", nargs="*",
                    default=["LMMAES", "DiagonalCMA", "Adam"])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny budgets (CI / CPU shakeout)")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip the untimed per-method warm-up run (the "
                         "timed number then includes any cold compiles)")
    args = ap.parse_args()
    if args.smoke:
        args.meta, args.grad, args.last, args.adam_steps = 2, 3, 4, 6
        args.no_warmup = True

    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu.optimizers import (GradientOptimizer,
                                           HybridNevergradOptimizer)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = _build_model(BENCH_DTYPE)
        im = model.im_res
        # synthetic self-target through the z path (zero-egress: random-init
        # weights — identical FLOPs/memory to pretrained, CLAUDE.md)
        z_true = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        target = model._forward_z(model.params, z_true)[0]
        weight = jnp.ones_like(target)
        mask = _cars_mask(im)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0,
                                    dtype=BENCH_DTYPE)

        detail = {}
        for method in args.methods:
            grad_free = method != "Adam"
            if not args.no_warmup:
                # untimed warm-up at a one-generation budget: the fused
                # per-generation program and the 50-step gradient segment
                # are budget-independent (scan length travels as args), so
                # this compiles everything the timed run dispatches. Without
                # it a cache-key change makes the "end-to-end" number mostly
                # compile time (measured: LMMAES 107.2 cold vs 166.9 warm,
                # BENCH_ALL round 5).
                vm_w = _make_vm(model, target, weight, mask, grad_free)
                if method == "Adam":
                    GradientOptimizer(model, vm_w, loss_fn, log=False,
                                      track_variables=False).optimize(
                        num_samples=POP, grad_steps=min(50, args.adam_steps))
                else:
                    HybridNevergradOptimizer(
                        method, model, vm_w, loss_fn, log=False,
                        track_variables=False).optimize_fused(
                        num_samples=POP, meta_steps=1, grad_steps=args.grad,
                        last_grad_steps=min(50, args.last), progress_every=0)
            vm = _make_vm(model, target, weight, mask, grad_free)
            t0 = time.time()
            if method == "Adam":
                total_steps = args.adam_steps
                # track_variables=False: tracking stacks every input var per
                # step, and the ~350k-dim noises var x pop 22 x 500 steps
                # is ~15GB — OOM (measured; the gradient-free drivers never
                # track inside their fused programs)
                opt = GradientOptimizer(model, vm, loss_fn, log=False,
                                        track_variables=False)
                # a single 500-step w+ scan reproducibly faults the axon
                # TPU worker (UNAVAILABLE kernel fault at the result fetch,
                # measured, CLAUDE.md) — the library now segments long
                # gradient runs into bounded trajectory-equal dispatches
                # (core/step.py grad_steps, segment_steps=50), so the plain
                # driver call is axon-safe at the full reference budget
                opt.optimize(num_samples=POP, grad_steps=total_steps)
            else:
                total_steps = args.meta * args.grad + args.last
                opt = HybridNevergradOptimizer(method, model, vm, loss_fn,
                                               log=False,
                                               track_variables=False)
                opt.optimize_fused(num_samples=POP, meta_steps=args.meta,
                                   grad_steps=args.grad,
                                   last_grad_steps=args.last,
                                   progress_every=0)
            # _final_results fetched self.out/self.loss: terminal host sync
            wall = time.time() - t0
            final = float(np.min(np.asarray(opt.loss)))
            detail[method] = {
                "wall_s": round(wall, 2),
                "images_per_sec": round(total_steps * POP / wall, 1),
                "final_best_loss": round(final, 5),
                "total_steps": total_steps,
            }

    headline = next((m for m in ("LMMAES", "DiagonalCMA", "Adam")
                     if m in detail), None)
    print(json.dumps({
        "metric": "StyleGAN2-cars-512 w+ search images/sec/chip "
                  f"({headline}, pop {POP}, full budget incl. result fetch)",
        "value": detail[headline]["images_per_sec"] if headline else None,
        "unit": "images/sec",
        "vs_baseline": None,
        "detail": {"methods": detail,
                   "population": POP,
                   "compute_dtype": str(BENCH_DTYPE.__name__),
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
