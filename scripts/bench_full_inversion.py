"""Measured END-TO-END wall-clock of a FULL reference-budget inversion.

BASELINE.md's "full inversions/hour/chip" row was derived from steady-state
steps/sec; this script measures the real thing: BigGAN-256 BasinCMA at the
reference's exact flagship budget (30 meta x 30 inner Adam + 300 final
finetune = 1,200 fused steps x pop 18, ``examples/invert_biggan_basincma.py:
109``), via ``BasinCMAOptimizer.optimize_fused`` — including every host-side
cost the steady-state number hides: CMA host loop, checkpoint-free dispatch
gaps, the final 300-step finetune program, and fetching the result images to
host (``_final_results``' ``np.asarray(self.out)`` is the terminal sync, so
axon's weak ``block_until_ready`` cannot fake the span; CLAUDE.md).

Reports the COLD first inversion (includes jit tracing + compile, amortized
by the persistent XLA cache across processes) and WARM subsequent inversions
on *different* target images — all compiled programs are image-independent
(targets travel as arguments), so warm time is what a production loop pays
per image.

Usage:  python scripts/bench_full_inversion.py [--warm N] [--dtype bfloat16]
Prints one JSON line.
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

META_STEPS = 30
GRAD_STEPS = 30
LAST_GRAD_STEPS = 300   # examples/invert_biggan_basincma.py:109 budget shape


def _build(dtype):
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager, distribution as dist, hooks
    from pix2latent_tpu.models.biggan import BigGAN
    from pix2latent_tpu.optimizers import BasinCMAOptimizer

    model = BigGAN("biggan-deep-256", dtype=dtype)
    loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)

    vm = VariableManager(seed=0)
    vm.register("z", shape=(128,), var_type="input", grad_free=True,
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=jnp.zeros((128,)))
    vm.register("target", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=jnp.zeros((256, 256, 3)))
    vm.register("weight", shape=(256, 256, 3), var_type="output",
                requires_grad=False,
                default=jnp.ones((256, 256, 3), jnp.float32))

    return BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)


def _targets(n):
    """n distinct smooth full-range targets (ramps at rotated orientations)."""
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 255.0
    outs = []
    for i in range(n):
        a = np.pi * i / max(n, 1)
        u = np.cos(a) * xx + np.sin(a) * yy
        v = -np.sin(a) * xx + np.cos(a) * yy
        # rescale each rotated ramp to [0, 1] so the *2-1 mapping below
        # yields a VALID in-range image for every orientation (rotated
        # u/v otherwise span [-1, 1.37] -> channels outside [-1, 1] and
        # unrealizable warm targets whose losses aren't comparable)
        u = (u - u.min()) / (u.max() - u.min())
        v = (v - v.min()) / (v.max() - v.min())
        outs.append(jnp.asarray(
            np.stack([u, v, 0.5 * (u + v)], axis=-1) * 2.0 - 1.0))
    return outs


def _invert(opt, target, seed, budget):
    meta_steps, grad_steps, last_grad_steps = budget
    opt.var_manager.edit_variable("target", {"default": target})
    opt._key = jax.random.PRNGKey(seed)
    t0 = time.time()
    variables, outs, losses = opt.optimize_fused(
        meta_steps, grad_steps, last_grad_steps=last_grad_steps,
        progress_every=0)
    # _final_results already fetched self.out/self.loss to host (sync point)
    wall = time.time() - t0
    return wall, float(np.min(opt.loss))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=2,
                    help="warm inversions after the cold one")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--meta", type=int, default=META_STEPS,
                    help="meta steps (reduce for smoke testing)")
    ap.add_argument("--grad", type=int, default=GRAD_STEPS)
    ap.add_argument("--last", type=int, default=LAST_GRAD_STEPS)
    args = ap.parse_args()
    budget = (args.meta, args.grad, args.last)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt = _build(dtype)
        targets = _targets(1 + args.warm)

        cold_s, cold_loss = _invert(opt, targets[0], seed=11, budget=budget)
        warm, losses = [], [cold_loss]
        for i, t in enumerate(targets[1:]):
            w_s, w_loss = _invert(opt, t, seed=12 + i, budget=budget)
            warm.append(w_s)
            losses.append(w_loss)

    warm_mean = float(np.mean(warm)) if warm else None
    total_steps = args.meta * args.grad + args.last
    # the REAL population (setup_cma's default_popsize + any mesh padding),
    # not a hardcoded constant — read after the cold run created the CMA
    pop = int(opt.num_samples)
    finite = bool(np.all(np.isfinite(losses)))
    result = {
        "metric": "BigGAN-256 BasinCMA full-inversion wall-clock "
                  f"({args.meta}x{args.grad}+{args.last} steps, "
                  f"pop {pop}, end-to-end incl. result fetch)",
        # ONE-JSON-line bench contract (bench_all.py parses value/unit)
        "value": round(3600.0 / warm_mean, 2) if warm_mean else None,
        "unit": "inversions/hour",
        "vs_baseline": None,
        "cold_s": round(cold_s, 2),
        "warm_s": [round(w, 2) for w in warm],
        "warm_s_mean": round(warm_mean, 2) if warm_mean else None,
        "inversions_per_hour_warm":
            round(3600.0 / warm_mean, 2) if warm_mean else None,
        "effective_images_per_sec_warm":
            round(total_steps * pop / warm_mean, 1) if warm_mean else None,
        "final_best_losses": [round(l, 5) for l in losses],
        "compute_dtype": args.dtype,
        "finite": finite,
    }
    # emit the JSON line FIRST — a NaN final loss must not destroy the
    # (valid) wall-clock measurements; signal the failure via exit code
    print(json.dumps(result))
    if not finite:
        sys.exit(1)


if __name__ == "__main__":
    main()
