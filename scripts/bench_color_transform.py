"""Composed spatial+color transform search: recover a known hue+shift
corruption on chip (VERDICT.md round 4, task 4).

The differentiable color transforms are this repo's claimed capability
UPGRADE over the reference (whose color ops were non-differentiable CPU/PIL
round-trips searchable only by CMA, ``pix2latent/transform/
color_transform.py:42-60``, and whose ``setup_transform_fn`` was stale dead
code, ``transform_utils.py:15-50``). This bench gives the claim measured
evidence: corrupt a generator rendering with a KNOWN hue shift + spatial
translation, run the composed {spatial, hue, brightness} TransformBasinCMA
search at the reference transform budget (50 meta x 10 inner,
``invert_biggan_with_transform.py:133``), and report

  - wall-clock of the phase-1 search (fused, one dispatch/generation),
  - recovered-parameter error: the effective (t_spatial, t_hue, t_bright)
    at the best candidate vs the corruption's exact inverse
    (tx* = -tx_true, hue* = -hue_true, bright* = 1),
  - final best tell loss + image-space recovery error
    (masked L1 of compose(target, t_best) vs the clean rendering).

Weights travel with the SPATIAL part only (``SpatialOnly`` — color ops
corrupt a 0/1 mask); CMA is seeded at the search-space identity
(``ComposeTransform.get_search_identity``). Prints ONE JSON line.
"""

import argparse
import json
import os
import sys
import time
import warnings

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.cache import enable_compilation_cache

enable_compilation_cache()

HUE_TRUE = 0.12       # corruption: hue shift (+0.12 of the [0,1) hue circle)
TX_TRUE = 0.20        # corruption: normalized-x translation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", type=int, default=50)
    ap.add_argument("--grad", type=int, default=10)
    ap.add_argument("--popsize", type=int, default=None,
                    help="default: 4+floor(3 ln 5) = 8 for d=5")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.meta, args.grad = 3, 3
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu import VariableManager, distribution as dist, hooks
    from pix2latent_tpu.models.biggan import BigGAN
    from pix2latent_tpu.transform import (HueTransform, SpatialOnly,
                                          SpatialTransform,
                                          TransformBasinCMAOptimizer,
                                          setup_transform_fn)
    from pix2latent_tpu.utils.image import binarize

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = BigGAN("biggan-deep-256", dtype=dtype)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)

        # clean rendering, then the known corruption: hue shift then spatial
        # shift (the search applies spatial first, then hue — each inverts
        # its half: tx* = -TX_TRUE, hue* = -HUE_TRUE)
        z_star = jax.random.normal(jax.random.PRNGKey(5), (1, 128))
        c = jnp.broadcast_to(model.get_class_embedding(153), (1, 128))
        clean = model(z=z_star, c=c)
        hue_corrupt = HueTransform()
        shift = SpatialTransform(sensitivity=1.0)
        target = shift.transform(
            hue_corrupt.apply(clean, jnp.asarray([HUE_TRUE])),
            jnp.asarray([[1.0, TX_TRUE, 0.0]]))[0]

        # composed search space {spatial, hue, brightness} (the VERDICT's
        # --color_transform brightness,hue config); brightness is a decoy —
        # the corruption leaves it at identity and the search must too
        fn, _ = setup_transform_fn(spatial_transform=True,
                                   color_transform=("hue", "brightness"))
        seed_mu = fn.get_search_identity()           # [0,0,0, 0, 1]
        t_dim = seed_mu.shape[0]

        def build_opt():
            vm = VariableManager(seed=0)
            vm.register("z", shape=(128,), var_type="input",
                        distribution=dist.TruncatedNormalModulo(sigma=1.0,
                                                                trunc=2.0),
                        learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
            vm.register("c", shape=(128,), var_type="input",
                        learning_rate=0.01, default=jnp.zeros((128,)))
            vm.register("target", shape=(256, 256, 3), var_type="output",
                        requires_grad=False, default=target)
            vm.register("weight", shape=(256, 256, 3), var_type="output",
                        requires_grad=False,
                        default=jnp.ones((256, 256, 3), jnp.float32))
            vm.register("t", shape=(t_dim,), var_type="transform",
                        requires_grad=False, grad_free=(seed_mu, 1.0))
            opt = TransformBasinCMAOptimizer(model, vm, loss_fn,
                                             track_variables=False)
            opt.register_transform(fn, "t", "target")
            opt.register_transform(SpatialOnly(fn), "t", "weight")
            opt.set_variable_propagation("z")
            return opt

        if not args.smoke:
            # untimed one-generation warm-up: the fused per-generation
            # program is budget-independent, so this absorbs the cold
            # compile (measured ~13 min, BENCH_ALL round 5: 809 s wall vs
            # the ~20-s-scale warm search) and leaves the timed number a
            # real search wall-clock regardless of cache state
            build_opt().optimize_fused(meta_steps=1, grad_steps=args.grad,
                                       popsize=args.popsize)

        opt = build_opt()
        t0 = time.time()
        opt.optimize_fused(meta_steps=args.meta, grad_steps=args.grad,
                           popsize=args.popsize)
        best_t = np.asarray(opt.get_candidate())     # searched vector [5]
        wall = time.time() - t0
        assert best_t is not None and np.isfinite(best_t).all(), best_t

        # effective parameters at the best candidate (compose semantics:
        # spatial slice is a delta at sensitivity 0.1 + weight 1; color
        # slices reweight by their compose weight around their defaults,
        # then clamp) — weights read off the constructed compose so the
        # report can never desync from the searched program
        w_hue, w_bright = (w for _, w in fn.transform_list[1:])
        eff_spatial = np.array([1.0, 0.0, 0.0]) + 0.1 * best_t[:3]
        eff_hue = float(np.clip(w_hue * best_t[3], -0.5 + 1e-6, 0.5 - 1e-6))
        eff_bright = float(np.clip(w_bright * (best_t[4] - 1.0) + 1.0,
                                   0.667, 1.5))
        err_tx = abs(float(eff_spatial[1]) - (-TX_TRUE))
        err_hue = abs(eff_hue - (-HUE_TRUE))
        err_bright = abs(eff_bright - 1.0)

        # image-space recovery: compose(target, t_best) vs the clean frame,
        # masked by the spatially-warped all-ones weight
        rec = fn(target[None], jnp.asarray(best_t)[None])
        m = binarize(SpatialOnly(fn)(jnp.ones_like(target)[None],
                                     jnp.asarray(best_t)[None]))
        rec_err = float(np.sum(np.abs(np.asarray(rec - clean)) *
                               np.asarray(m)) / max(float(np.sum(m)), 1.0))
        base_err = float(np.mean(np.abs(np.asarray(target - clean[0]))))

    print(json.dumps({
        "metric": "BigGAN-256 composed spatial+hue+brightness transform "
                  f"search wall-clock ({args.meta}x{args.grad}, "
                  "known hue+shift corruption)",
        "value": round(wall, 1),
        "unit": "seconds",
        "vs_baseline": None,
        "detail": {
            "corruption": {"hue": HUE_TRUE, "tx": TX_TRUE},
            "recovered_effective": {
                "spatial": [round(float(v), 4) for v in eff_spatial],
                "hue": round(eff_hue, 4), "brightness": round(eff_bright, 4)},
            "expected_effective": {"spatial": [1.0, -TX_TRUE, 0.0],
                                   "hue": -HUE_TRUE, "brightness": 1.0},
            "param_abs_err": {"tx": round(err_tx, 4),
                              "hue": round(err_hue, 4),
                              "brightness": round(err_bright, 4)},
            "final_best_tell_loss": round(float(opt._best_loss), 5),
            "image_recovery_l1": round(rec_err, 5),
            "corrupted_vs_clean_l1": round(base_err, 5),
            "popsize": opt.num_samples,
            "compute_dtype": args.dtype,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
