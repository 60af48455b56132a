"""Two-phase transform inversion wall-clock — the paper's signature workflow
(VERDICT.md round 3, item 7).

Phase 1 searches the spatial-transform parameter t with TransformBasinCMA
(+ z propagation) at the reference budget (50 meta x 10 inner, pop 7,
``/root/reference/examples/invert_biggan_with_transform.py:133``); phase 2
freezes the best t and runs the flagship BasinCMA budget (30 x 30 + 300)
against the warped target. This measures the FULL pipeline end-to-end on
chip — both phases dispatched fused, results fetched to host (the terminal
sync axon's block_until_ready can't fake) — solo, plus the amortized cost
when phase 1 runs batched at the recommended M=12 with ``max_batch_size=4``
(BASELINE.md round-3 recipe).

Prints ONE JSON line: full two-phase wall-clock + inversions/hour, solo and
with batched phase 1.
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


def _build(dtype, mbs_batched):
    import pix2latent_tpu.loss_functions as LF
    from pix2latent_tpu.models.biggan import BigGAN

    model = BigGAN("biggan-deep-256", dtype=dtype)
    loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)
    return model, loss_fn


def _vm(model, target):
    from pix2latent_tpu import VariableManager, distribution as dist, hooks

    vm = VariableManager(seed=0)
    # phase 1: z Adam-only (the example's args.grad_free = False), t grad-free
    vm.register("z", shape=(128,), var_type="input",
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=jnp.zeros((128,)))
    vm.register("target", shape=(256, 256, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(256, 256, 3), var_type="output",
                requires_grad=False,
                default=jnp.ones((256, 256, 3), jnp.float32))
    vm.register("t", shape=(3,), var_type="transform", requires_grad=False,
                grad_free=(np.array([1.0, 0.0, 0.0]), 0.3))
    return vm


def _phase1(model, vm, loss_fn, warp, meta, grad, mbs=None):
    from pix2latent_tpu.transform import TransformBasinCMAOptimizer

    opt = TransformBasinCMAOptimizer(model, vm, loss_fn,
                                     track_variables=False,
                                     max_batch_size=mbs)
    opt.register_transform(warp, "t", "target")
    opt.register_transform(warp, "t", "weight")
    opt.set_variable_propagation("z")
    return opt


def _phase2(model, vm, loss_fn, warp, best_t, meta, grad, last):
    from pix2latent_tpu.optimizers import BasinCMAOptimizer

    vm.edit_variable("t", {"default": jnp.asarray(best_t),
                           "grad_free": False})
    vm.edit_variable("z", {"grad_free": True})
    opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
    opt.register_transform(warp, "t", "target")
    opt.register_transform(warp, "t", "weight")
    t0 = time.time()
    opt.optimize_fused(meta_steps=meta, grad_steps=grad,
                       last_grad_steps=last, progress_every=0)
    # _final_results fetched out/loss: terminal sync
    return time.time() - t0, float(np.min(np.asarray(opt.loss)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p1_meta", type=int, default=50)
    ap.add_argument("--p1_grad", type=int, default=10)
    ap.add_argument("--p2_meta", type=int, default=30)
    ap.add_argument("--p2_grad", type=int, default=30)
    ap.add_argument("--p2_last", type=int, default=300)
    ap.add_argument("--batch_m", type=int, default=12)
    ap.add_argument("--batch_mbs", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.p1_meta, args.p1_grad = 3, 3
        args.p2_meta, args.p2_grad, args.p2_last = 2, 3, 5
        args.batch_m = 2
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from pix2latent_tpu.transform import SpatialTransform

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model, loss_fn = _build(dtype, args.batch_mbs)

        # misaligned targets: shifted renderings of the generator's output
        z = jax.random.normal(jax.random.PRNGKey(5), (1, 128))
        c = jnp.broadcast_to(model.get_class_embedding(153), (1, 128))
        clean = model(z=z, c=c)
        warp = SpatialTransform(sensitivity=1.0)
        shifts = np.linspace(-0.3, 0.3, max(args.batch_m, 1))
        targets = jnp.concatenate([
            warp.transform(clean, jnp.asarray([[1.0, float(s), 0.05]]))
            for s in shifts], axis=0)

        search_warp = SpatialTransform(sensitivity=0.1)

        # -- solo two-phase pipeline (one misaligned image) ----------------- #
        vm = _vm(model, targets[0])
        p1 = _phase1(model, vm, loss_fn, search_warp,
                     args.p1_meta, args.p1_grad)
        t0 = time.time()
        p1.optimize_fused(meta_steps=args.p1_meta, grad_steps=args.p1_grad)
        best_t = p1.get_candidate()
        p1_s = time.time() - t0
        assert best_t is not None
        p2_s, p2_loss = _phase2(model, vm, loss_fn, search_warp, best_t,
                                args.p2_meta, args.p2_grad, args.p2_last)
        solo_s = p1_s + p2_s

        # -- batched phase 1 at the recommended M, then solo phase 2 -------- #
        vm_b = _vm(model, targets[0])
        p1b = _phase1(model, vm_b, loss_fn, search_warp,
                      args.p1_meta, args.p1_grad, mbs=args.batch_mbs)
        t0 = time.time()
        res = p1b.optimize_fused_batched(
            {"target": targets}, meta_steps=args.p1_meta,
            grad_steps=args.p1_grad, seeds=np.arange(args.batch_m))
        p1b_s = time.time() - t0
        assert np.isfinite(res["best_loss"]).all()
        # phase 2 for ONE of the M images with its own candidate (per-image
        # phase-2 cost is the solo p2_s — it does not batch further since t
        # differs per image; total = p1b_s + M * p2_s)
        vm_b2 = _vm(model, targets[1])
        p2b_s, p2b_loss = _phase2(model, vm_b2, loss_fn, search_warp,
                                  np.asarray(res["candidate"][1]),
                                  args.p2_meta, args.p2_grad, args.p2_last)
        amortized_s = p1b_s / args.batch_m + p2b_s

    print(json.dumps({
        "metric": "BigGAN-256 two-phase transform inversion wall-clock "
                  f"(phase1 {args.p1_meta}x{args.p1_grad} pop7 -> "
                  f"phase2 {args.p2_meta}x{args.p2_grad}+{args.p2_last} "
                  "pop18, end-to-end)",
        "value": round(solo_s, 1),
        "unit": "seconds",
        "vs_baseline": None,
        "detail": {
            "solo": {"phase1_s": round(p1_s, 1), "phase2_s": round(p2_s, 1),
                     "total_s": round(solo_s, 1),
                     "inversions_per_hour": round(3600 / solo_s, 2),
                     "phase2_final_loss": round(p2_loss, 5)},
            "batched_phase1": {
                "m": args.batch_m, "max_batch_size": args.batch_mbs,
                "phase1_batched_s": round(p1b_s, 1),
                "phase1_amortized_s": round(p1b_s / args.batch_m, 1),
                "phase2_s": round(p2b_s, 1),
                "amortized_total_s": round(amortized_s, 1),
                "inversions_per_hour": round(3600 / amortized_s, 2),
                "phase2_final_loss": round(p2b_loss, 5)},
            "compute_dtype": args.dtype,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
