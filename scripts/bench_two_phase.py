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

Prints ONE JSON line: full two-phase wall-clock + inversions/hour, solo,
with batched phase 1, and FULLY batched (phase 2 batched too: once t is
frozen per image, the inner-loop warped target/weight are constants, so
phase 2 runs as a batched multi-image inversion through
``BatchedBasinCMAOptimizer`` with per-image precomputed warps; CMA tells
and winner selection keep the reference's inverted-frame semantics via
``tell_inverted`` — exactness pinned by ``tests/test_two_phase.py``).
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


def _phase2(model, vm, loss_fn, warp, best_t, meta, grad, last, orig_target):
    from pix2latent_tpu.optimizers import BasinCMAOptimizer

    vm.edit_variable("t", {"default": jnp.asarray(best_t),
                           "grad_free": False})
    vm.edit_variable("z", {"grad_free": True})
    opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
    opt.register_transform(warp, "t", "target")
    opt.register_transform(warp, "t", "weight")
    t0 = time.time()
    variables, _, _ = opt.optimize_fused(meta_steps=meta, grad_steps=grad,
                                         last_grad_steps=last,
                                         progress_every=0)
    # _final_results fetched out/loss: terminal sync
    wall = time.time() - t0
    loss_w = np.asarray(opt.loss)        # warped-frame, pre-final-update
    # inverted-frame post-update winner loss: re-render the winner, un-warp
    # to the ORIGINAL frame, score against the original target — the SAME
    # frame and step semantics as the full-batched leg's tell_inverted
    # report, so the JSON's quality numbers are comparable across legs
    # (ADVICE round 4)
    win = int(np.argmin(np.where(np.isfinite(loss_w), loss_w, np.inf)))
    inputs = {name: arr[win:win + 1]
              for name, arr in variables["input"].items()}
    out = model.apply(model.params, **inputs)
    t_win = variables["transform"]["t"][win:win + 1]
    out_inv = warp(out, t_win, invert=True)
    lm = np.asarray(loss_fn(out_inv, target=jnp.asarray(orig_target)[None]))
    loss_inv = float(lm.reshape(1, -1).mean())
    return wall, float(np.nanmin(loss_w)), loss_inv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p1_meta", type=int, default=50)
    ap.add_argument("--p1_grad", type=int, default=10)
    ap.add_argument("--p2_meta", type=int, default=30)
    ap.add_argument("--p2_grad", type=int, default=30)
    ap.add_argument("--p2_last", type=int, default=300)
    ap.add_argument("--batch_m", type=int, default=12)
    ap.add_argument("--batch_mbs", type=int, default=4)
    ap.add_argument("--p2_batch_mbs", type=int, default=108,
                    help="max_batch_size for the batched phase 2 over the "
                         "M*pop concatenated rows (BASELINE.md knee: exact-"
                         "divisor chunks near 126 rows; None when it fits)")
    ap.add_argument("--skip_solo", action="store_true",
                    help="measure only the batched legs (phase-1 candidates "
                         "still come from the batched phase 1)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip the untimed solo-program warm-up (the solo "
                         "headline then includes any cold compiles)")
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
        p1_s = p2_s = solo_s = p2_loss = None
        if not (args.skip_solo or args.smoke or args.no_warmup):
            # untimed one-generation warm-up of both phases' programs (the
            # fused per-generation programs and the 50-step final segment
            # are budget-independent), so the timed solo headline measures
            # the search, not cache-state-dependent compiles (measured
            # 613.1 s cold-inclusive vs 538.8 s warm, BENCH_ALL round 5)
            vm_w = _vm(model, targets[0])
            pw = _phase1(model, vm_w, loss_fn, search_warp,
                         1, args.p1_grad)
            pw.optimize_fused(meta_steps=1, grad_steps=args.p1_grad)
            bt = pw.get_candidate()
            if bt is not None and np.isfinite(np.asarray(bt)).all():
                _phase2(model, vm_w, loss_fn, search_warp, bt,
                        1, args.p2_grad, min(50, args.p2_last), targets[0])
        if not args.skip_solo:
            vm = _vm(model, targets[0])
            p1 = _phase1(model, vm, loss_fn, search_warp,
                         args.p1_meta, args.p1_grad)
            t0 = time.time()
            p1.optimize_fused(meta_steps=args.p1_meta,
                              grad_steps=args.p1_grad)
            best_t = p1.get_candidate()
            p1_s = time.time() - t0
            assert best_t is not None
            p2_s, p2_loss, p2_loss_inv = _phase2(
                model, vm, loss_fn, search_warp, best_t,
                args.p2_meta, args.p2_grad, args.p2_last, targets[0])
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
        p2b_s, p2b_loss, p2b_loss_inv = _phase2(
            model, vm_b2, loss_fn, search_warp,
            np.asarray(res["candidate"][1]),
            args.p2_meta, args.p2_grad, args.p2_last, targets[1])
        amortized_s = p1b_s / args.batch_m + p2b_s

        # -- FULLY batched: phase 2 batched over the per-image frozen t ----- #
        # With t frozen, warp(target, t_i) and warp(ones, t_i) are constants;
        # precompute them once and run phase 2 as a plain batched M-image
        # inversion (same search semantics as the solo phase 2 — CMA over z,
        # Adam-refined z and c, the transform never re-evaluated in-graph).
        from pix2latent_tpu import hooks
        from pix2latent_tpu.optimizers import BatchedBasinCMAOptimizer

        t_best = jnp.asarray(np.asarray(res["candidate"]))       # [M, 3]
        assert np.isfinite(np.asarray(t_best)).all(), (
            "phase-1 produced a non-finite candidate t — a NaN t poisons "
            f"every phase-2 sample of that image: {np.asarray(t_best)}")
        # the candidate is a DELTA (apply_transforms goes through __call__:
        # t_eff = default_t + sensitivity * Δt) — precompute via __call__,
        # exactness pinned by tests/test_two_phase.py
        warped_t = jnp.concatenate([
            search_warp(targets[i:i + 1], t_best[i:i + 1])
            for i in range(args.batch_m)])
        ones = jnp.ones_like(targets[:1])
        warped_w = jnp.concatenate([
            search_warp(ones, t_best[i:i + 1])
            for i in range(args.batch_m)])
        # never chunk what already fits: 126 concurrent rows is the measured
        # plain-compile knee (BASELINE.md round-4 table). Rows come from the
        # REAL default popsize, not a literal 18, so the chunk/no-chunk
        # choice can't desync from the concatenated row count (ADVICE
        # round 4)
        from pix2latent_tpu.strategies import cma as cma_strategy
        rows = args.batch_m * cma_strategy.default_popsize(128)
        p2f = BatchedBasinCMAOptimizer(
            model, loss_fn, z_dim=128, learning_rate=0.05,
            learnable_inputs={"c": 0.01}, hook_fn=hooks.Clamp(2.0),
            max_batch_size=args.p2_batch_mbs if rows > 126 else None)
        t0 = time.time()
        res2 = p2f.optimize(
            warped_t, warped_w,
            fixed_inputs={"c": jnp.zeros((args.batch_m, 128))},
            meta_steps=args.p2_meta, grad_steps=args.p2_grad,
            last_grad_steps=args.p2_last,
            # reference phase-2 semantics: tells/winner selection score the
            # un-warped output against the ORIGINAL frame (inverted_loss)
            tell_inverted={"transform_fn": search_warp, "t": t_best,
                           "targets": targets[:args.batch_m]})
        p2f_s = time.time() - t0
        p2f_losses = np.asarray(res2["loss"])
        # report finiteness in the JSON instead of asserting before the
        # print (ADVICE round 3: a NaN loss must not discard valid timings)
        p2f_finite = int(np.isfinite(p2f_losses).sum())
        p2f_fin_losses = p2f_losses[np.isfinite(p2f_losses)]
        full_amortized_s = (p1b_s + p2f_s) / args.batch_m

    # --skip_solo substitutes the amortized per-image number for the solo
    # end-to-end wall-clock: name the metric (and value_kind) accordingly so
    # record parsers never compare different quantities under one string
    # (ADVICE round 4)
    budget = (f"phase1 {args.p1_meta}x{args.p1_grad} pop7 -> "
              f"phase2 {args.p2_meta}x{args.p2_grad}+{args.p2_last} pop18")
    solo_mode = solo_s is not None
    print(json.dumps({
        "metric": ("BigGAN-256 two-phase transform inversion wall-clock "
                   f"({budget}, end-to-end solo)" if solo_mode else
                   "BigGAN-256 two-phase transform inversion amortized "
                   f"seconds/image ({budget}, fully batched M="
                   f"{args.batch_m})"),
        "value": round(solo_s if solo_mode else full_amortized_s, 1),
        "unit": "seconds",
        "vs_baseline": None,
        "detail": {
            "value_kind": ("solo_end_to_end_s" if solo_mode
                           else "full_batched_amortized_s_per_image"),
            # *_loss_warped: min per-sample warped-frame inner loss (pre-
            # final-update); *_loss_inverted: post-update winner loss in the
            # ORIGINAL (inverted) frame — the same frame/step semantics as
            # the full_batched leg, so quality compares across legs
            "solo": None if solo_s is None else {
                "phase1_s": round(p1_s, 1), "phase2_s": round(p2_s, 1),
                "total_s": round(solo_s, 1),
                "inversions_per_hour": round(3600 / solo_s, 2),
                "phase2_final_loss_warped": round(p2_loss, 5),
                "phase2_final_loss_inverted": round(p2_loss_inv, 5)},
            "batched_phase1": {
                "m": args.batch_m, "max_batch_size": args.batch_mbs,
                "phase1_batched_s": round(p1b_s, 1),
                "phase1_amortized_s": round(p1b_s / args.batch_m, 1),
                "phase2_s": round(p2b_s, 1),
                "amortized_total_s": round(amortized_s, 1),
                "inversions_per_hour": round(3600 / amortized_s, 2),
                "phase2_final_loss_warped": round(p2b_loss, 5),
                "phase2_final_loss_inverted": round(p2b_loss_inv, 5)},
            "full_batched": {
                "m": args.batch_m,
                "p2_max_batch_size": (args.p2_batch_mbs
                                      if rows > 126 else None),
                "phase1_batched_s": round(p1b_s, 1),
                "phase2_batched_s": round(p2f_s, 1),
                "amortized_total_s": round(full_amortized_s, 1),
                "inversions_per_hour": round(3600 / full_amortized_s, 2),
                "finite_images": p2f_finite,
                "phase2_final_loss_inverted_mean": (
                    round(float(p2f_fin_losses.mean()), 5)
                    if p2f_finite else None),
                "phase2_final_loss_inverted_max": (
                    round(float(p2f_fin_losses.max()), 5)
                    if p2f_finite else None)},
            "compute_dtype": args.dtype,
            "backend": jax.default_backend(),
        },
    }))
    assert p2f_finite == args.batch_m, (
        f"only {p2f_finite}/{args.batch_m} batched phase-2 images landed "
        "finite losses (JSON above still carries the valid timings)")


if __name__ == "__main__":
    main()
