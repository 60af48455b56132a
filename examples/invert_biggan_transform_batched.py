"""Batched two-phase inversion: align M misaligned images, then invert all.

End-to-end batched version of the reference's signature workflow
(``examples/invert_biggan_with_transform.py:105-226``, one image per
process): phase 1 runs M spatial-alignment searches in ONE compiled program
(``TransformBasinCMAOptimizer.optimize_fused_batched``); phase 2 freezes
each image's best t — at which point the inner-loop target/weight warps are
constants — precomputes ``warp(target_i, t_i)`` / ``warp(ones, t_i)``, and
inverts all M warped targets together with ``BatchedBasinCMAOptimizer``,
whose ``tell_inverted`` keeps the reference's CMA-tell semantics (score the
un-warped output against the original frame, ``base_cma_optimizer.py:
113-139``). Exactness pins: ``tests/test_two_phase.py``.
Amortized cost per image is measured in ``scripts/bench_two_phase.py``.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import os.path as osp
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from examples.common import enable_compilation_cache  # noqa: F401
import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager, distribution as dist, hooks
from pix2latent_tpu.optimizers import BatchedBasinCMAOptimizer
from pix2latent_tpu.transform import (SpatialTransform,
                                      TransformBasinCMAOptimizer)
from pix2latent_tpu.utils import image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fps", type=str, nargs="*", default=None,
                   help="target image paths (synthetic misaligned "
                        "self-targets if omitted)")
    p.add_argument("--class_lbls", type=int, nargs="*", default=[153, 254])
    p.add_argument("--checkpoint", type=str, default=None,
                   help="converted pretrained weights (.npz)")
    p.add_argument("--save_dir", type=str,
                   default="./results/biggan_transform_batched")
    p.add_argument("--sensitivity", type=float, default=0.1,
                   help="alignment-search warp sensitivity")
    p.add_argument("--p1_mbs", type=int, default=4,
                   help="phase-1 in-graph microbatch (image rows in flight; "
                        "BASELINE.md round-3 recipe for M >= 8)")
    p.add_argument("--p2_mbs", type=int, default=108,
                   help="phase-2 microbatch over the M*pop rows; applied "
                        "only past the 126-row plain-compile knee")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path prefix for crash-safe resume "
                        "(phase 1 and 2 get separate files)")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    from pix2latent_tpu.models.biggan import BigGAN
    with warnings.catch_warnings():
        if not args.checkpoint:
            warnings.simplefilter("ignore")
        model = BigGAN("biggan-deep-256", pretrained_path=args.checkpoint,
                       dtype=jnp.bfloat16)
        loss_fn = LF.ProjectionLoss(dtype=jnp.bfloat16)

    cs = jnp.concatenate([model.get_class_embedding(l)
                          for l in args.class_lbls])
    m = cs.shape[0]

    if args.fps:
        targets = jnp.stack([image.read(fp, im_size=256,
                                        transform_style="biggan")
                             for fp in args.fps])
        assert targets.shape[0] == m, "need one class label per image"
    else:
        print("no --fps given: synthetic misaligned self-targets")
        z_true = jax.random.normal(jax.random.PRNGKey(1), (m, 128))
        clean = model(z=z_true, c=cs)
        render_warp = SpatialTransform(sensitivity=1.0)
        shifts = np.linspace(-0.3, 0.3, m)
        targets = jnp.concatenate([
            render_warp.transform(clean[i:i + 1],
                                  jnp.asarray([[1.0, float(s), 0.05]]))
            for i, s in enumerate(shifts)])

    # -- phase 1: M alignment searches, one compiled program ------------- #
    im = targets.shape[1]
    vm = VariableManager(seed=0)
    vm.register("z", shape=(128,), var_type="input",
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=jnp.zeros((128,)))
    vm.register("target", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=targets[0])
    vm.register("weight", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=jnp.ones((im, im, 3)))
    vm.register("t", shape=(3,), var_type="transform", requires_grad=False,
                grad_free=(np.array([1.0, 0.0, 0.0]), 0.3))

    warp = SpatialTransform(sensitivity=args.sensitivity)
    # chunking pays only past the spill knee (BASELINE.md: M=8+ spills
    # plain; never chunk what already fits)
    p1 = TransformBasinCMAOptimizer(model, vm, loss_fn,
                                    track_variables=False,
                                    max_batch_size=(args.p1_mbs if m >= 8
                                                    else None))
    p1.register_transform(warp, "t", "target")
    p1.register_transform(warp, "t", "weight")
    p1.set_variable_propagation("z")

    p1_meta, p1_grad = (3, 3) if args.smoke else (50, 10)
    res1 = p1.optimize_fused_batched(
        {"target": targets, "c": cs}, meta_steps=p1_meta,
        grad_steps=p1_grad, seeds=np.arange(m),
        checkpoint_path=args.resume and args.resume + ".p1.npz")
    t_best = jnp.asarray(np.asarray(res1["candidate"]))      # [M, 3]
    print("best transforms:", np.asarray(t_best).round(3))

    # -- phase 2: freeze t, precompute the warps, invert all M ----------- #
    # the candidate is a DELTA: the effective warp is
    # default_t + sensitivity * Δt, which is what __call__ applies
    # (exactness of this shortcut: tests/test_two_phase.py)
    warped_t = jnp.concatenate([
        warp(targets[i:i + 1], t_best[i:i + 1]) for i in range(m)])
    ones = jnp.ones_like(targets[:1])
    warped_w = jnp.concatenate([
        warp(ones, t_best[i:i + 1]) for i in range(m)])

    p2 = BatchedBasinCMAOptimizer(
        model, loss_fn, z_dim=128, learning_rate=0.05,
        learnable_inputs={"c": 0.01}, hook_fn=hooks.Clamp(2.0),
        max_batch_size=args.p2_mbs if m * 18 > 126 else None)
    meta, grad, last = (2, 3, 5) if args.smoke else (30, 30, 300)
    res2 = p2.optimize(warped_t, warped_w, fixed_inputs={"c": cs},
                       meta_steps=meta, grad_steps=grad,
                       last_grad_steps=last,
                       # reference phase-2 semantics: tells + winner
                       # selection in the ORIGINAL (un-warped) frame
                       tell_inverted={"transform_fn": warp, "t": t_best,
                                      "targets": targets},
                       checkpoint_path=args.resume and args.resume + ".p2.npz")

    os.makedirs(args.save_dir, exist_ok=True)
    for i in range(m):
        image.save(osp.join(args.save_dir, f"out_{i}.jpg"),
                   np.asarray(res2["out"][i]))
        image.save(osp.join(args.save_dir, f"aligned_target_{i}.jpg"),
                   np.asarray(warped_t[i]))
    np.save(osp.join(args.save_dir, "results.npy"),
            {"t": np.asarray(t_best), "z": np.asarray(res2["z"]),
             "c": np.asarray(res2["c"]), "loss": np.asarray(res2["loss"]),
             "loss_curves": np.asarray(res2["loss_curves"])},
            allow_pickle=True)
    print(f"done: per-image losses {np.asarray(res2['loss']).round(4)} "
          f"-> {args.save_dir}")


if __name__ == "__main__":
    main()
