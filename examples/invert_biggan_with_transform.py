"""BigGAN-256 inversion with spatial-transform alignment search (two-phase).

TPU-native counterpart of the reference's
``examples/invert_biggan_with_transform.py``: phase 1 searches the transform
parameter t with TransformBasinCMA (+ z variable propagation); phase 2
freezes the best t and runs the chosen latent optimizer.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import (BasinCMAOptimizer, GradientOptimizer,
                                       CMAOptimizer)
from pix2latent_tpu.transform import (SpatialTransform,
                                      TransformBasinCMAOptimizer)
from pix2latent_tpu.utils import image


def main():
    p = base_parser(__doc__)
    p.add_argument("--method", type=str, default="basincma",
                   choices=["adam", "cma", "basincma"])
    p.add_argument("--color_transform", type=str, default="",
                   help="comma list from {hue,gamma,saturation,brightness,"
                        "contrast} to compose with the spatial search — "
                        "differentiable color transforms (upgrade: the "
                        "reference's were CPU/PIL and CMA-only). The wider "
                        "search space needs the full 50x10 budget; --smoke "
                        "only exercises the machinery")
    p.add_argument("--fused", action="store_true",
                   help="one XLA dispatch per generation for the phase-1 "
                        "alignment search")
    args = p.parse_args()
    args.grad_free = False   # z is Adam-only during the transform phase
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")
    mask = image.binarize(weight) if args.mask_fp else weight

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)

    # -- phase 1: transform search -- #
    colors = tuple(c for c in args.color_transform.split(",") if c)
    if colors:
        from pix2latent_tpu.transform import SpatialOnly, setup_transform_fn

        target_tf, _ = setup_transform_fn(
            spatial_transform=True, align=args.mask_fp is not None,
            weight=mask if args.mask_fp else None, color_transform=colors)
        # the weight travels with the SPATIAL warp only: color ops are
        # defined on [-1,1] images and corrupt a 0/1 mask (brightness maps
        # mask-zeros to t-1)
        weight_tf = SpatialOnly(target_tf)
        # seed CMA at the search-space identity — a zero seed (fine for
        # spatial-only, and the reference's grad_free=True) drives weighted
        # color slices to their clipped extremes (compose.py)
        seed_mu = target_tf.get_search_identity()
        t_dim = seed_mu.shape[0]
        vm.register("t", shape=(t_dim,), var_type="transform",
                    requires_grad=False, grad_free=(seed_mu, 1.0))
    else:
        target_tf = SpatialTransform(pre_align=mask if args.mask_fp else None)
        weight_tf = SpatialTransform(pre_align=mask if args.mask_fp else None)
        t_dim = target_tf.get_default_param(as_tensor=False).shape[0]
        vm.register("t", shape=(t_dim,), var_type="transform",
                    requires_grad=False, grad_free=True)

    t_opt = TransformBasinCMAOptimizer(model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)
    t_opt.register_transform(target_tf, "t", "target")
    t_opt.register_transform(weight_tf, "t", "weight")
    t_opt.set_variable_propagation("z")

    meta, grad = (3, 4) if args.smoke else (50, 10)
    t_drive = t_opt.optimize_fused if args.fused else t_opt.optimize
    t_vars, t_results, t_loss = t_drive(meta_steps=meta, grad_steps=grad)
    best_t = t_opt.get_candidate()
    print("best transform:", best_t)

    # -- phase 2: latent optimization with frozen transform -- #
    vm.edit_variable("t", {"default": jnp.asarray(best_t),
                           "grad_free": False})
    vm.edit_variable("z", {"learning_rate": args.lr})

    loss_fn = make_loss(args)
    if args.method == "adam":
        vm.edit_variable("z", {"grad_free": False})
        opt = GradientOptimizer(model, vm, loss_fn, log=args.make_video, max_batch_size=args.max_minibatch)
        opt.register_transform(target_tf, "t", "target")
        opt.register_transform(weight_tf, "t", "weight")
        variables, outs, losses = opt.optimize(
            num_samples=args.num_samples,
            grad_steps=20 if args.smoke else 500)
    elif args.method == "cma":
        vm.edit_variable("z", {"grad_free": True})
        opt = CMAOptimizer(model, vm, loss_fn, log=args.make_video, max_batch_size=args.max_minibatch)
        opt.register_transform(target_tf, "t", "target")
        opt.register_transform(weight_tf, "t", "weight")
        m, g = (3, 10) if args.smoke else (200, 300)
        variables, outs, losses = opt.optimize(meta_steps=m, grad_steps=g)
    else:
        vm.edit_variable("z", {"grad_free": True})
        opt = BasinCMAOptimizer(model, vm, loss_fn, log=args.make_video, max_batch_size=args.max_minibatch)
        opt.register_transform(target_tf, "t", "target")
        opt.register_transform(weight_tf, "t", "weight")
        m, g, l = (2, 4, 8) if args.smoke else (30, 30, 300)
        variables, outs, losses = opt.optimize(
            meta_steps=m, grad_steps=g, last_grad_steps=l)

    finish(args, opt, variables, outs, losses,
           f"./results/biggan_256/{args.method}_w_transform")


if __name__ == "__main__":
    main()
