"""StyleGAN2 FFHQ-1024 BasinCMA inversion — the single-chip memory recipe.

The reference ships FFHQ support in the model wrapper
(``model/stylegan2.py:51-62``) but no FFHQ example; at 1024x1024 x pop-22
the activations do not fit a 16GB chip naively (the reference chunked with
``max_batch_size=9`` on V100 for the same reason,
``optimizer/base_optimizer.py:12``). This script bakes in the measured
one-chip recipe (BASELINE.md: 18.2 img/s/chip):

- ``--bf16``: bfloat16 generator compute,
- ``--remat_from_res 256``: recompute synthesis blocks >= 256 resolution in
  the backward pass (``jax.checkpoint`` — trades FLOPs for HBM),
- ``--max_minibatch 2``: in-graph ``lax.map`` population microbatching
  (exact: chunk grads are rescaled to the population mean, ``core/step.py``).

Flags can still be overridden (e.g. ``--no_recipe`` to measure the naive
OOM, or ``--model cars`` which ignores the recipe defaults).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, cars_loss_mask, finish,
                             load_stylegan2, load_target, make_loss,
                             register_stylegan2_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import BasinCMAOptimizer


def apply_ffhq_recipe(args):
    """Fill in the measured one-chip FFHQ-1024 memory defaults
    (BASELINE.md) without overriding anything the user set explicitly."""
    if args.model != "ffhq" or args.no_recipe:
        return args
    args.bf16 = True
    if args.remat_from_res == 0:
        args.remat_from_res = 256
    if args.max_minibatch is None:
        args.max_minibatch = 2
    return args


def main():
    p = base_parser(__doc__, model="stylegan2")
    p.set_defaults(model="ffhq")
    p.add_argument("--no_recipe", action="store_true",
                   help="skip the FFHQ-1024 memory defaults (bf16 + "
                        "remat_from_res=256 + max_minibatch=2)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path for crash-safe resume")
    p.add_argument("--fused", action="store_true",
                   help="one XLA dispatch per CMA generation")
    args = apply_ffhq_recipe(p.parse_args())
    args.grad_free = True
    model = load_stylegan2(args)
    im = model.im_res
    target, weight = load_target(args, model, im, style="stylegan2")

    vm = register_stylegan2_vars(VariableManager(), model, args, target,
                                 weight,
                                 loss_mask=cars_loss_mask(im, args.model))
    opt = BasinCMAOptimizer(model, vm, make_loss(args), log=args.make_video,
                            max_batch_size=args.max_minibatch)
    opt.log_resize_factor = 0.25

    if args.smoke:
        meta, grad, last = 2, 4, 8
    else:
        meta, grad, last = 30, 30, 300
    drive = opt.optimize_fused if args.fused else opt.optimize
    variables, outs, losses = drive(meta_steps=meta, grad_steps=grad,
                                    last_grad_steps=last,
                                    checkpoint_path=args.resume,
                                    active=args.active_cma)
    finish(args, opt, variables, outs, losses,
           f"./results/stylegan2_{args.model}/basincma")


if __name__ == "__main__":
    main()
