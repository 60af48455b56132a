"""StyleGAN2 LSUN-Cars gradient-free inversion (pluggable strategy).

TPU-native counterpart of the reference's
``examples/invert_stylegan2_cars_ng.py``.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, cars_loss_mask, finish,
                             load_stylegan2, load_target, make_loss,
                             register_stylegan2_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import NevergradOptimizer


def main():
    p = base_parser(__doc__, model="stylegan2")
    p.add_argument("--ng_method", type=str, default="CMA")
    p.add_argument("--fused", action="store_true",
                   help="one XLA dispatch per eval-only generation "
                        "(3.8x faster per generation, scripts/"
                        "bench_evalonly.py)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path for crash-safe resume")
    args = p.parse_args()
    args.grad_free = True
    model = load_stylegan2(args)
    im = model.im_res
    target, weight = load_target(args, model, im, style="stylegan2")

    vm = register_stylegan2_vars(VariableManager(), model, args, target,
                                 weight, loss_mask=cars_loss_mask(im, args.model))
    opt = NevergradOptimizer(args.ng_method, model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)
    opt.log_resize_factor = 0.5

    meta, grad = (3, 8) if args.smoke else (1000, 300)
    drive = opt.optimize_fused if args.fused else opt.optimize
    variables, outs, losses = drive(
        num_samples=args.num_samples, meta_steps=meta, grad_steps=grad,
        checkpoint_path=args.resume)
    finish(args, opt, variables, outs, losses,
           f"./results/stylegan2_{args.model}/ng_{args.ng_method}")


if __name__ == "__main__":
    main()
