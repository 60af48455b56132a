"""BigGAN-256 gradient-free inversion with a pluggable strategy.

TPU-native counterpart of the reference's
``examples/invert_biggan_nevergrad.py`` (1000 meta + 300 finetune); the
strategy registry is on-device (CMA/TBPSA/OnePlusOne/DE/PSO/RandomSearch)
with free population size.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import NevergradOptimizer


def main():
    p = base_parser(__doc__)
    p.add_argument("--ng_method", type=str, default="CMA")
    args = p.parse_args()
    args.grad_free = True
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = NevergradOptimizer(args.ng_method, model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)

    meta, grad = (5, 10) if args.smoke else (1000, 300)
    variables, outs, losses = opt.optimize(
        num_samples=args.num_samples, meta_steps=meta, grad_steps=grad)
    finish(args, opt, variables, outs, losses,
           f"./results/biggan_256/ng_{args.ng_method}")


if __name__ == "__main__":
    main()
