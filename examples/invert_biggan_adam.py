"""BigGAN-256 z-space inversion with Adam.

TPU-native counterpart of the reference's ``examples/invert_biggan_adam.py``
(500 Adam steps, lr 0.05 on z / 0.01 on c, ProjectionLoss).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import GradientOptimizer


def main():
    args = base_parser(__doc__).parse_args()
    args.grad_free = False
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = GradientOptimizer(model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)

    grad_steps = 20 if args.smoke else 500
    num_samples = 4 if args.smoke else args.num_samples
    variables, outs, losses = opt.optimize(num_samples=num_samples,
                                           grad_steps=grad_steps)
    finish(args, opt, variables, outs, losses,
           "./results/biggan_256/adam")


if __name__ == "__main__":
    main()
