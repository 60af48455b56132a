"""BigGAN-256 CMA-ES inversion with Adam finetune.

TPU-native counterpart of the reference's ``examples/invert_biggan_cma.py``
(200 meta-steps + 300 Adam finetune).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import CMAOptimizer


def main():
    args = base_parser(__doc__).parse_args()
    args.grad_free = True
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = CMAOptimizer(model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)

    meta, grad = (5, 10) if args.smoke else (200, 300)
    variables, outs, losses = opt.optimize(meta_steps=meta, grad_steps=grad,
                                           active=args.active_cma)
    finish(args, opt, variables, outs, losses, "./results/biggan_256/cma")


if __name__ == "__main__":
    main()
