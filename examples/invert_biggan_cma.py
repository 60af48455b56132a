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
    p = base_parser(__doc__)
    p.add_argument("--fused", action="store_true",
                   help="one XLA dispatch per eval-only generation "
                        "(4.4x faster per generation, scripts/"
                        "bench_evalonly.py)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path for crash-safe resume")
    args = p.parse_args()
    args.grad_free = True
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = CMAOptimizer(model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)

    meta, grad = (5, 10) if args.smoke else (200, 300)
    drive = opt.optimize_fused if args.fused else opt.optimize
    variables, outs, losses = drive(meta_steps=meta, grad_steps=grad,
                                    active=args.active_cma,
                                    checkpoint_path=args.resume)
    finish(args, opt, variables, outs, losses, "./results/biggan_256/cma")


if __name__ == "__main__":
    main()
