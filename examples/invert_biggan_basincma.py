"""BigGAN-256 BasinCMA inversion — the flagship method.

TPU-native counterpart of the reference's
``examples/invert_biggan_basincma.py`` (30 meta x 30 inner + 300 final,
popsize 18).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import BasinCMAOptimizer


def main():
    p = base_parser(__doc__)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path for crash-safe resume")
    p.add_argument("--fused", action="store_true",
                   help="one XLA dispatch per CMA generation (the benchmark "
                        "path: fastest, still checkpointable/resumable)")
    args = p.parse_args()
    args.grad_free = True
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = BasinCMAOptimizer(model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)

    if args.smoke:
        meta, grad, last = 2, 5, 10
    else:
        meta, grad, last = 30, 30, 300
    drive = opt.optimize_fused if args.fused else opt.optimize
    variables, outs, losses = drive(
        meta_steps=meta, grad_steps=grad, last_grad_steps=last,
        checkpoint_path=args.resume, active=args.active_cma)
    finish(args, opt, variables, outs, losses,
           "./results/biggan_256/basincma")


if __name__ == "__main__":
    main()
