"""BigGAN-256 hybrid (strategy outer x Adam inner) inversion.

TPU-native counterpart of the reference's
``examples/invert_biggan_hybrid_nevergrad.py`` (30 meta x 50 inner + 300).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import HybridNevergradOptimizer


def main():
    p = base_parser(__doc__)
    p.add_argument("--ng_method", type=str, default="CMA")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path for crash-safe resume")
    p.add_argument("--fused", action="store_true",
                   help="one XLA dispatch per generation (Host: strategies "
                        "excepted on the axon TPU — see CLAUDE.md)")
    args = p.parse_args()
    args.grad_free = True
    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = HybridNevergradOptimizer(args.ng_method, model, vm, make_loss(args), log=args.make_video, max_batch_size=args.max_minibatch)

    if args.smoke:
        meta, grad, last = 2, 5, 10
    else:
        meta, grad, last = 30, 50, 300
    drive = opt.optimize_fused if args.fused else opt.optimize
    variables, outs, losses = drive(
        num_samples=args.num_samples, meta_steps=meta, grad_steps=grad,
        last_grad_steps=last, checkpoint_path=args.resume)
    finish(args, opt, variables, outs, losses,
           f"./results/biggan_256/hybridng_{args.ng_method}")


if __name__ == "__main__":
    main()
