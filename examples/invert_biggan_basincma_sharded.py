"""BigGAN-256 BasinCMA with the population sharded across a TPU mesh.

NEW relative to the reference (which was single-GPU with mini-batch
chunking): the CMA population is the data-parallel axis; every sample's
forward/backward runs on its own shard of a 1-D ('pop',) device mesh, with
the per-sample losses implicitly all-gathered into the replicated on-device
CMA update. Run under real multi-chip or simulate with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from examples.common import (base_parser, finish, load_biggan, load_target,
                             make_loss, register_biggan_vars)
from pix2latent_tpu import VariableManager
from pix2latent_tpu.optimizers import BasinCMAOptimizer
from pix2latent_tpu.parallel import make_mesh


def main():
    p = base_parser(__doc__)
    p.add_argument("--n_devices", type=int, default=None)
    args = p.parse_args()
    args.grad_free = True

    mesh = make_mesh(args.n_devices)
    print(f"population mesh: {mesh.shape['pop']} device(s)")

    model = load_biggan(args)
    target, weight = load_target(args, model, 256, style="biggan")

    vm = register_biggan_vars(VariableManager(), model, args, target, weight)
    opt = BasinCMAOptimizer(model, vm, make_loss(args), mesh=mesh,
                            log=args.make_video,
                            max_batch_size=args.max_minibatch)

    if args.smoke:
        meta, grad, last = 2, 4, 8
    else:
        meta, grad, last = 30, 30, 300
    variables, outs, losses = opt.optimize(meta_steps=meta, grad_steps=grad,
                                           last_grad_steps=last)
    finish(args, opt, variables, outs, losses,
           "./results/biggan_256/basincma_sharded")


if __name__ == "__main__":
    main()
