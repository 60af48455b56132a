"""Shared example harness.

The reference ships 13 argparse scripts that repeat the same registration
boilerplate (SURVEY.md §2 #29); here the common flow — load model, read
target/mask, register variables, run, save — lives in one place and each
example is a thin config. All examples run offline (random-init weights,
synthetic target if no image path given) and accept ``--smoke`` for a
seconds-long sanity run.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import warnings

import jax
import jax.numpy as jnp
import numpy as np

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager, distribution as dist, hooks
from pix2latent_tpu.cache import enable_compilation_cache
from pix2latent_tpu.utils import image, video
from pix2latent_tpu.utils.project_utils import save_result

enable_compilation_cache()


def base_parser(desc, model="biggan"):
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--fp", type=str, default=None,
                   help="target image path (synthetic target if omitted)")
    p.add_argument("--mask_fp", type=str, default=None)
    p.add_argument("--class_lbl", type=int, default=153)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--latent_noise", type=float, default=0.05)
    p.add_argument("--truncate", type=float, default=2.0)
    p.add_argument("--make_video", action="store_true")
    p.add_argument("--num_samples", type=int, default=9)
    p.add_argument("--max_minibatch", type=int, default=None,
                   help="population microbatch size: bounds peak activation "
                        "memory via in-graph lax.map chunking (the FFHQ-1024 "
                        "x pop-22 recipe needs 2); None runs the population "
                        "whole")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="pretrained torch checkpoint to convert")
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny budgets for a fast sanity run")
    p.add_argument("--active_cma", action="store_true",
                   help="aCMA negative-weight covariance updates (pycma's "
                        "default mode, which the reference ran)")
    if model == "stylegan2":
        p.add_argument("--model", type=str, default="cars",
                       choices=["cars", "ffhq"])
        p.add_argument("--search", type=str, default="z",
                       choices=["z", "w+"])
        p.add_argument("--bf16", action="store_true",
                       help="bfloat16 generator compute")
        p.add_argument("--remat_from_res", type=int, default=0,
                       help="recompute synthesis blocks >= this resolution "
                            "in the backward pass (FFHQ-1024 recipe: "
                            "--bf16 --remat_from_res 256 --max_minibatch 2)")
    return p


def load_biggan(args):
    from pix2latent_tpu.models.biggan import BigGAN
    with warnings.catch_warnings():
        if args.checkpoint:
            return BigGAN("biggan-deep-256",
                          pretrained_path=args.checkpoint)
        warnings.simplefilter("ignore")
        return BigGAN("biggan-deep-256")


def load_stylegan2(args):
    import jax.numpy as jnp
    from pix2latent_tpu.models.stylegan2 import StyleGAN2
    kwargs = dict(
        search=args.search,
        dtype=jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32,
        remat_from_res=getattr(args, "remat_from_res", 0))
    with warnings.catch_warnings():
        if args.checkpoint:
            return StyleGAN2(args.model, pretrained_path=args.checkpoint,
                             **kwargs)
        warnings.simplefilter("ignore")
        return StyleGAN2(args.model, **kwargs)


def load_target(args, model, im_size, style=None):
    """Target + weight in [-1,1] NHWC; synthetic self-target when no image
    is given (keeps every example runnable offline)."""
    if args.fp:
        target = image.read(args.fp, im_size=im_size, transform_style=style)
    else:
        print("no --fp given: using a synthetic self-generated target")
        if hasattr(model, "get_class_embedding"):
            z = jax.random.normal(jax.random.PRNGKey(1), (1, 128))
            c = model.get_class_embedding(args.class_lbl)
            target = model(z=z, c=c)[0]
        else:
            z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
            # synthesize through the z path even in w+ search mode (the
            # w+ forward would need a noise vector)
            target = model._forward_z(model.params, z)[0]

    if args.mask_fp:
        weight = image.read(args.mask_fp, im_size=im_size,
                            transform_style=style)
        weight = jnp.clip((weight + 1.0) / 2.0, 0.3, 1.0)
    else:
        weight = jnp.ones_like(target)
    return target, weight


def register_biggan_vars(vm, model, args, target, weight):
    """The canonical BigGAN registration
    (reference ``examples/invert_biggan_adam.py:62-97``)."""
    im = target.shape[0]
    vm.register("z", shape=(128,), var_type="input",
                grad_free=getattr(args, "grad_free", False),
                distribution=dist.TruncatedNormalModulo(
                    sigma=1.0, trunc=args.truncate),
                learning_rate=args.lr, hook_fn=hooks.Clamp(args.truncate))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=model.get_class_embedding(args.class_lbl)[0])
    vm.register("target", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=weight)
    return vm


def register_stylegan2_vars(vm, model, args, target, weight, loss_mask=None):
    """The canonical StyleGAN2 registration
    (reference ``examples/invert_stylegan2_cars_basincma.py:57-96``).

    ``--search w+`` (the wrapper's second mode, reference
    ``model/stylegan2.py:99-104,122-138``) searches the w latent directly —
    initialized at the mean latent, no z-space Normalize hook — plus the
    flattened per-layer noise vector as an Adam-only variable."""
    im = target.shape[0]
    if getattr(args, "search", "z") == "w+":
        w_mean, w_std = model.latent_stats()
        # sigma floor: random-init mapping MLPs collapse w (std ~ 0), and a
        # zero search sigma NaNs every strategy's (x - mean)/sigma update
        w_sigma = max(0.1 * float(w_std), 0.05)
        # gradient-free drivers read their (mu, sigma) seed from a
        # grad_free TUPLE (a bare True would start CMA at N(0, I), far off
        # the style-MLP output manifold)
        gf = getattr(args, "grad_free", False)
        if gf is True:
            gf = (np.asarray(w_mean), w_sigma)
        vm.register("z", shape=(512,), var_type="input",
                    grad_free=gf,
                    distribution=dist.Normal(mu=w_mean, sigma=w_sigma),
                    learning_rate=args.lr,
                    hook_fn=hooks.NormalPerturb(args.latent_noise))
        vm.register("noises", shape=(model.noise_dim(),), var_type="input",
                    learning_rate=0.01,
                    default=jnp.zeros((model.noise_dim(),)))
    else:
        vm.register("z", shape=(512,), var_type="input",
                    grad_free=getattr(args, "grad_free", False),
                    distribution=dist.Normal(sigma=1.0),
                    learning_rate=args.lr,
                    hook_fn=hooks.Compose(
                        hooks.Normalize(),
                        hooks.NormalPerturb(args.latent_noise)))
    vm.register("target", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(im, im, 3), var_type="output",
                requires_grad=False, default=weight)
    if loss_mask is not None:
        vm.register("loss_mask", shape=(im, im, 3), var_type="output",
                    requires_grad=False, default=loss_mask)
    return vm


def cars_loss_mask(im=512, model="cars"):
    """LSUN-Cars border mask: content occupies the middle 384 rows of the
    512-padded square (reference ``invert_stylegan2_cars_basincma.py:35-43``).
    Returns None for non-cars models (FFHQ images fill the frame)."""
    if model != "cars":
        return None
    m = np.zeros((im, im, 3), np.float32)
    pad = im // 8
    m[pad:im - pad] = 1.0
    return jnp.asarray(m)


def make_loss(args):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LF.ProjectionLoss(lpips_net="alex", beta=10.0)


def finish(args, opt, variables, outs, losses, default_dir):
    save_dir = args.save_dir or default_dir
    save_result(save_dir, variables, outs, losses,
                make_video=args.make_video)
    if getattr(opt, "tracked", None):
        np.save(osp.join(save_dir, "tracked.npy"), opt.tracked,
                allow_pickle=True)
    final = np.asarray(losses[-1][1]["loss"])
    print(f"done: best loss {final.min():.4f} -> {save_dir}")
    return save_dir
