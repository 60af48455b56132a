"""End-to-end StyleGAN2 inner-loop GENERATION parity vs plain torch.

The StyleGAN2 counterpart of ``test_e2e_parity.py`` (VERDICT.md round 2,
item 7): the component goldens prove the generator+converter
(``test_stylegan2_golden``) and LPIPS (``test_lpips_golden``) in isolation;
this composes them into full inner-loop trajectories — same injected
candidates, same Adam hyperparameters, same population-mean gradient
scaling — for BOTH search modes the reference exposes
(``pix2latent/model/stylegan2.py:99-138``):

- ``z``: latent through the mapping MLP (gradients traverse the style net);
- ``w+``: direct w latent + the FLATTENED per-layer noise vector as a
  second Adam variable, exercising the wrapper's ``reshape_noise``
  (reference ``stylegan2.py:128-138``) inside the fused scan.

Per-step per-sample losses, the tell fitness, and the refined variables
must match an independently-coded torch NCHW loop.
"""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pix2latent_tpu.loss_functions as LF  # noqa: E402
from pix2latent_tpu import VariableManager  # noqa: E402
from pix2latent_tpu.losses.lpips import convert_torch_lpips  # noqa: E402
from pix2latent_tpu.models.stylegan2 import (StyleGAN2,  # noqa: E402
                                             convert_torch_stylegan2)
from pix2latent_tpu.optimizers import GradientOptimizer  # noqa: E402

from test_lpips_golden import (make_alex_state_dict, torch_alex_taps,  # noqa: E402
                               torch_lpips)
from test_stylegan2_golden import (make_state_dict, styled_conv_t,  # noqa: E402
                                   to_rgb_t, torch_stylegan2_forward)

POP = 4
N_STEPS = 4
RES = 32
LR_Z, LR_NOISE = 0.05, 0.01
BETA = 10.0


def _torch_w_forward(sd, im_res, w, noises):
    """Synthesis from w with EXPLICIT per-layer noises (the reference's
    input_is_latent path, independent transcription)."""
    log_size = int(math.log2(im_res))
    batch = w.shape[0]
    x = sd["input.input"].repeat(batch, 1, 1, 1)
    x = styled_conv_t(x, w, noises[0], sd, "conv1")
    skip = to_rgb_t(x, w, sd, "to_rgb1")
    ni = 1
    for li in range(log_size - 2):
        x = styled_conv_t(x, w, noises[ni], sd, f"convs.{2 * li}", up=True)
        x = styled_conv_t(x, w, noises[ni + 1], sd, f"convs.{2 * li + 1}")
        skip = to_rgb_t(x, w, sd, f"to_rgbs.{li}", skip)
        ni += 2
    return skip


def _torch_per_sample(out, target_t, lsd):
    out = out.clamp(-1.0, 1.0)
    tgt = target_t.expand_as(out)
    rec = (out - tgt).abs().mean(dim=(1, 2, 3))
    per = torch_lpips(out, tgt, lsd, torch_alex_taps,
                      spatial=True).mean(dim=(1, 2, 3))
    return rec + BETA * per


def _jax_problem(sd, lsd, model, target_nchw, extra_vars=()):
    loss_fn = LF.ProjectionLoss(
        lpips_net="alex", beta=BETA,
        lpips_params=convert_torch_lpips(lsd, net="alex"))
    target = jnp.asarray(target_nchw.transpose(0, 2, 3, 1)[0])
    vm = VariableManager(seed=0)
    vm.register("z", shape=(512,), var_type="input", learning_rate=LR_Z)
    for name, shape, lr in extra_vars:
        vm.register(name, shape=shape, var_type="input", learning_rate=lr)
    vm.register("target", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=jnp.ones((RES, RES, 3)))
    opt = GradientOptimizer(model, vm, loss_fn, track_variables=False)
    return opt.core, vm


def _run_jax(core, vm, inits):
    variables = vm.initialize(num_samples=POP, key=jax.random.PRNGKey(1))
    for name, val in inits.items():
        variables["input"][name] = jnp.asarray(val)
    opt_state = core.init_opt_state(variables)
    variables, opt_state, out, ys = core.grad_steps(
        variables, opt_state, jax.random.PRNGKey(2), N_STEPS)
    tell = np.asarray(core.tell_loss(variables, jax.random.PRNGKey(3),
                                     N_STEPS, inverted=True))
    return variables, np.asarray(ys["loss"]), tell


def test_z_path_trajectory_matches_torch():
    """z search: gradients traverse the mapping MLP + synthesis + LPIPS."""
    rng = np.random.RandomState(11)
    sd = make_state_dict(rng, RES)
    # the golden builder stores unit-scale style weights, which under the
    # mapping MLP's lr_mul=0.01 runtime scaling collapse every z to the
    # same w (zero gradient signal — the exact collapse examples/common.py
    # documents for random inits). Real rosinality checkpoints store
    # weight * (1/lr_mul); emulate that so the z path actually optimizes.
    for i in range(8):
        sd[f"style.{i + 1}.weight"] = sd[f"style.{i + 1}.weight"] * 100.0
    lsd = make_alex_state_dict(rng)

    z_star = torch.tensor(rng.randn(1, 512).astype(np.float32))
    with torch.no_grad():
        target_t = torch_stylegan2_forward(sd, RES, z_star).clamp(-1, 1)

    z0 = rng.randn(POP, 512).astype(np.float32)

    # torch loop
    z_t = torch.tensor(z0.copy(), requires_grad=True)
    adam = torch.optim.Adam([z_t], lr=LR_Z, betas=(0.9, 0.999), eps=1e-8)
    torch_losses = []
    for _ in range(N_STEPS):
        per = _torch_per_sample(torch_stylegan2_forward(sd, RES, z_t),
                                target_t, lsd)
        torch_losses.append(per.detach().numpy().copy())
        adam.zero_grad()
        per.mean().backward()
        adam.step()
    with torch.no_grad():
        torch_tell = _torch_per_sample(
            torch_stylegan2_forward(sd, RES, z_t), target_t, lsd).numpy()

    # framework (real wrapper: search='z' forward + clip)
    params = convert_torch_stylegan2(sd, im_res=RES)
    StyleGAN2.MODELS["tiny32"] = RES
    try:
        model = StyleGAN2("tiny32", search="z", params=params)
        core, vm = _jax_problem(sd, lsd, model, target_t.numpy())
        variables, jax_losses, jax_tell = _run_jax(core, vm, {"z": z0})
    finally:
        StyleGAN2.MODELS.pop("tiny32", None)

    for step, want in enumerate(torch_losses):
        np.testing.assert_allclose(
            jax_losses[step], want, rtol=2e-3, atol=5e-5,
            err_msg=f"per-sample loss diverged at inner step {step}")
    np.testing.assert_allclose(jax_tell, torch_tell, rtol=2e-3, atol=5e-5)
    assert jax_losses[-1].mean() < jax_losses[0].mean()
    np.testing.assert_allclose(np.asarray(variables["input"]["z"]),
                               z_t.detach().numpy(), rtol=2e-3, atol=2.5e-3)


def test_wplus_path_trajectory_matches_torch():
    """w+ search: direct w latent + flattened noise variable, exercising
    reshape_noise inside the fused scan (reference stylegan2.py:122-138)."""
    rng = np.random.RandomState(23)
    sd = make_state_dict(rng, RES)
    lsd = make_alex_state_dict(rng)

    params = convert_torch_stylegan2(sd, im_res=RES)
    StyleGAN2.MODELS["tiny32"] = RES
    try:
        model = StyleGAN2("tiny32", search="w+", params=params)
        noise_dim = model.noise_dim()
        noise_shapes = model.noise_shape           # [[1,H,W,1], ...]

        w_star = torch.tensor(rng.randn(1, 512).astype(np.float32) * 0.5)
        star_noises = [torch.zeros(1, 1, s[1], s[2])
                       for s in noise_shapes]
        with torch.no_grad():
            target_t = _torch_w_forward(sd, RES, w_star,
                                        star_noises).clamp(-1, 1)

        w0 = rng.randn(POP, 512).astype(np.float32) * 0.5
        n0 = (rng.randn(POP, noise_dim).astype(np.float32) * 0.1)

        # torch loop: flat noise split+reshaped INSIDE the forward, so the
        # Adam state layout matches the framework's flat variable
        w_t = torch.tensor(w0.copy(), requires_grad=True)
        n_t = torch.tensor(n0.copy(), requires_grad=True)
        adam = torch.optim.Adam([{"params": [w_t], "lr": LR_Z},
                                 {"params": [n_t], "lr": LR_NOISE}],
                                betas=(0.9, 0.999), eps=1e-8)

        def torch_forward():
            noises, st = [], 0
            for s in noise_shapes:
                h, w = s[1], s[2]
                noises.append(n_t[:, st:st + h * w].reshape(POP, 1, h, w))
                st += h * w
            return _torch_w_forward(sd, RES, w_t, noises)

        torch_losses = []
        for _ in range(N_STEPS):
            per = _torch_per_sample(torch_forward(), target_t, lsd)
            torch_losses.append(per.detach().numpy().copy())
            adam.zero_grad()
            per.mean().backward()
            adam.step()
        with torch.no_grad():
            torch_tell = _torch_per_sample(torch_forward(), target_t,
                                           lsd).numpy()

        core, vm = _jax_problem(
            sd, lsd, model, target_t.numpy(),
            extra_vars=(("noises", (noise_dim,), LR_NOISE),))
        variables, jax_losses, jax_tell = _run_jax(
            core, vm, {"z": w0, "noises": n0})
    finally:
        StyleGAN2.MODELS.pop("tiny32", None)

    for step, want in enumerate(torch_losses):
        np.testing.assert_allclose(
            jax_losses[step], want, rtol=2e-3, atol=5e-5,
            err_msg=f"per-sample loss diverged at inner step {step}")
    np.testing.assert_allclose(jax_tell, torch_tell, rtol=2e-3, atol=5e-5)
    assert jax_losses[-1].mean() < jax_losses[0].mean()
    np.testing.assert_allclose(np.asarray(variables["input"]["z"]),
                               w_t.detach().numpy(), rtol=2e-3, atol=2.5e-3)
    np.testing.assert_allclose(np.asarray(variables["input"]["noises"]),
                               n_t.detach().numpy(), rtol=2e-3, atol=2.5e-3)
