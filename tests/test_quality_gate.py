"""Fixed-budget quality regression gate (VERDICT.md round 1, item 4).

bench.py asserts convergence + bf16-vs-f32 agreement on the real flagship at
run time; this pytest enforces the same thresholds on a reduced budget (tiny
BigGAN-deep, CPU) so a perf change that silently breaks optimization fails in
CI, not just on the bench host. Budget shape mirrors the reference's
(generations of inner Adam steps, ``examples/invert_biggan_basincma.py:109``).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pix2latent_tpu.loss_functions as LF
from pix2latent_tpu import VariableManager, distribution as dist, hooks
from pix2latent_tpu.models.biggan import BigGAN
from pix2latent_tpu.optimizers import BasinCMAOptimizer

RES = 128
GENS = 4
GRAD_STEPS = 5


def run_quality(dtype):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = BigGAN("biggan-deep-128", dtype=dtype, channel_width=8)
        loss_fn = LF.ProjectionLoss(lpips_net="alex", beta=10.0, dtype=dtype)

    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / float(RES - 1)
    target = jnp.asarray(np.stack([xx, yy, 0.5 * (xx + yy)], -1) * 2 - 1)

    vm = VariableManager(seed=0)
    vm.register("z", shape=(128,), var_type="input", grad_free=True,
                distribution=dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0),
                learning_rate=0.05, hook_fn=hooks.Clamp(2.0))
    vm.register("c", shape=(128,), var_type="input", learning_rate=0.01,
                default=jnp.zeros((128,)))
    vm.register("target", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=target)
    vm.register("weight", shape=(RES, RES, 3), var_type="output",
                requires_grad=False, default=jnp.ones((RES, RES, 3)))

    opt = BasinCMAOptimizer(model, vm, loss_fn, track_variables=False)
    opt.setup_cma(vm, popsize=8)
    gen_fn = opt._build_fused_generation(GRAD_STEPS)
    defaults = vm.defaults()

    state = opt.cma_state
    key = jax.random.PRNGKey(42)
    mins = []
    for i in range(GENS):
        key, sub = jax.random.split(key)
        state, gen_min = gen_fn(opt.model.params, defaults, state, sub,
                                jnp.asarray(i, jnp.int32))
        mins.append(float(gen_min))
    return mins


def test_bf16_converges_and_tracks_f32():
    mins16 = run_quality(jnp.bfloat16)
    assert np.isfinite(mins16).all(), mins16
    assert mins16[-1] < mins16[0], f"no convergence in bf16: {mins16}"

    mins32 = run_quality(jnp.float32)
    assert np.isfinite(mins32).all(), mins32
    assert mins32[-1] < mins32[0], f"no convergence in f32: {mins32}"

    delta = abs(mins16[-1] - mins32[-1]) / mins32[-1]
    assert delta < 0.15, (
        f"bf16 diverged from f32: {mins16[-1]} vs {mins32[-1]} "
        f"(delta {delta:.3f})")
