"""CMA driver mixin: ask/tell bookkeeping between the VariableManager and the
on-device CMA-ES strategy.

Counterpart of the reference's ``_BaseCMAOptimizer``
(``pix2latent/optimizer/base_cma_optimizer.py:9-141``), with PyCMA replaced by
``pix2latent_tpu.strategies.cma`` — the ask, the tell, and the covariance
update all stay on device; nothing crosses to the host per generation.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.parallel.mesh import pad_population
from pix2latent_tpu.strategies import cma
from pix2latent_tpu.utils.misc import cprint


class _BaseCMAOptimizer:
    """Mixin used jointly with ``_BaseOptimizer`` (same pattern as the
    reference). Only a single grad-free variable may be CMA-optimized —
    the same constraint the reference asserts
    (``base_cma_optimizer.py:64-66``)."""

    def __init__(self):
        self.num_samples = -1
        self.cma_params = None
        self.cma_state = None
        self._gf_var = None          # (var_type, name, shape)
        self._sampled = None         # last asked candidates [pop, dim]

    def setup_cma(self, var_manager, popsize: Optional[int] = None,
                  active: bool = False):
        """Initialize CMA for the (single) variable flagged ``grad_free``
        (reference ``base_cma_optimizer.py:28-67``). ``grad_free`` may be
        True or a ``(mu, sigma)`` tuple seeding the search distribution.
        ``active=True`` enables aCMA negative-weight covariance updates
        (PyCMA's default mode, which the reference inherited)."""
        gf = var_manager.grad_free_variables()
        assert len(gf) == 1, (
            "currently only a single variable can be optimized via CMA "
            f"but got: {[(vt, n) for vt, n, _ in gf]}")
        var_type, name, spec = gf[0]
        shape = spec["shape"]
        dim = int(np.prod(shape))

        sigma = 1.0
        mu = np.zeros(dim, np.float32)
        if isinstance(spec["grad_free"], tuple):
            m, s = spec["grad_free"]
            if m is not None:
                mu = np.asarray(m, np.float32).reshape(-1)
                assert mu.size == dim
            if s is not None:
                sigma = float(s)

        if popsize is None:
            popsize = cma.default_popsize(dim)
        popsize = pad_population(popsize, getattr(self, "mesh", None))

        self.cma_params, self.cma_state = cma.init(mu, sigma, popsize,
                                                   active=active)
        if getattr(self, "mesh", None) is not None:
            self.cma_state = self.core.place_replicated(self.cma_state)
        self.num_samples = popsize
        self._gf_var = (var_type, name, shape)
        cprint(f"(cma-es) number of samples: {self.num_samples}", "y")

    def cma_init(self, var_manager, key=None):
        """Fresh population with the grad-free variable filled from CMA ask
        (reference ``base_cma_optimizer.py:71-91``). Returns variables; the
        raw asked candidates are kept for the tell."""
        if key is None:
            key = self.next_key()
        k_init, k_ask = jax.random.split(key)
        variables = var_manager.initialize(num_samples=self.num_samples,
                                           key=k_init)
        x = cma.ask(self.cma_params, self.cma_state, k_ask)
        var_type, name, shape = self._gf_var
        variables[var_type][name] = x.reshape(self.num_samples, *shape)
        # defensive copy: the reshaped view shares the buffer that the
        # donated grad-scan consumes; the tell needs the original ask
        self._sampled = jnp.array(x, copy=True)
        return self.core.place(variables)

    def cma_update(self, variables, loss=None, inverted_loss=False, step=0):
        """Tell CMA the fitness of the current population (reference
        ``base_cma_optimizer.py:95-141``): if no loss is given it is
        recomputed fresh; with ``inverted_loss`` and a registered transform
        the loss is evaluated in the original (un-warped) frame."""
        if loss is None:
            loss = self.core.tell_loss(variables, self.next_key(), step,
                                       inverted=inverted_loss)
        self.cma_state = cma.tell(self.cma_params, self.cma_state,
                                  self._sampled, jnp.asarray(loss))
        return loss

    # -- fused one-dispatch generation (shared by BasinCMA and CMA) -------- #

    def _build_fused_generation(self, grad_steps):
        """One XLA program per generation: fresh init + CMA ask + scanned
        inner Adam steps (``grad_steps=0`` = pure eval-only generation) +
        inverted-frame tell + CMA update. A host meta loop dispatches it
        once per generation (a ``lax.scan`` over generations measured ~4x
        slower — the eigh in the CMA tell lowers badly inside a scan body
        on TPU).

        All per-problem data (model params, variable defaults — i.e. the
        target image) travels as ARGUMENTS, so the compiled program is
        image-independent and caches across inversions. The loss's target-
        side context (LPIPS target feature pyramid) is precomputed once,
        outside the inner scan.
        """
        import optax

        vm = self.var_manager
        core = self.core
        var_type, name, shape = self._gf_var
        n = self.num_samples

        def generation(params, defaults, state, key, gen_idx):
            k_init, k_ask, k_scan, k_tell = jax.random.split(key, 4)
            variables = vm.initialize(num_samples=n, key=k_init,
                                      defaults=defaults)
            x = cma.ask(self.cma_params, state, k_ask)
            variables[var_type][name] = x.reshape(n, *shape)
            # pin the data-parallel layout before GSPMD propagates the
            # replicated CMA-state sharding onto the population (no-op
            # without a mesh)
            variables = core.place_in_graph(variables)
            variables = core.apply_transforms(variables)
            variables = core._dedupe_outputs(variables)
            ctx = core._make_ctx(variables)
            opt_state = core.init_opt_state(variables)

            def inner(c, xs2):
                variables, opt_state = c
                i, k = xs2
                variables = vm.apply_hooks(k, variables, i)
                per_sample, _, grads = core._value_and_grad(
                    params, variables, ctx)
                updates, opt_state = core.optimizer.update(
                    grads, opt_state, variables)
                variables = optax.apply_updates(variables, updates)
                return (variables, opt_state), per_sample

            steps = gen_idx * grad_steps + jnp.arange(grad_steps)
            keys = jax.random.split(k_scan, grad_steps)
            (variables, opt_state), inner_losses = jax.lax.scan(
                inner, (variables, opt_state), (steps, keys))

            tell_fn_inner = core._build("tell_loss_raw", inverted=True)
            loss = tell_fn_inner(params, variables, k_tell,
                                 gen_idx * grad_steps + grad_steps,
                                 defaults=defaults, ctx=ctx)
            state = cma.tell(self.cma_params, state, x, loss)
            return state, jnp.min(loss)

        return jax.jit(generation)

    def _get_fused_gen(self, grad_steps):
        """Memoized fused generation: the traced program embeds cma_params
        (weights) and the grad-free variable binding, so the cache key must
        cover everything that determines them, not just grad_steps."""
        if not hasattr(self, "_fused_gens"):
            self._fused_gens = {}
        key = (grad_steps, self.cma_params.popsize, self.cma_params.active,
               self._gf_var)
        if key not in self._fused_gens:
            self._fused_gens[key] = self._build_fused_generation(grad_steps)
        return self._fused_gens[key]
