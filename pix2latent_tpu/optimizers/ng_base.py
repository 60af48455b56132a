"""Gradient-free strategy driver mixin (the Nevergrad-bridge replacement).

Counterpart of the reference's ``_BaseNevergradOptimizer``
(``pix2latent/optimizer/base_ng_optimizer.py:10-171``): same
setup/init/update flow, but the strategy registry is the on-device
``pix2latent_tpu.strategies.registry`` — population size is free (unlike
PyCMA) and the whole ask/eval/tell loop stays on device.

Deliberate deviation: the reference special-cases nevergrad methods flagged
``no_parallelization`` by asking ONE candidate per step
(``base_ng_optimizer.py:36-41,100-102``). Serial asks idle a TPU, so that
mode is not reproduced; inherently-sequential methods are represented by
batched-λ variants instead (e.g. ``OnePlusOne`` evaluates λ parallel
mutations per generation with a λ-adjusted 1/5th success rule).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.parallel.mesh import (pad_population)
from pix2latent_tpu.strategies.registry import (is_valid_method, registry,
                                                resolve)
from pix2latent_tpu.utils.misc import cprint


class _BaseNGOptimizer:
    """Mixin used jointly with ``_BaseOptimizer``. Only a single grad-free
    variable is supported (the reference asserts the same,
    ``base_ng_optimizer.py:86-88``)."""

    def __init__(self, method: str):
        self.method = method
        self.valid_methods = sorted(registry) + ["Host:<backend>"]
        assert is_valid_method(method), (
            f"unknown strategy: {method}; available: {self.valid_methods}")
        self.ng_strategy = None
        self.ng_state = None
        self._gf_var = None
        self._sampled = None

    def setup_ng(self, var_manager, num_samples: int, budget=None):
        """Initialize the strategy for the grad-free variable (reference
        ``base_ng_optimizer.py:51-89``). ``budget`` is the total evaluation
        count (nevergrad's definition, generations x population); it is
        forwarded to factories that route or scale on it (``NGOpt``'s
        portfolio branches, ``MetaRecentering``'s recentering scale) and
        ignored by fixed algorithms."""
        gf = var_manager.grad_free_variables()
        assert len(gf) == 1, (
            "currently only a single variable can be optimized gradient-free "
            f"but got: {[(vt, n) for vt, n, _ in gf]}")
        var_type, name, spec = gf[0]
        shape = spec["shape"]
        dim = int(np.prod(shape))

        mu, sigma = None, 1.0
        if isinstance(spec["grad_free"], tuple):
            m, s = spec["grad_free"]
            if m is not None:
                mu = np.asarray(m, np.float32).reshape(-1)
            if s is not None:
                sigma = float(s)

        requested = int(num_samples)
        num_samples = pad_population(num_samples, getattr(self, "mesh", None))
        if budget is not None and num_samples != requested:
            # keep budget consistent with the padded worker count: callers
            # compute budget = generations x requested population, and the
            # NGOpt routing branches compare workers against budget — mixed
            # units would silently flip branches on meshed runs only
            budget = budget * num_samples / max(requested, 1)
        factory = resolve(self.method)
        kwargs = {}
        if budget is not None:
            import inspect
            try:
                if "budget" in inspect.signature(factory).parameters:
                    kwargs["budget"] = budget
            except (TypeError, ValueError):
                pass
        self.ng_strategy = factory(dim, num_samples, mu, sigma, **kwargs)
        self.ng_state = self.ng_strategy.init(self.next_key())
        self.num_samples = num_samples
        self._gf_var = (var_type, name, shape)
        cprint(f"({self.method}) number of samples: {num_samples}", "y")

    def reject_host_checkpoint(self, checkpoint_path):
        """``Host:`` strategies cannot checkpoint: the real optimizer state
        lives in the wrapped host Python object (``strategies/host.py``
        saves only the i32 ordering token), so a resumed run would print
        "resumed at generation N" while the search silently restarts from
        scratch. Refuse loudly instead of degrading silently."""
        from pix2latent_tpu.strategies.host import HostStrategy
        if checkpoint_path and isinstance(self.ng_strategy, HostStrategy):
            raise ValueError(
                f"checkpoint_path is unsupported with '{self.method}': "
                "Host:<backend> strategies keep their state in the wrapped "
                "host optimizer object, which cannot be serialized — a "
                "resume would silently restart the search. Drop "
                "checkpoint_path or use an on-device strategy.")

    def ng_init(self, var_manager, num_samples: Optional[int] = None, key=None):
        """Fresh population with the grad-free variable filled from ask
        (reference ``base_ng_optimizer.py:92-117``)."""
        if key is None:
            key = self.next_key()
        k_init, k_ask = jax.random.split(key)
        variables = var_manager.initialize(num_samples=self.num_samples,
                                           key=k_init)
        x, aux = self.ng_strategy.ask_with_aux(self.ng_state, k_ask)
        var_type, name, shape = self._gf_var
        variables[var_type][name] = x.reshape(self.num_samples, *shape)
        # defensive copy: the reshaped view shares the buffer that the
        # donated grad-scan consumes; the tell needs the original ask
        self._sampled = jnp.array(x, copy=True)
        self._ask_aux = aux
        return self.core.place(variables)

    def ng_update(self, variables, loss=None, inverted_loss=False, step=0):
        """Tell the strategy the population fitness (reference
        ``base_ng_optimizer.py:120-171``)."""
        if loss is None:
            loss = self.core.tell_loss(variables, self.next_key(), step,
                                       inverted=inverted_loss)
        from pix2latent_tpu.strategies.cma import sanitize_fitness
        self.ng_state = self.ng_strategy.tell(
            self.ng_state, self._sampled,
            sanitize_fitness(jnp.asarray(loss)),
            aux=getattr(self, "_ask_aux", None))
        return loss

    # -- fused one-dispatch generation (shared by Hybrid and eval-only NG) - #

    def _build_fused_generation(self, grad_steps):
        """One XLA program per generation (ask + inner Adam scan
        [``grad_steps=0`` = pure eval-only] + inverted-frame tell +
        strategy update) — the treatment
        ``BasinCMAOptimizer._build_fused_generation`` gives the flagship,
        generalized over the on-device strategy registry (every strategy's
        ask/tell is a pure function of its state pytree). Per-problem data
        travels as arguments, so compiled programs cache across inversions."""
        import optax

        from pix2latent_tpu.strategies.cma import sanitize_fitness

        vm = self.var_manager
        core = self.core
        var_type, name, shape = self._gf_var
        n = self.num_samples
        strat = self.ng_strategy

        def generation(params, defaults, state, key, gen_idx):
            k_init, k_ask, k_scan, k_tell = jax.random.split(key, 4)
            variables = vm.initialize(num_samples=n, key=k_init,
                                      defaults=defaults)
            x, aux = strat.ask_with_aux(state, k_ask)
            variables[var_type][name] = x.reshape(n, *shape)
            variables = core.place_in_graph(variables)  # no-op without mesh
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
            (variables, opt_state), _ = jax.lax.scan(
                inner, (variables, opt_state), (steps, keys))

            tell_fn = core._build("tell_loss_raw", inverted=True)
            loss = tell_fn(params, variables, k_tell,
                           gen_idx * grad_steps + grad_steps,
                           defaults=defaults, ctx=ctx)
            state = strat.tell(state, x, sanitize_fitness(loss), aux=aux)
            return state, jnp.min(loss)

        return jax.jit(generation)

    def _get_fused_gen(self, grad_steps):
        """Memoized fused generation. The traced program closes over the
        strategy object AND the grad-free variable binding, so the key must
        cover both — ``cache_token()`` includes budget-derived
        hyperparameters (NGOpt's routed leaf, MetaRecentering's scale),
        ``_gf_var`` the variable the program writes asks into. ``Host:``
        strategies are per-instance mutable objects: a memo entry could
        never be hit again (fresh instance per setup_ng), so storing one
        would only retain dead host optimizers + compiled programs — build
        without caching."""
        from pix2latent_tpu.strategies.host import HostStrategy
        if isinstance(self.ng_strategy, HostStrategy):
            return self._build_fused_generation(grad_steps)
        if not hasattr(self, "_fused_gens"):
            self._fused_gens = {}
        key = (grad_steps, self.ng_strategy.cache_token(), self._gf_var)
        if key not in self._fused_gens:
            self._fused_gens[key] = self._build_fused_generation(grad_steps)
        return self._fused_gens[key]
