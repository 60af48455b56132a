"""Gradient-free and hybrid drivers over the on-device strategy registry.

Counterparts of the reference's ``NevergradOptimizer``
(``pix2latent/optimizer/ng_optimizer.py:14-91``) and
``HybridNevergradOptimizer`` (``hybrid_ng_optimizer.py:12-81``): same
optimize() signatures, free population size, strategy chosen by name.
"""

from __future__ import annotations

from pix2latent_tpu.optimizers.base import _BaseOptimizer
from pix2latent_tpu.optimizers.ng_base import _BaseNGOptimizer
from pix2latent_tpu.utils.misc import Timer, progress_print


class NevergradOptimizer(_BaseOptimizer, _BaseNGOptimizer):
    """Gradient-free generations + optional Adam finetune."""

    def __init__(self, method, *args, **kwargs):
        _BaseOptimizer.__init__(self, *args, **kwargs)
        _BaseNGOptimizer.__init__(self, method=method)

    def optimize(self, num_samples, meta_steps, grad_steps=0, pbar=None,
                 checkpoint_path=None, checkpoint_every=1):
        """Reference semantics (``ng_optimizer.py:22-91``): ``meta_steps``
        ask→eval→tell generations at population ``num_samples``, then
        ``grad_steps`` Adam finetune on a final ask. ``checkpoint_path``
        makes the generation loop crash-safe/resumable."""
        self.setup_ng(self.var_manager, num_samples,
                      budget=meta_steps * num_samples)
        self.reject_host_checkpoint(checkpoint_path)
        self.losses, self.outs = [], []
        total_steps = meta_steps + grad_steps
        timer = Timer()

        from pix2latent_tpu.utils.checkpoint import LoopCheckpointer
        ckpt = LoopCheckpointer(checkpoint_path, self, "ng_state",
                                every=checkpoint_every)

        for i in range(ckpt.resume(), meta_steps):
            variables = self.ng_init(self.var_manager)
            out, loss = self.core.eval(variables, self.next_key(), i)
            self.out, self.loss = out, loss
            if self.log and ((i + 1) % self.log_iter == 0):
                self.log_result(variables, i + 1)
            self.ng_update(variables, inverted_loss=True, step=i)
            ckpt.save(i + 1)
            if pbar is not None:
                pbar.progress((i + 1) / total_steps)
            elif (i + 1) % self.show_iter == 0:
                progress_print("optimize", i + 1, total_steps, "c",
                               timer.avg(self.show_iter))
                timer.reset()

        variables = self.ng_init(self.var_manager)
        variables = self.core.apply_transforms(variables)
        opt_state = self.core.init_opt_state(variables)
        variables, opt_state, out, _ = self._run_inner(
            variables, opt_state, grad_steps, start_step=meta_steps,
            pbar=pbar, total_steps=total_steps, timer=timer)

        return self._final_results(variables, total_steps)


class HybridNevergradOptimizer(_BaseOptimizer, _BaseNGOptimizer):
    """BasinCMA-style loop with a pluggable gradient-free outer strategy."""

    def __init__(self, method, *args, **kwargs):
        _BaseOptimizer.__init__(self, *args, **kwargs)
        _BaseNGOptimizer.__init__(self, method=method)

    def _build_fused_generation(self, grad_steps):
        """One XLA program per generation (ask + inner Adam scan +
        inverted-frame tell + strategy update) — the treatment
        ``BasinCMAOptimizer._build_fused_generation`` gives the flagship,
        generalized over the on-device strategy registry (every strategy's
        ask/tell is a pure function of its state pytree). Per-problem data
        travels as arguments, so compiled programs cache across inversions."""
        import jax
        import jax.numpy as jnp
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

    def optimize_fused(self, num_samples, meta_steps, grad_steps,
                       last_grad_steps=300, progress_every=5,
                       checkpoint_path=None, checkpoint_every=1):
        """Hybrid-NG with one XLA dispatch per generation. Per-generation
        min tell losses land in ``self.losses`` (fetched one generation
        behind the dispatch queue), and ``checkpoint_path`` makes the
        generation loop crash-safe/resumable — fused speed no longer trades
        away observability (VERDICT.md round 2, item 6). Returns
        ``(variables, outs, losses)`` like :meth:`optimize`."""
        import jax.numpy as jnp

        from pix2latent_tpu.utils.misc import cprint

        self.setup_ng(self.var_manager, num_samples,
                      budget=meta_steps * num_samples)
        self.reject_host_checkpoint(checkpoint_path)
        self.losses, self.outs = [], []
        total_steps = meta_steps * grad_steps + last_grad_steps
        # memoize the built generation (same rule as basincma.py's
        # _fused_gens): the traced program closes over the strategy object
        # AND the grad-free variable binding, so the key must cover both —
        # cache_token() includes budget-derived hyperparameters (NGOpt's
        # routed leaf, MetaRecentering's scale), _gf_var the variable the
        # program writes asks into. Host: strategies are per-instance
        # mutable objects: a memo entry could never be hit again (fresh
        # instance per setup_ng), so storing one would only retain dead
        # host optimizers + compiled programs — build without caching.
        from pix2latent_tpu.strategies.host import HostStrategy
        if isinstance(self.ng_strategy, HostStrategy):
            gen_fn = self._build_fused_generation(grad_steps)
        else:
            cache_key = (grad_steps, self.ng_strategy.cache_token(),
                         self._gf_var)
            if not hasattr(self, "_fused_gens"):
                self._fused_gens = {}
            if cache_key not in self._fused_gens:
                self._fused_gens[cache_key] = \
                    self._build_fused_generation(grad_steps)
            gen_fn = self._fused_gens[cache_key]
        defaults = self.var_manager.defaults()

        state = self.ng_state

        from pix2latent_tpu.utils.checkpoint import FusedCheckpointer
        ckpt = FusedCheckpointer(checkpoint_path,
                                 f"fused hybrid-{self.method}",
                                 every=checkpoint_every)
        start = ckpt.resume({"state": state, "key": self._key})
        if ckpt.loaded is not None:
            state, self._key = ckpt.loaded["state"], ckpt.loaded["key"]

        prev_min = None
        for gi in range(start, meta_steps):
            carry_in, key_in = state, self._key
            state, gen_min = gen_fn(self.model.params, defaults, state,
                                    self.next_key(),
                                    jnp.asarray(gi, jnp.int32))
            if prev_min is not None:
                # prev generation's result: already computed -> free fetch
                self.losses.append(float(prev_min))
                if progress_every and gi % progress_every == 0:
                    cprint(f"(hybrid-{self.method} fused) gen "
                           f"{gi}/{meta_steps} min tell loss "
                           f"{self.losses[-1]:.4f}", "c")
            prev_min = gen_min
            # carry_in (generation gi's input) is materialized: it is the
            # loaded/initial host state at gi == start, or gen gi-1's
            # output whose min-loss was just fetched
            ckpt.save(gi, {"state": carry_in, "key": key_in})
        if prev_min is not None:
            self.losses.append(float(prev_min))
        self.ng_state = state
        ckpt.finalize(meta_steps, {"state": state, "key": self._key})

        # final long generation (skips the tell, reference semantics)
        variables = self.ng_init(self.var_manager)
        variables = self.core.apply_transforms(variables)
        opt_state = self.core.init_opt_state(variables)
        variables, opt_state, out, ys = self.core.grad_steps(
            variables, opt_state, self.next_key(), last_grad_steps,
            start_step=meta_steps * grad_steps, track=False)
        self.out = out
        import numpy as np
        self.loss = np.asarray(ys["loss"][-1])
        return self._final_results(variables, total_steps)

    def optimize(self, num_samples, meta_steps, grad_steps,
                 last_grad_steps=300, pbar=None, checkpoint_path=None,
                 checkpoint_every=1):
        """Reference semantics (``hybrid_ng_optimizer.py:23-75``): each
        generation asks a population, refines it with ``grad_steps`` Adam
        updates, and tells the refined loss; the final generation runs
        ``last_grad_steps`` and skips the tell. ``checkpoint_path`` makes
        the generation loop crash-safe/resumable."""
        self.setup_ng(self.var_manager, num_samples,
                      budget=meta_steps * num_samples)
        self.reject_host_checkpoint(checkpoint_path)
        self.losses, self.outs = [], []
        total_steps = meta_steps * grad_steps + last_grad_steps
        timer = Timer()

        from pix2latent_tpu.utils.checkpoint import LoopCheckpointer
        ckpt = LoopCheckpointer(checkpoint_path, self, "ng_state",
                                every=checkpoint_every)
        start_iter = ckpt.resume()
        step_count = start_iter * grad_steps

        for meta_iter in range(start_iter, meta_steps + 1):
            is_last = meta_iter == meta_steps
            n_inner = last_grad_steps if is_last else grad_steps

            variables = self.ng_init(self.var_manager)
            variables = self.core.apply_transforms(variables)
            opt_state = self.core.init_opt_state(variables)

            variables, opt_state, out, _ = self._run_inner(
                variables, opt_state, n_inner, start_step=step_count,
                pbar=pbar, total_steps=total_steps, timer=timer)
            step_count += n_inner

            if not is_last:
                self.ng_update(variables, inverted_loss=True, step=step_count)
                ckpt.save(meta_iter + 1)

        return self._final_results(variables, total_steps)
