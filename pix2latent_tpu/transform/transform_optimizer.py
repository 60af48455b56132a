"""Transform-search BasinCMA with variable propagation.

Counterpart of the reference's ``TransformBasinCMAOptimizer``
(``pix2latent/transform/transform_optimizer.py:20-255``): CMA searches the
transform parameter ``t`` while an inner Adam loop re-optimizes the latent;
*variable propagation* carries an EMA of the best-loss latent across
generations and resamples each new population around it with annealed noise
(optionally renormalized), which massively cuts the inner-loop budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.optimizers.base import _BaseOptimizer
from pix2latent_tpu.optimizers.cma_base import _BaseCMAOptimizer
from pix2latent_tpu.utils.image import to_grid, to_image
from pix2latent_tpu.utils.misc import Timer


class TransformBasinCMAOptimizer(_BaseOptimizer, _BaseCMAOptimizer):

    def __init__(self, *args, **kwargs):
        _BaseOptimizer.__init__(self, *args, **kwargs)
        _BaseCMAOptimizer.__init__(self)
        self.variables_to_propagate = []
        self.vp_means = {}
        # names whose vp_means hold a *real* statistic (vs a zero
        # placeholder pre-seeded for checkpoint structure stability)
        self._vp_seeded = set()

    # -- variable propagation (reference transform_optimizer.py:53-158) -- #

    def set_variable_propagation(self, variable_name):
        """Mark an input variable whose best value should seed the next
        generation (reference ``transform_optimizer.py:53-61``)."""
        if variable_name in self.variables_to_propagate:
            print(f"variable {variable_name} already exists")
            return
        self.variables_to_propagate.append(variable_name)

    def del_variable_propagation(self, variable_name):
        if variable_name in self.variables_to_propagate:
            self.variables_to_propagate.remove(variable_name)

    def update_propagation_variable_statistic(self, variables, loss,
                                              ema_beta=0.5):
        """EMA toward the best-loss sample's value
        (reference ``transform_optimizer.py:74-108``)."""
        loss = np.asarray(loss)
        loss = np.where(np.isfinite(loss), loss, np.inf)  # nan-candidates lose
        best = int(np.argmin(loss))
        for var_name in self.variables_to_propagate:
            if var_name not in variables.get("input", {}):
                raise RuntimeError(
                    f"variable propagation is set for {var_name} but no such "
                    "variable was found")
            data = variables["input"][var_name]
            if var_name not in self._vp_seeded:
                self.vp_means[var_name] = jnp.mean(data, axis=0)
                self._vp_seeded.add(var_name)
            current = data[best]
            self.vp_means[var_name] = (
                (1.0 - ema_beta) * self.vp_means[var_name] + ema_beta * current)

    def propagate_variable(self, variables, curr_iter, total_iter,
                           magnitude=1.0, renormalize=True):
        """Resample the propagated variables around the EMA mean with noise
        annealed by progress (reference ``transform_optimizer.py:112-158``)."""
        out = {vt: dict(d) for vt, d in variables.items()}
        for var_name in self.variables_to_propagate:
            if var_name not in out.get("input", {}):
                raise RuntimeError(
                    f"variable propagation is set for {var_name} but no such "
                    "variable was found")
            data = out["input"][var_name]
            if var_name not in self._vp_seeded:
                self.vp_means[var_name] = jnp.mean(data, axis=0)
                self._vp_seeded.add(var_name)
            z_sigma = magnitude * (1.0 - curr_iter / float(total_iter))
            noise = jax.random.normal(self.next_key(), data.shape, data.dtype)
            new = self.vp_means[var_name][None] + z_sigma * noise
            if renormalize:
                axes = tuple(range(1, new.ndim))
                mean = jnp.mean(new, axis=axes, keepdims=True)
                std = jnp.std(new, axis=axes, keepdims=True, ddof=1)
                new = (new - mean) / (std + 1e-12)
            out["input"][var_name] = new
        return out

    # -- candidate tracking ----------------------------------------------- #

    def get_candidate(self):
        """Best transform parameter found (reference
        ``transform_optimizer.py:161-162``). Returns ``None`` when no
        generation ever produced a finite loss — the checkpointed path
        pre-seeds ``_candidate`` with a zero placeholder for pytree
        stability, and that placeholder must not masquerade as a result."""
        if self._candidate is not None and not np.isfinite(self._best_loss):
            return None
        return self._candidate

    def vis_transform(self, variables):
        """Collage of the warped target*weight (reference
        ``transform_optimizer.py:34-49``)."""
        target = np.asarray(variables["output"]["target"])
        weight = np.asarray(variables["output"]["weight"])
        im = to_image(to_grid(target * weight))
        if self.log_resize_factor is not None:
            from pix2latent_tpu.utils.image import smart_resize
            h, w = im.shape[:2]
            im = smart_resize(im, (int(h * self.log_resize_factor),
                                   int(w * self.log_resize_factor)))
        self.transform_outs.append(im)

    # -- fused driver (one XLA dispatch per generation) --------------------- #

    def _build_fused_generation(self, grad_steps, meta_steps, with_tell,
                                ema_beta=0.5, magnitude=1.0,
                                renormalize=True, jit=True):
        """One XLA program per transform-search generation: CMA ask of ``t``
        + variable propagation (resample z around the EMA of the best z,
        annealed noise) + warped-target inner Adam scan + inverted-frame
        tell + CMA update + EMA/candidate tracking. Mirrors the semantics of
        :meth:`optimize` generation-for-generation; per-problem data
        (defaults) and all evolving state travel as arguments, so the
        program caches across inversions.
        """
        import optax

        from pix2latent_tpu.strategies import cma

        vm = self.var_manager
        core = self.core
        gf_type, gf_name, gf_shape = self._gf_var
        n = self.num_samples
        prop_names = list(self.variables_to_propagate)

        def generation(params, defaults, carry, key, gen_idx):
            cma_state, vp_means, best_loss, best_t = carry
            k_init, k_ask, k_prop, k_scan, k_tell = jax.random.split(key, 5)

            variables = vm.initialize(num_samples=n, key=k_init,
                                      defaults=defaults)
            t = cma.ask(self.cma_params, cma_state, k_ask)
            variables[gf_type][gf_name] = t.reshape(n, *gf_shape)

            # variable propagation (skipped at gen 0, before any stats)
            gi = gen_idx.astype(jnp.float32)
            prop_keys = jax.random.split(k_prop, max(len(prop_names), 1))
            for pk, name in zip(prop_keys, prop_names):
                data = variables["input"][name]
                z_sigma = magnitude * (1.0 - gi / float(meta_steps))
                noise = jax.random.normal(pk, data.shape, data.dtype)
                new = vp_means[name][None] + z_sigma * noise
                if renormalize:
                    axes = tuple(range(1, new.ndim))
                    mean = jnp.mean(new, axis=axes, keepdims=True)
                    std = jnp.std(new, axis=axes, keepdims=True, ddof=1)
                    new = (new - mean) / (std + 1e-12)
                variables["input"][name] = jnp.where(gen_idx > 0, new, data)

            variables = core.place_in_graph(variables)  # no-op without mesh
            variables = core.apply_transforms(variables)
            variables = core._dedupe_outputs(variables)
            ctx = core._make_ctx(variables)
            opt_state = core.init_opt_state(variables)

            def inner(c, xs):
                variables, opt_state = c
                i, k = xs
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

            tell_fn = core._build("tell_loss_raw", inverted=True)
            loss = tell_fn(params, variables, k_tell,
                           gen_idx * grad_steps + grad_steps,
                           defaults=defaults, ctx=ctx)
            # last Adam step's per-sample warped-target loss: what the
            # unfused driver leaves in self.loss (base.py:_run_inner), so
            # both drivers report the same quantity (the inverted tell loss
            # stays internal to selection/telling)
            inner_final = inner_losses[-1] if grad_steps > 0 else loss
            if with_tell:
                cma_state = cma.tell(self.cma_params, cma_state, t, loss)

            # EMA toward the best-loss sample (init to population mean at
            # gen 0, as update_propagation_variable_statistic does). Losses
            # can be non-finite (near-zero-scale candidates whose inverse
            # warp divides by ~0) — they must lose, not poison the tracking.
            loss = jnp.where(jnp.isfinite(loss), loss, jnp.inf)
            best = jnp.argmin(loss)
            new_vp = {}
            for name in prop_names:
                data = variables["input"][name]
                base = jnp.where(gen_idx > 0, vp_means[name],
                                 jnp.mean(data, axis=0))
                new_vp[name] = (1.0 - ema_beta) * base + ema_beta * data[best]
            vp_means = {**vp_means, **new_vp}

            # candidate tracking (reference transform_optimizer.py:236-239)
            lmin = jnp.min(loss)          # finite by the sanitization above
            improved = lmin < best_loss
            best_t = jnp.where(improved, t[best], best_t)
            best_loss = jnp.minimum(lmin, best_loss)

            carry = (cma_state, vp_means, best_loss, best_t)
            return carry, (variables, loss, inner_final)

        return jax.jit(generation) if jit else generation

    def _get_fused_generation(self, grad_steps, meta_steps, with_tell,
                              batched=False):
        """Memoized fused generation (same rule as ``basincma.py``'s
        ``_fused_gens``: the traced program closes over ``cma_params``, so
        the key covers everything that determines them). ``batched=True``
        returns the generation vmapped over a leading searches axis —
        per-search (defaults, carry, key), shared (params, gen_idx)."""
        if not hasattr(self, "_fused_gens"):
            self._fused_gens = {}
        # the traced program also closes over the grad-free binding and the
        # propagation list — same rule as the hybrid driver's memo
        key = (grad_steps, meta_steps, with_tell, batched,
               self.cma_params.popsize, self.cma_params.active,
               self.cma_params.n, self._gf_var,
               tuple(self.variables_to_propagate))
        if key not in self._fused_gens:
            if batched:
                raw = self._build_fused_generation(
                    grad_steps, meta_steps, with_tell, jit=False)
                self._fused_gens[key] = jax.jit(
                    jax.vmap(raw, in_axes=(None, 0, 0, 0, None)))
            else:
                self._fused_gens[key] = self._build_fused_generation(
                    grad_steps, meta_steps, with_tell)
        return self._fused_gens[key]

    def optimize_fused_batched(self, batch_defaults, meta_steps, grad_steps,
                               last_grad_steps=None, popsize=None,
                               active=False, seeds=None,
                               checkpoint_path=None, checkpoint_every=1):
        """M independent alignment searches in ONE compiled program.

        Capability upgrade over the reference (one transform search per
        process, ``transform_optimizer.py:165-255``) in the same spirit as
        :class:`~pix2latent_tpu.optimizers.batched.BatchedBasinCMAOptimizer`:
        the transform search is the most chip-underfilling workload (pop 7
        at d=3), so M searches — each with its own CMA state, propagation
        EMA, and candidate tracking — are vmapped over a leading searches
        axis and dispatched as one XLA program per generation.

        Args:
            batch_defaults: ``{name: [M, ...]}`` stacked per-search defaults
                (e.g. ``target``/``weight``); every other registered default
                is shared and broadcast.
            seeds: optional length-M int seeds. Search i consumes the
                exact RNG stream a solo :meth:`optimize_fused` run with
                ``seed=seeds[i]`` would — M batched searches match M
                sequential ones (the parity contract,
                ``tests/test_transform_batched.py``).
            checkpoint_path: crash-safe resume; the vmapped carry + the M
                key streams are written every ``checkpoint_every``
                generations (between dispatches — the carry is on host
                anyway).

        Returns a dict with per-search ``candidate [M, *t_shape]``,
        ``best_loss [M]``, final-generation inverted-frame ``loss
        [M, pop]``, last-Adam-step warped-target ``inner_loss [M, pop]``
        (the quantity :meth:`optimize` leaves in ``self.loss``),
        ``candidate_out [M, H, W, C]`` (best warped target), plus the final
        ``variables``/``cma_states``/``vp_means`` (all batched over M).
        """
        self.setup_cma(self.var_manager, popsize=popsize, active=active)
        if last_grad_steps is None:
            last_grad_steps = grad_steps
        gf_type, gf_name, gf_shape = self._gf_var
        dim = int(np.prod(gf_shape))

        batch_defaults = {k: jnp.asarray(v)
                          for k, v in batch_defaults.items()}
        m = next(iter(batch_defaults.values())).shape[0]
        for k, v in batch_defaults.items():
            assert v.shape[0] == m, (k, v.shape, m)
        defaults = self.var_manager.defaults()
        unknown = set(batch_defaults) - set(defaults)
        assert not unknown, (
            f"batch_defaults for unregistered/defaultless variables: "
            f"{sorted(unknown)}")
        defaults = {
            name: (batch_defaults[name] if name in batch_defaults
                   else jnp.broadcast_to(jnp.asarray(v),
                                         (m, *jnp.shape(v))))
            for name, v in defaults.items()}

        gen_fn = self._get_fused_generation(grad_steps, meta_steps,
                                            with_tell=True, batched=True)
        final_fn = self._get_fused_generation(last_grad_steps, meta_steps,
                                              with_tell=False, batched=True)

        probe = self.var_manager.initialize(1, key=jax.random.PRNGKey(0))
        vp0 = {name: jnp.zeros((m, *probe["input"][name].shape[1:]))
               for name in self.variables_to_propagate}
        state_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (m, *a.shape)), self.cma_state)
        carry = (state_b, vp0, jnp.full((m,), jnp.inf, jnp.float32),
                 jnp.zeros((m, dim), jnp.float32))

        if seeds is None:
            seeds = np.arange(m)
        seeds = np.asarray(seeds)
        assert seeds.shape == (m,), (seeds.shape, m)
        key_state = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))

        def next_keys():
            nonlocal key_state
            pair = jax.vmap(jax.random.split)(key_state)   # [M, 2, key]
            key_state = pair[:, 0]
            return pair[:, 1]

        from pix2latent_tpu.utils.checkpoint import FusedCheckpointer
        ckpt = FusedCheckpointer(checkpoint_path,
                                 "batched transform search",
                                 every=checkpoint_every)
        start = ckpt.resume({"carry": carry, "keys": key_state})
        if ckpt.loaded is not None:
            carry, key_state = ckpt.loaded["carry"], ckpt.loaded["keys"]

        self.losses = []
        prev_min = None
        for gi in range(start, meta_steps - 1):
            carry_in, keys_in = carry, key_state
            carry, (variables, loss, inner_loss) = gen_fn(
                self.model.params, defaults, carry, next_keys(),
                jnp.asarray(gi, jnp.int32))
            # dispatch the per-search min BEFORE fetching the previous one
            # (a lazily built reduction would be enqueued after the NEXT
            # generation and its fetch would serialize the dispatch queue —
            # measured 60ms/gen, BASELINE.md round 3); recording stays one
            # generation behind, so it never stalls the device
            cur_min = jnp.min(loss, axis=1)                         # [M]
            if prev_min is not None:
                self.losses.append(np.asarray(prev_min))
            prev_min = cur_min
            # one-behind save: carry_in is gen gi-1's output (its min-loss
            # fetch above is what materialized it — still one dispatch
            # ahead, never blocking on gi)
            ckpt.save(gi, {"carry": carry_in, "keys": keys_in})
        carry_in, keys_in = carry, key_state
        carry, (variables, loss, inner_loss) = final_fn(
            self.model.params, defaults, carry, next_keys(),
            jnp.asarray(meta_steps - 1, jnp.int32))
        if prev_min is not None:
            self.losses.append(np.asarray(prev_min))
        self.losses.append(np.asarray(
            jnp.min(jnp.where(jnp.isfinite(loss), loss, jnp.inf), axis=1)))
        ckpt.finalize(meta_steps - 1, {"carry": carry_in, "keys": keys_in})

        states, vp_means, best_loss, best_t = carry
        loss_np = np.asarray(loss)                               # [M, pop]
        loss_f = np.where(np.isfinite(loss_np), loss_np, np.inf)
        best = loss_f.argmin(axis=1)
        candidate_out = np.asarray(
            variables["output"]["target"])[np.arange(m), best]
        return {
            "candidate": np.asarray(best_t).reshape(m, *gf_shape),
            "best_loss": np.asarray(best_loss),
            "loss": loss_np,
            "inner_loss": np.asarray(inner_loss),
            "candidate_out": candidate_out,
            "variables": variables,
            "cma_states": states,
            "vp_means": vp_means,
            # per-generation per-search min inverted-frame tell losses,
            # [meta_steps, M] on a fresh run (fewer rows after a resume —
            # only the generations THIS process ran are observable)
            "loss_curves": (np.stack(self.losses)
                            if self.losses else np.zeros((0, m))),
        }

    def optimize_fused(self, meta_steps, grad_steps, last_grad_steps=None,
                       popsize=None, active=False, checkpoint_path=None,
                       checkpoint_every=1):
        """Transform search with one XLA dispatch per generation (the
        treatment :class:`BasinCMAOptimizer.optimize_fused` gives the
        flagship, VERDICT.md round 1 item 6). Per-generation min tell
        losses land in ``self.losses`` (fetched one generation behind the
        dispatch queue, so recording never stalls the device), and
        ``checkpoint_path`` makes the search crash-safe/resumable — fused
        speed no longer trades away observability (VERDICT.md round 2,
        item 6). Returns ``(variables, results, loss)`` with the same
        structure as :meth:`optimize`."""
        self.setup_cma(self.var_manager, popsize=popsize, active=active)
        if last_grad_steps is None:
            last_grad_steps = grad_steps
        self.losses, self.outs, self.transform_outs = [], [], []
        gf_type, gf_name, gf_shape = self._gf_var
        defaults = self.var_manager.defaults()

        gen_fn = self._get_fused_generation(grad_steps, meta_steps,
                                            with_tell=True)
        final_fn = self._get_fused_generation(last_grad_steps, meta_steps,
                                              with_tell=False)

        # vp_means seeded with zeros; gen 0 replaces them with the
        # population mean before the first EMA step
        probe = self.var_manager.initialize(1, key=jax.random.PRNGKey(0))
        vp0 = {name: jnp.zeros(probe["input"][name].shape[1:])
               for name in self.variables_to_propagate}
        dim = int(np.prod(gf_shape))
        carry = (self.cma_state, vp0, jnp.asarray(jnp.inf, jnp.float32),
                 jnp.zeros((dim,), jnp.float32))

        from pix2latent_tpu.utils.checkpoint import FusedCheckpointer
        ckpt = FusedCheckpointer(checkpoint_path, "fused transform search",
                                 every=checkpoint_every)
        start = ckpt.resume({"carry": carry, "key": self._key})
        if ckpt.loaded is not None:
            carry, self._key = ckpt.loaded["carry"], ckpt.loaded["key"]

        prev_min = None
        for gi in range(start, meta_steps - 1):
            carry_in, key_in = carry, self._key
            carry, (variables, loss, inner_loss) = gen_fn(
                self.model.params, defaults, carry, self.next_key(),
                jnp.asarray(gi, jnp.int32))
            # dispatch the min BEFORE fetching the previous one: a lazily
            # built jnp.min(prev) would be enqueued after THIS generation
            # and its fetch would block on the in-flight dispatch —
            # measured 60ms/gen of axon round-trip serialization
            # (bench_transform round 3: batched-M1 19.7s vs solo 22.7s)
            cur_min = jnp.min(loss)
            if prev_min is not None:
                # gi-1's min op was enqueued before this generation ->
                # the fetch blocks only on gi-1; recording stays one
                # generation behind the dispatch queue
                self.losses.append(float(prev_min))
            prev_min = cur_min
            # carry_in (generation gi's input) is materialized: the
            # loaded/initial host state at gi == start, else gen gi-1's
            # output whose min-loss was just fetched
            ckpt.save(gi, {"carry": carry_in, "key": key_in})
        carry_in, key_in = carry, self._key
        carry, (variables, loss, inner_loss) = final_fn(
            self.model.params, defaults, carry, self.next_key(),
            jnp.asarray(meta_steps - 1, jnp.int32))
        if prev_min is not None:
            self.losses.append(float(prev_min))
        self.losses.append(float(jnp.min(loss)))
        # terminal write of the final generation's INPUT carry: a re-run of
        # a completed search skips the tell loop and replays only the final
        # (tell-less) generation from the state it actually saw
        ckpt.finalize(meta_steps - 1, {"carry": carry_in, "key": key_in})

        self.cma_state, self.vp_means, best_loss, best_t = carry
        self._best_loss = float(best_loss)
        self._candidate = np.asarray(best_t).reshape(gf_shape)
        # report the final Adam step's warped-target loss, the quantity
        # optimize() leaves in self.loss (base.py:_run_inner) — the
        # inverted-frame tell loss stays internal to selection below
        self.loss = np.asarray(inner_loss)

        best = int(jnp.argmin(jnp.where(jnp.isfinite(loss), loss, jnp.inf)))
        candidate_out = variables["output"]["target"][best]
        transform_target = to_grid(np.asarray(variables["output"]["target"]))
        # re-render the final population so the results bundle carries the
        # real inverted frames (the unfused driver's transform_out), not a
        # placeholder (VERDICT.md round 2, item 6 / weak #4)
        self.out = self.model.apply(self.model.params,
                                    **variables.get("input", {}))
        transform_out = to_grid(np.asarray(self.out))
        results = ([transform_out], [transform_target], candidate_out)
        return variables, results, self.loss

    # -- driver (reference transform_optimizer.py:165-255) ----------------- #

    def optimize(self, meta_steps, grad_steps, last_grad_steps=None,
                 pbar=None, popsize=None, checkpoint_path=None,
                 checkpoint_every=1, active=False):
        """meta_steps CMA generations over the transform parameter; each
        generation re-optimizes the latent with ``grad_steps`` Adam updates
        (``last_grad_steps`` on the final generation, default=grad_steps).

        ``checkpoint_path`` makes the search crash-safe/resumable: the CMA
        carry plus the propagation EMA and best-candidate tracking are
        written there every ``checkpoint_every`` generations (SURVEY.md
        §5.3; uniform with the other meta-loop drivers).

        Returns ``(variables, results, loss)`` where results bundles the
        final collage, the warped targets, and the best candidate's target —
        same shape of outputs as the reference.
        """
        self.setup_cma(self.var_manager, popsize=popsize, active=active)
        self.losses, self.outs, self.transform_outs = [], [], []
        self._best_loss, self._candidate = np.inf, None
        self.vp_means, self._vp_seeded = {}, set()
        self.transform_tracked = []

        if last_grad_steps is None:
            last_grad_steps = grad_steps
        total_steps = (meta_steps - 1) * grad_steps + last_grad_steps
        timer = Timer()

        gf_type, gf_name, gf_shape = self._gf_var
        variables = None
        loss = None

        from pix2latent_tpu.utils.checkpoint import LoopCheckpointer
        if checkpoint_path:
            # pre-seed extra carry state with structure-stable placeholders
            # so the checkpoint pytree matches across save/resume
            probe = self.var_manager.initialize(1, key=jax.random.PRNGKey(0))
            self.vp_means = {
                nm: jnp.zeros(probe["input"][nm].shape[1:],
                              probe["input"][nm].dtype)
                for nm in self.variables_to_propagate}
            self._candidate = np.zeros(gf_shape, np.float32)
        ckpt = LoopCheckpointer(
            checkpoint_path, self, "cma_state", every=checkpoint_every,
            extra_attrs=("vp_means", "_best_loss", "_candidate"))
        start_iter = ckpt.resume()
        if start_iter > 0:
            # generation 0 already ran -> every propagated statistic is real
            self._vp_seeded = set(self.variables_to_propagate)
        step_count = start_iter * grad_steps

        for meta_iter in range(start_iter, meta_steps):
            is_last = meta_iter + 1 == meta_steps
            n_inner = last_grad_steps if is_last else grad_steps

            variables = self.cma_init(self.var_manager)

            if meta_iter > 0:
                variables = self.propagate_variable(
                    variables, meta_iter, meta_steps)

            self.transform_tracked.append(
                np.asarray(variables[gf_type][gf_name]))

            # warp target/weight by this generation's t (transform=(j==0))
            variables = self.core.apply_transforms(variables)
            if self.log:
                self.vis_transform(variables)
            opt_state = self.core.init_opt_state(variables)

            variables, opt_state, out, _ = self._run_inner(
                variables, opt_state, n_inner, start_step=step_count,
                pbar=pbar, total_steps=total_steps, timer=timer)
            step_count += n_inner

            # Fresh inverted-frame loss each generation. The reference only
            # refreshed it on non-final generations (reusing the previous
            # generation's loss for the final candidate check,
            # transform_optimizer.py:233-239) — we evaluate the final
            # generation too, which is the documented intent.
            loss = self.core.tell_loss(variables, self.next_key(),
                                       step_count, inverted=True)
            if not is_last:
                self.cma_update(variables, loss=loss)

            self.update_propagation_variable_statistic(variables, loss)

            loss_f = jnp.where(jnp.isfinite(loss), loss, jnp.inf)
            lmin = float(jnp.min(loss_f))
            if lmin < float(self._best_loss):
                best = int(jnp.argmin(loss_f))
                self._candidate = np.asarray(
                    variables[gf_type][gf_name][best])
                self._best_loss = lmin

            if not is_last:
                ckpt.save(meta_iter + 1)

        best = int(jnp.argmin(jnp.where(jnp.isfinite(loss), loss, jnp.inf)))
        candidate_out = variables["output"]["target"][best]
        self._finalize_tracked()

        if self.log:
            return variables, (self.outs, self.transform_outs,
                               candidate_out), self.losses

        transform_target = to_grid(np.asarray(variables["output"]["target"]))
        transform_out = to_grid(np.asarray(self.out))
        results = ([transform_out], [transform_target], candidate_out)
        return variables, results, self.loss
