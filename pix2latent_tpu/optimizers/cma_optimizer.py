"""CMA-ES inversion with optional Adam finetuning.

Counterpart of the reference's ``CMAOptimizer``
(``pix2latent/optimizer/cma_optimizer.py:12-93``): ``meta_steps`` pure
ask→eval→tell generations (no gradients), then one final ask whose samples
are finetuned with ``grad_steps`` Adam updates.
"""

from __future__ import annotations

from pix2latent_tpu.optimizers.base import _BaseOptimizer
from pix2latent_tpu.optimizers.cma_base import _BaseCMAOptimizer
from pix2latent_tpu.utils.misc import Timer, progress_print


class CMAOptimizer(_BaseOptimizer, _BaseCMAOptimizer):

    def __init__(self, *args, **kwargs):
        _BaseOptimizer.__init__(self, *args, **kwargs)
        _BaseCMAOptimizer.__init__(self)

    def optimize_fused(self, meta_steps, grad_steps=0, popsize=None,
                       active=False, progress_every=25,
                       checkpoint_path=None, checkpoint_every=1):
        """Eval-only CMA generations with ONE XLA dispatch per generation
        (ask + population eval + inverted-frame tell + CMA update fused),
        then ``grad_steps`` Adam finetune on a final ask — the treatment
        the meta-loop drivers already have, promoted here after an on-chip
        measurement: the host loop's ~10 dispatches of eval-scale work per
        generation are tunnel-latency bound, 84.9 vs 19.3 ms/generation =
        **4.4x** (``scripts/bench_evalonly.py``; 13s over the reference's
        200-generation budget, ``/root/reference/examples/invert_biggan_cma
        .py:108``).

        Semantics note: the host loop — like the reference
        (``cma_optimizer.py:46-57`` steps, then
        ``base_cma_optimizer.py:113-114`` re-evaluates inside cma_update) —
        evaluates the population TWICE per generation with different hook
        noise (a logging eval + a fresh tell eval); the fused generation
        evaluates once and tells with that loss: same objective, same
        budget, one fewer redundant forward. Per-generation min tell
        losses land in ``self.losses`` (one-behind fetch);
        ``checkpoint_path`` adds crash-safe resume. Returns
        ``(variables, outs, losses)`` like :meth:`optimize`."""
        from pix2latent_tpu.utils.checkpoint import FusedCheckpointer
        from pix2latent_tpu.utils.misc import cprint

        self.setup_cma(self.var_manager, popsize=popsize, active=active)
        self.losses, self.outs = [], []
        gen_fn = self._get_fused_gen(0)
        defaults = self.var_manager.defaults()
        state = self.cma_state

        ckpt = FusedCheckpointer(checkpoint_path, "fused cma",
                                 every=checkpoint_every)
        start = ckpt.resume({"state": state, "key": self._key})
        if ckpt.loaded is not None:
            state, self._key = ckpt.loaded["state"], ckpt.loaded["key"]

        import jax.numpy as jnp
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
                    cprint(f"(cma fused) gen {gi}/{meta_steps} min tell "
                           f"loss {self.losses[-1]:.4f}", "c")
            prev_min = gen_min
            # carry_in (generation gi's input) is materialized: the
            # loaded/initial host state at gi == start, or gen gi-1's
            # output whose min-loss was just fetched
            ckpt.save(gi, {"state": carry_in, "key": key_in})
        if prev_min is not None:
            self.losses.append(float(prev_min))
        self.cma_state = state
        ckpt.finalize(meta_steps, {"state": state, "key": self._key})

        # -- Adam finetune of a final ask (reference cma_optimizer.py:59-65);
        # segmented + checkpointed like the BasinCMA final
        import numpy as np
        variables = self.cma_init(self.var_manager)
        variables = self.core.apply_transforms(variables)
        if grad_steps > 0:
            opt_state = self.core.init_opt_state(variables)
            variables, opt_state, out, ys = self.core.grad_steps(
                variables, opt_state, self.next_key(), grad_steps,
                start_step=meta_steps, track=False,
                checkpoint_path=(checkpoint_path + ".final"
                                 if checkpoint_path else None),
                checkpoint_every=checkpoint_every)
            self.out, self.loss = out, np.asarray(ys["loss"][-1])
        else:
            out, loss = self.core.eval(variables, self.next_key(),
                                       meta_steps)
            self.out, self.loss = out, np.asarray(loss)
        return self._final_results(variables, meta_steps + grad_steps)

    def optimize(self, meta_steps, grad_steps=0, pbar=None, num_samples=None,
                 popsize=None, checkpoint_path=None, checkpoint_every=1,
                 active=False):
        """Reference semantics (``cma_optimizer.py:24-93``): ``meta_steps``
        gradient-free CMA generations, then ``grad_steps`` Adam finetune on a
        final ask. ``num_samples`` must be None (fixed by CMA popsize);
        ``popsize`` overrides the default ``4+floor(3 ln n)``;
        ``checkpoint_path`` makes the generation loop crash-safe/resumable."""
        assert num_samples is None, "CMA optimizer has fixed sample size"

        self.setup_cma(self.var_manager, popsize=popsize, active=active)
        self.losses, self.outs = [], []
        total_steps = meta_steps + grad_steps
        timer = Timer()

        from pix2latent_tpu.utils.checkpoint import LoopCheckpointer
        ckpt = LoopCheckpointer(checkpoint_path, self, "cma_state",
                                every=checkpoint_every)

        # -- gradient-free CMA generations -- #
        for i in range(ckpt.resume(), meta_steps):
            variables = self.cma_init(self.var_manager)
            out, loss = self.core.eval(variables, self.next_key(), i)
            self.out, self.loss = out, loss
            if self.log and ((i + 1) % self.log_iter == 0):
                self.loss = loss
                self.log_result(variables, i + 1)
            # tell with a fresh (inverted-frame) loss, as the reference does
            self.cma_update(variables, inverted_loss=True, step=i)
            ckpt.save(i + 1)
            if pbar is not None:
                pbar.progress((i + 1) / total_steps)
            elif (i + 1) % self.show_iter == 0:
                progress_print("optimize", i + 1, total_steps, "c",
                               timer.avg(self.show_iter))
                timer.reset()

        # -- Adam finetune of a final ask -- #
        variables = self.cma_init(self.var_manager)
        variables = self.core.apply_transforms(variables)
        opt_state = self.core.init_opt_state(variables)
        variables, opt_state, out, _ = self._run_inner(
            variables, opt_state, grad_steps, start_step=meta_steps,
            pbar=pbar, total_steps=total_steps, timer=timer,
            checkpoint_path=(checkpoint_path + ".final"
                             if checkpoint_path else None),
            checkpoint_every=checkpoint_every)

        return self._final_results(variables, total_steps)
