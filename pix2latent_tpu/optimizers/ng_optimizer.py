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
        self.setup_ng(self.var_manager, num_samples, budget=meta_steps)
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
