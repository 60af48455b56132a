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
            pbar=pbar, total_steps=total_steps, timer=timer)

        return self._final_results(variables, total_steps)
