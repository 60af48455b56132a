"""Pure gradient (Adam) inversion.

Counterpart of the reference's ``GradientOptimizer``
(``pix2latent/optimizer/gradient_optimizer.py:11-56``): per-variable Adam
descent on the registered inputs. Unlike the reference's per-step Python loop
with a host sync each iteration, the entire ``grad_steps`` run is fused
``lax.scan`` (chunked only when per-iteration logging is requested).
"""

from __future__ import annotations

from pix2latent_tpu.optimizers.base import _BaseOptimizer
from pix2latent_tpu.utils.misc import Timer


class GradientOptimizer(_BaseOptimizer):

    def optimize(self, num_samples, grad_steps, pbar=None,
                 checkpoint_path=None, checkpoint_every=1):
        """Args match the reference (``gradient_optimizer.py:22-35``):
        optimize ``num_samples`` seeds for ``grad_steps`` Adam updates.
        Long budgets (e.g. the reference's w+ Adam-500 recipe,
        ``examples/invert_stylegan2_cars_adam.py``) run as bounded
        trajectory-equal scan segments inside the core — safe on the axon
        TPU, where a single 500-step w+ scan faults the worker (CLAUDE.md).
        ``checkpoint_path`` makes the run crash-safe/resumable at segment
        granularity. Returns ``(variables, outs, losses)``.
        """
        self.losses, self.outs = [], []

        variables = self.var_manager.initialize(num_samples=num_samples,
                                                key=self.next_key())
        variables = self.core.place(variables)
        # reference applies registered transforms on the first step only
        # (transform=(i==0), gradient_optimizer.py:37)
        variables = self.core.apply_transforms(variables)
        opt_state = self.core.init_opt_state(variables)

        timer = Timer()
        variables, opt_state, out, _ = self._run_inner(
            variables, opt_state, grad_steps, start_step=0, pbar=pbar,
            total_steps=grad_steps, timer=timer,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every)

        return self._final_results(variables, grad_steps)
