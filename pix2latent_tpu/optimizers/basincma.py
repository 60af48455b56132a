"""BasinCMA — the flagship hybrid method.

Counterpart of the reference's ``BasinCMAOptimizer``
(``pix2latent/optimizer/basincma_optimizer.py:12-83``): for each of
``meta_steps + 1`` outer iterations, ask CMA for a population, refine it with
``grad_steps`` inner Adam updates, and tell CMA the loss of the *refined*
samples (keyed to the originally-asked candidates); the final iteration runs
``last_grad_steps`` and skips the tell.

TPU execution shape: each generation is {one jitted ask} + {one jitted
scan of grad_steps fused forward/backward/Adam steps over the whole
population} + {one jitted tell} — versus the reference's
30 × (chunked forwards + per-step host sync) + host PyCMA update.
"""

from __future__ import annotations

from pix2latent_tpu.optimizers.base import _BaseOptimizer
from pix2latent_tpu.optimizers.cma_base import _BaseCMAOptimizer
from pix2latent_tpu.utils.misc import Timer


class BasinCMAOptimizer(_BaseOptimizer, _BaseCMAOptimizer):

    def __init__(self, *args, **kwargs):
        _BaseOptimizer.__init__(self, *args, **kwargs)
        _BaseCMAOptimizer.__init__(self)

    def optimize(self, meta_steps, grad_steps, last_grad_steps=300,
                 pbar=None, num_samples=None, popsize=None,
                 checkpoint_path=None, checkpoint_every=1):
        """Args match the reference (``basincma_optimizer.py:24-35``).

        meta_steps: number of CMA updates.
        grad_steps: Adam updates per CMA generation.
        last_grad_steps: extra Adam steps on the final generation.
        checkpoint_path: if set, the CMA carry (strategy state, RNG key,
            meta-iteration) is written there every ``checkpoint_every``
            generations and automatically resumed from — crash-safe long
            runs, which the reference lacked (SURVEY.md §5.3-4).
        """
        assert num_samples is None, "CMA optimizer has fixed sample size"

        self.setup_cma(self.var_manager, popsize=popsize)
        self.losses, self.outs = [], []
        total_steps = meta_steps * grad_steps + last_grad_steps
        timer = Timer()
        step_count = 0
        start_iter = 0

        if checkpoint_path:
            from pix2latent_tpu.utils.checkpoint import (checkpoint_exists,
                                                         load_checkpoint,
                                                         save_checkpoint)
            import jax.numpy as jnp
            carry_like = {"cma_state": self.cma_state, "key": self._key,
                          "meta_iter": jnp.zeros((), jnp.int32)}
            if checkpoint_exists(checkpoint_path):
                carry = load_checkpoint(checkpoint_path, carry_like)
                self.cma_state = carry["cma_state"]
                self._key = carry["key"]
                start_iter = int(carry["meta_iter"])
                step_count = start_iter * grad_steps
                from pix2latent_tpu.utils.misc import cprint
                cprint(f"(basin-cma) resumed at generation {start_iter}", "y")

        for meta_iter in range(start_iter, meta_steps + 1):
            is_last = meta_iter == meta_steps
            n_inner = last_grad_steps if is_last else grad_steps

            # ask: fresh population, grad-free var from CMA
            variables = self.cma_init(self.var_manager)
            # transforms applied at inner-step 0 (transform=(j==0))
            variables = self.core.apply_transforms(variables)
            # fresh Adam state per generation (the reference re-creates the
            # torch optimizer inside cma_init via initialize())
            opt_state = self.core.init_opt_state(variables)

            variables, opt_state, out, _ = self._run_inner(
                variables, opt_state, n_inner, start_step=step_count,
                pbar=pbar, total_steps=total_steps, timer=timer)
            step_count += n_inner

            if not is_last:
                self.cma_update(variables, inverted_loss=True,
                                step=step_count)
                if checkpoint_path and \
                        (meta_iter + 1) % checkpoint_every == 0:
                    import jax.numpy as jnp
                    save_checkpoint(checkpoint_path, {
                        "cma_state": self.cma_state, "key": self._key,
                        "meta_iter": jnp.asarray(meta_iter + 1, jnp.int32)})

        return self._final_results(variables, total_steps)
