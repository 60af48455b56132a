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
        best = int(np.argmin(np.asarray(loss)))
        for var_name in self.variables_to_propagate:
            if var_name not in variables.get("input", {}):
                raise RuntimeError(
                    f"variable propagation is set for {var_name} but no such "
                    "variable was found")
            data = variables["input"][var_name]
            if var_name not in self.vp_means:
                self.vp_means[var_name] = jnp.mean(data, axis=0)
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
            if var_name not in self.vp_means:
                self.vp_means[var_name] = jnp.mean(data, axis=0)
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
        ``transform_optimizer.py:161-162``)."""
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

    # -- driver (reference transform_optimizer.py:165-255) ----------------- #

    def optimize(self, meta_steps, grad_steps, last_grad_steps=None,
                 pbar=None, popsize=None):
        """meta_steps CMA generations over the transform parameter; each
        generation re-optimizes the latent with ``grad_steps`` Adam updates
        (``last_grad_steps`` on the final generation, default=grad_steps).

        Returns ``(variables, results, loss)`` where results bundles the
        final collage, the warped targets, and the best candidate's target —
        same shape of outputs as the reference.
        """
        self.setup_cma(self.var_manager, popsize=popsize)
        self.losses, self.outs, self.transform_outs = [], [], []
        self._best_loss, self._candidate = np.inf, None
        self.vp_means = {}
        self.transform_tracked = []

        if last_grad_steps is None:
            last_grad_steps = grad_steps
        total_steps = (meta_steps - 1) * grad_steps + last_grad_steps
        timer = Timer()
        step_count = 0

        gf_type, gf_name, _ = self._gf_var
        variables = None
        loss = None

        for meta_iter in range(meta_steps):
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

            lmin = float(jnp.min(loss))
            if lmin < self._best_loss:
                best = int(jnp.argmin(loss))
                self._candidate = np.asarray(
                    variables[gf_type][gf_name][best])
                self._best_loss = lmin

        best = int(jnp.argmin(loss))
        candidate_out = variables["output"]["target"][best]
        self._finalize_tracked()

        if self.log:
            return variables, (self.outs, self.transform_outs,
                               candidate_out), self.losses

        transform_target = to_grid(np.asarray(variables["output"]["target"]))
        transform_out = to_grid(np.asarray(self.out))
        results = ([transform_out], [transform_target], candidate_out)
        return variables, results, self.loss
