"""Shared optimizer plumbing.

Counterpart of the reference's ``_BaseOptimizer``
(``pix2latent/optimizer/base_optimizer.py:9-141``): model/vars/loss wiring,
transform registration, variable tracking, and logging of loss curves +
collage frames. The compute path is delegated to
:class:`pix2latent_tpu.core.ExecutionCore`; this layer only orchestrates and
moves results to the host *between* fused runs, never inside them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.core.step import ExecutionCore
from pix2latent_tpu.utils.image import to_grid, to_image
from pix2latent_tpu.utils.misc import Timer, progress_print
from pix2latent_tpu.variables import VariableManager


class _BaseOptimizer:
    """Base template for the optimizer drivers.

    Args:
        model: inversion target following the model protocol
            (``models.base``) or a bare callable.
        var_manager: the VariableManager with registered variables.
        loss_fn: ``loss_fn(out, **output_vars) -> per-sample/elementwise loss``.
        max_batch_size: population microbatch size (the reference's
            ``base_optimizer.py:12,24``). None (default) runs the population
            whole — right for most workloads; set it for memory-bound cases
            (e.g. FFHQ-1024 x pop 22 on one chip) where the compiled step
            then lax.maps over chunks sequentially.
        log: collect per-``log_iter`` loss curves and collage frames.
        track_variables: snapshot input variables every step (returned as
            ``self.tracked``; kept on device until the run ends).
        mesh: optional ``jax.sharding.Mesh`` to shard the population over.
        seed: RNG seed for this optimizer's key stream.
        segment_steps: gradient runs longer than this execute as bounded
            per-dispatch scan segments, trajectory-equal to one scan (the
            axon long-scan fault guard, ``core/step.py:grad_steps``).
            Default 50 — the measured-safe repo constant; None disables.
    """

    def __init__(self, model, var_manager: VariableManager, loss_fn,
                 max_batch_size: Optional[int] = None, log: bool = False,
                 track_variables: bool = True, mesh=None, seed: int = 0,
                 segment_steps: Optional[int] = 50, **kwargs):
        self.max_batch_size = max_batch_size
        self.var_manager = var_manager
        self.loss_fn = loss_fn
        self.core = ExecutionCore(model, var_manager, loss_fn, mesh=mesh,
                                  track_variables=track_variables,
                                  max_batch_size=max_batch_size,
                                  segment_steps=segment_steps)
        self.model = self.core.model
        self.mesh = mesh

        self.log = log
        self.log_iter = 5
        self.show_iter = 50
        self.log_resize_factor = None
        self.track_variables = track_variables
        self.tracked = {}

        self.losses = []
        self.outs = []
        self._key = jax.random.PRNGKey(seed)

    # -- key stream ----------------------------------------------------- #

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- registration (reference base_optimizer.py:39-59) ---------------- #

    def register_benchmark(self, benchmark):
        self.bm = benchmark

    def register_transform(self, transform_fn, transform_var_name,
                           target_var_name):
        self.core.register_transform(transform_fn, transform_var_name,
                                     target_var_name)

    # -- fused inner runs ------------------------------------------------ #

    def _run_inner(self, variables, opt_state, n_steps, start_step,
                   pbar=None, total_steps=None, timer=None,
                   checkpoint_path=None, checkpoint_every=1):
        """Run ``n_steps`` gradient steps, chunked only as needed for
        logging (long runs are additionally segmented inside
        ``core.grad_steps`` — trajectory-equal bounded dispatches).
        ``checkpoint_path`` makes the run crash-safe at segment granularity
        (ignored under per-iteration logging, whose chunks are already
        short). Returns (variables, opt_state, out, all_losses [n, pop]).
        """
        if n_steps == 0:
            out, loss = self.core.eval(variables, self.next_key(), start_step)
            self.out, self.loss = out, np.asarray(loss)
            return variables, opt_state, out, jnp.asarray(loss)[None]

        chunk = self.log_iter if self.log else n_steps
        losses = []
        out = None
        done = 0
        while done < n_steps:
            n = min(chunk, n_steps - done)
            variables, opt_state, out, ys = self.core.grad_steps(
                variables, opt_state, self.next_key(), n,
                start_step=start_step + done,
                checkpoint_path=None if self.log else checkpoint_path,
                checkpoint_every=checkpoint_every)
            losses.append(ys["loss"])
            if self.track_variables and "tracked" in ys:
                self._accumulate_tracked(ys["tracked"])
            done += n
            if self.log:
                self.out = out
                self.loss = np.asarray(ys["loss"][-1])
                self.log_result(variables, start_step + done)
            if pbar is not None and total_steps:
                pbar.progress((start_step + done) / total_steps)
            elif total_steps and timer is not None and \
                    (start_step + done) % self.show_iter == 0:
                progress_print("optimize", start_step + done, total_steps,
                               "c", timer.avg(self.show_iter))
                timer.reset()
        all_losses = jnp.concatenate(losses, axis=0)
        self.out = out
        self.loss = np.asarray(all_losses[-1])
        return variables, opt_state, out, all_losses

    def _accumulate_tracked(self, tracked):
        # tracked: {name: [steps, pop, ...]} device arrays
        for name, arr in tracked.items():
            self.tracked.setdefault(name, []).append(np.asarray(arr))

    # -- logging (reference base_optimizer.py:100-141) -------------------- #

    def step(self, variables, optimize=True, transform=False):
        """Single-step API kept for parity/debugging (the reference's
        ``.step``, ``base_optimizer.py:81-97``). Fused runs via ``_run_inner``
        are the fast path."""
        if transform:
            variables = self.core.apply_transforms(variables)
        if optimize:
            if not hasattr(self, "_dbg_opt_state"):
                self._dbg_opt_state = self.core.init_opt_state(variables)
            variables, self._dbg_opt_state, out, ys = self.core.grad_steps(
                variables, self._dbg_opt_state, self.next_key(), 1)
            loss = ys["loss"][-1]
        else:
            out, loss = self.core.eval(variables, self.next_key())
        self.out, self.loss = out, np.asarray(loss)
        return variables, out, np.asarray(loss)

    def benchmark(self, variables, out):
        res = self.bm.evaluate(
            out,
            variables["output"]["target"][:1],
            variables["output"]["weight"][:1])
        return res

    def log_result(self, variables, step_iter):
        if hasattr(self, "bm"):
            res = self.benchmark(variables, self.out)
        else:
            res = {"loss": np.asarray(self.loss)}
        self.losses.append([int(step_iter), res])

        out = np.asarray(self.out)
        if out.ndim != 4:  # non-image model output: nothing to collage
            self.outs.append(out)
            return
        collage = to_image(to_grid(out))
        if self.log_resize_factor is not None:
            from pix2latent_tpu.utils.image import smart_resize
            h, w = collage.shape[:2]
            collage = smart_resize(
                collage, (int(h * self.log_resize_factor),
                          int(w * self.log_resize_factor)))
        self.outs.append(collage)

    def _final_results(self, variables, total_steps):
        """Reference return convention: (variables, outs, losses)."""
        self._finalize_tracked()
        if self.log:
            return variables, self.outs, self.losses
        out = np.asarray(self.out)
        collage = to_grid(out) if out.ndim == 4 else out
        return variables, [collage], [[total_steps, {"loss": self.loss}]]

    def _finalize_tracked(self):
        if self.track_variables and self.tracked:
            self.tracked = {
                name: np.concatenate(chunks, axis=0)
                for name, chunks in self.tracked.items()
                if isinstance(chunks, list)}

    def optimize(self, *args, **kwargs):
        raise NotImplementedError
