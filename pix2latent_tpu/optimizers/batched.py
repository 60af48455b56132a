"""Batched multi-image BasinCMA — invert M images in one compiled program.

Capability upgrade over the reference (which inverts one image per process,
``examples/*.py``): M independent CMA-ES states are vmapped over an images
axis, their populations concatenated into one [M*pop] generator batch, and
the whole generation (M asks -> shared inner Adam scan -> M tells) runs as a
single XLA dispatch. Amortizes dispatch overhead and fills the chip when a
single population under-utilizes it; the per-image searches remain exactly
independent (block-diagonal: every sample's loss depends only on its own
image's target).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pix2latent_tpu.models.base import as_model
from pix2latent_tpu.strategies import cma
from pix2latent_tpu.utils.misc import cprint


class BatchedBasinCMAOptimizer:
    """BasinCMA over a batch of images.

    Args:
        model: generator following the model protocol; called as
            ``model.apply(params, z=..., **fixed_inputs)``.
        loss_fn: ``loss_fn(out, target=..., weight=...) -> per-element/EL``.
        z_dim: latent dimensionality searched by CMA.
        learning_rate: Adam lr for z during inner loops.
        learnable_inputs: {name: lr} for additional per-image inputs that the
            inner Adam also refines (e.g. BigGAN's class embedding c at
            lr 0.01); their per-image defaults are passed to ``optimize``.
        popsize: per-image CMA population (default ``4+floor(3 ln d)``).
        sigma: initial CMA step size.
        hook_fn: optional pure hook applied to z each step.
    """

    def __init__(self, model, loss_fn, z_dim: int = 128,
                 learning_rate: float = 0.05,
                 learnable_inputs: Optional[Dict[str, float]] = None,
                 popsize: Optional[int] = None, sigma: float = 1.0,
                 hook_fn=None, seed: int = 0, mesh=None):
        self.model = as_model(model)
        self.loss_fn = loss_fn
        self.z_dim = int(z_dim)
        self.lr = float(learning_rate)
        self.learnable_inputs = dict(learnable_inputs or {})
        self.popsize = popsize or cma.default_popsize(z_dim)
        self.sigma = float(sigma)
        self.hook_fn = hook_fn
        self._key = jax.random.PRNGKey(seed)
        self.cma_params = cma.make_params(z_dim, self.popsize)
        # optional device mesh: the concatenated [M*pop] generator batch is
        # the data-parallel axis (same layout rule as ExecutionCore's fused
        # path — an in-graph with_sharding_constraint, since the batch is
        # created inside jit where device_put can't run)
        self.mesh = mesh

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _make_adam(self):
        txs = {"z": optax.adam(self.lr)}
        for name, lr in self.learnable_inputs.items():
            txs[name] = optax.adam(lr)
        return optax.multi_transform(
            txs, lambda tree: {k: k for k in tree})

    def _build_generation(self, m, grad_steps):
        """One XLA program: M asks -> inner Adam scan over the concatenated
        [M*pop] batch -> post-loop re-eval -> per-image tells.

        Per-image data (targets/weights/fixed inputs) arrives via the
        ``data`` ARGUMENT, so the compiled program is image-independent and
        caches across image batches (same rule as the single-image fused
        generation). The loss's target-side context (LPIPS target features)
        is precomputed once per generation, outside the scan.
        """
        pop = self.popsize
        params_cma = self.cma_params
        adam = self._make_adam()

        def generation(params, data, states, key, gen_idx):
            targets = data["targets"]
            weights = data.get("weights")
            fixed_inputs = data.get("fixed", {})

            # per-sample targets: image i owns samples [i*pop, (i+1)*pop)
            t_rep = jnp.repeat(targets, pop, axis=0)
            w_rep = (jnp.repeat(weights, pop, axis=0)
                     if weights is not None else None)
            if hasattr(self.loss_fn, "precompute"):
                ctx = self.loss_fn.precompute(
                    jax.lax.stop_gradient(t_rep),
                    None if w_rep is None else jax.lax.stop_gradient(w_rep))
            else:
                ctx = None

            def forward_loss(params, learn, fixed_rep):
                out = self.model.apply(params, **learn, **fixed_rep)
                if ctx is not None:
                    loss_map = self.loss_fn.from_ctx(out, ctx)
                else:
                    kwargs = {"target": t_rep}
                    if w_rep is not None:
                        kwargs["weight"] = w_rep
                    loss_map = self.loss_fn(out, **kwargs)
                per_sample = loss_map.reshape(m * pop, -1).mean(axis=1)
                return per_sample.mean(), per_sample

            grad_fn = jax.value_and_grad(forward_loss, argnums=1,
                                         has_aux=True)

            k_ask, k_scan = jax.random.split(key)
            ask_keys = jax.random.split(k_ask, m)
            x = jax.vmap(lambda s, k: cma.ask(params_cma, s, k))(
                states, ask_keys)                        # [M, pop, d]
            z0 = x.reshape(m * pop, self.z_dim)

            learn = {"z": z0}
            for name, default in fixed_inputs.items():
                if name in self.learnable_inputs:
                    learn[name] = jnp.repeat(default, pop, axis=0)
            fixed_rep = {
                name: jax.lax.stop_gradient(jnp.repeat(v, pop, axis=0))
                for name, v in fixed_inputs.items()
                if name not in self.learnable_inputs}
            if self.mesh is not None:
                from pix2latent_tpu.parallel.mesh import constrain_variables
                learn = constrain_variables(learn, self.mesh)
                fixed_rep = constrain_variables(fixed_rep, self.mesh)

            opt_state = adam.init(learn)

            def body(carry, xs):
                learn, opt_state = carry
                i, k = xs
                if self.hook_fn is not None:
                    learn = {**learn, "z": self.hook_fn(k, learn["z"], i)}
                (_, per_sample), grads = grad_fn(params, learn, fixed_rep)
                updates, opt_state = adam.update(grads, opt_state, learn)
                learn = optax.apply_updates(learn, updates)
                return (learn, opt_state), per_sample

            steps = gen_idx * grad_steps + jnp.arange(grad_steps)
            keys = jax.random.split(k_scan, grad_steps)
            (learn, opt_state), losses = jax.lax.scan(
                body, (learn, opt_state), (steps, keys))

            # The scan's last ys is the loss BEFORE the final Adam update;
            # re-evaluate the post-update samples so the CMA tell and the
            # winner selection score the variables actually returned (the
            # single-image path's tell_loss has the same semantics).
            _, per_sample = forward_loss(params, learn, fixed_rep)
            final_loss = per_sample.reshape(m, pop)
            states = jax.vmap(
                lambda s, xi, li: cma.tell(params_cma, s, xi, li))(
                    states, x, final_loss)
            return states, learn, final_loss

        return jax.jit(generation)

    def optimize(self, targets, weights=None, fixed_inputs=None,
                 meta_steps=30, grad_steps=30, last_grad_steps=300):
        """Invert ``targets [M, H, W, 3]`` simultaneously.

        ``fixed_inputs``: {name: [M, ...]} per-image model inputs (e.g.
        class embeddings); those listed in ``learnable_inputs`` are also
        Adam-refined. Returns a dict with per-image best latents, losses and
        outputs.
        """
        targets = jnp.asarray(targets)
        m = targets.shape[0]
        fixed_inputs = {k: jnp.asarray(v)
                        for k, v in (fixed_inputs or {}).items()}
        cprint(f"(batched basin-cma) {m} images x pop {self.popsize} = "
               f"{m * self.popsize} samples/generation", "y")

        _, state0 = cma.init(np.zeros(self.z_dim), self.sigma, self.popsize)
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (m, *a.shape)), state0)

        data = {"targets": targets, "fixed": fixed_inputs}
        if weights is not None:
            data["weights"] = jnp.asarray(weights)

        gen_fn = self._build_generation(m, grad_steps)
        for gi in range(meta_steps):
            states, learn, final_loss = gen_fn(
                self.model.params, data, states, self._next_key(),
                jnp.asarray(gi, jnp.int32))

        # final long generation: ask once more, refine longer, skip the tell
        final_fn = self._build_generation(m, last_grad_steps)
        states_after, learn, final_loss = final_fn(
            self.model.params, data, states, self._next_key(),
            jnp.asarray(meta_steps, jnp.int32))

        loss = np.asarray(final_loss)                    # [M, pop]
        loss = np.where(np.isfinite(loss), loss, np.inf)  # nan-samples lose
        best = loss.argmin(axis=1)                       # per-image winner
        z_all = np.asarray(learn["z"]).reshape(m, self.popsize, self.z_dim)
        result = {
            "z": jnp.asarray(z_all[np.arange(m), best]),    # [M, d]
            "loss": jnp.asarray(loss[np.arange(m), best]),  # [M]
            "all_losses": loss,
            "cma_states": states,
        }
        for name in self.learnable_inputs:
            v = np.asarray(learn[name]).reshape(m, self.popsize,
                                                *learn[name].shape[1:])
            result[name] = jnp.asarray(v[np.arange(m), best])
        # re-render the winners
        inputs = {"z": result["z"]}
        for name, default in fixed_inputs.items():
            inputs[name] = (result[name] if name in self.learnable_inputs
                            else default)
        result["out"] = self.model.apply(self.model.params, **inputs)
        return result
