"""Batched multi-image BasinCMA — invert M images in one compiled program.

Capability upgrade over the reference (which inverts one image per process,
``examples/*.py``): M independent CMA-ES states are vmapped over an images
axis, their populations concatenated into one [M*pop] generator batch, and
the whole generation (M asks -> shared inner Adam scan -> M tells) runs as a
single XLA dispatch. Amortizes dispatch overhead and fills the chip when a
single population under-utilizes it; the per-image searches remain exactly
independent (block-diagonal: every sample's loss depends only on its own
image's target).

Memory scaling: activations and Adam state grow with M*pop, so large M
spills HBM (M=8 OOMs plain at BigGAN-256 pop 18). ``max_batch_size`` bounds
the in-flight sample count via the exact wrap-padded in-graph chunking the
execution core uses (``core/step.py:chunk_spec`` — the reference's
``max_minibatch`` semantics, ``pix2latent/variable_manager.py:16-46``, but
inside the compiled program); ``checkpoint_path`` makes the meta loop
crash-safe with the same one-behind protocol as the other fused drivers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pix2latent_tpu.core.step import chunk_spec, split_chunked
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
        max_batch_size: when set, the forward/backward runs as a sequential
            in-graph ``lax.map`` over wrap-padded chunks of this many
            samples (out of the M*pop concatenated batch) — bounding peak
            activation/Adam memory so M past the plain-OOM knee still fits
            (single-chip memory lever; pair it with ``mesh`` only when the
            per-device rows still exceed the chunk size).
    """

    def __init__(self, model, loss_fn, z_dim: int = 128,
                 learning_rate: float = 0.05,
                 learnable_inputs: Optional[Dict[str, float]] = None,
                 popsize: Optional[int] = None, sigma: float = 1.0,
                 hook_fn=None, seed: int = 0, mesh=None,
                 max_batch_size: Optional[int] = None):
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
        self.max_batch_size = max_batch_size
        # optional device mesh: the concatenated [M*pop] generator batch is
        # the data-parallel axis (same layout rule as ExecutionCore's fused
        # path — an in-graph with_sharding_constraint, since the batch is
        # created inside jit where device_put can't run)
        self.mesh = mesh
        # per-generation per-image min tell losses, filled by optimize()
        self.losses = []
        self._gen_fns = {}
        # frozen-transform inverted-tell fn (set by optimize(tell_inverted=))
        self._tell_fn = None
        # every tell fn ever used on this instance, in first-seen order: the
        # compiled programs bake self._tell_fn into the trace, so the cache
        # key must record WHICH transform was traced (ADVICE round 4) — the
        # index is the token, and holding the reference keeps id()-reuse out
        self._tell_fns_seen = []

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _tell_token(self):
        """Stable identity token for the current tell transform (None when
        no inverted tell is configured). Part of every compiled-program
        cache key: reusing one optimizer across optimize() calls with a
        DIFFERENT transform_fn must not silently reuse the old traced
        transform for tells and winner selection."""
        if self._tell_fn is None:
            return None
        for i, f in enumerate(self._tell_fns_seen):
            if f is self._tell_fn:
                return i
        self._tell_fns_seen.append(self._tell_fn)
        return len(self._tell_fns_seen) - 1

    def _make_adam(self):
        txs = {"z": optax.adam(self.lr)}
        for name, lr in self.learnable_inputs.items():
            txs[name] = optax.adam(lr)
        return optax.multi_transform(
            txs, lambda tree: {k: k for k in tree})

    def _repeat_per_image(self, tree, pop, m):
        """Repeat every per-image (leading-M) array leaf to per-sample rows:
        image i owns samples [i*pop, (i+1)*pop)."""
        return jax.tree.map(
            lambda a: (jnp.repeat(a, pop, axis=0)
                       if jnp.ndim(a) > 0 and a.shape[0] == m else a), tree)

    def _loss_fns(self, m):
        """``(forward_loss, value_and_grad_chunked, eval_chunked)`` for an
        M-image problem — shared by the fused generation and the segmented
        final refinement (:meth:`_build_final_segmented`)."""
        pop = self.popsize
        total = m * pop

        def forward_loss(params, learn, aux):
            out = self.model.apply(params, **learn, **aux["fixed"])
            if "ctx" in aux:
                loss_map = self.loss_fn.from_ctx(out, aux["ctx"])
            else:
                kwargs = {"target": aux["target"]}
                if "weight" in aux:
                    kwargs["weight"] = aux["weight"]
                loss_map = self.loss_fn(out, **kwargs)
            rows = out.shape[0]
            per_sample = loss_map.reshape(rows, -1).mean(axis=1)
            return per_sample.mean(), per_sample

        def eval_loss(params, learn, aux):
            """Per-sample loss for tells/winner selection. With a frozen
            per-image transform (``tell_inverted``), the generated image is
            un-warped back to the ORIGINAL frame and scored against the
            un-warped target with the binarized original weight — the
            reference's ``inverted_loss`` tell semantics
            (``pix2latent/optimizer/base_cma_optimizer.py:113-139``), same
            as the single-image fused path (``core/step.py`` tell_loss).
            The inner Adam objective stays the warped-frame loss above."""
            if "tell_t" not in aux:
                return forward_loss(params, learn, aux)[1]
            out = self.model.apply(params, **learn, **aux["fixed"])
            out_inv = self._tell_fn(out, aux["tell_t"], invert=True)
            if "tell_ctx" in aux:
                # original-target loss context precomputed ONCE per batch
                # (the M unique rows) — without it every tell re-runs the
                # LPIPS backbone on M*pop repeated original targets, the
                # exact cost data['ctx'] eliminates for the inner loop
                # (ADVICE round 4)
                loss_map = self.loss_fn.from_ctx(out_inv, aux["tell_ctx"])
            else:
                kwargs = {"target": aux["tell_target"]}
                if "tell_weight" in aux:
                    kwargs["weight"] = aux["tell_weight"]
                loss_map = self.loss_fn(out_inv, **kwargs)
            rows = out.shape[0]
            return loss_map.reshape(rows, -1).mean(axis=1)

        def value_and_grad_chunked(params, learn, aux):
            """per-sample losses [total] + grads like ``learn``; chunked
            over the concatenated batch when max_batch_size demands it."""
            n, chunk, pad = chunk_spec(total, self.max_batch_size)
            if n == 1:
                grad_fn = jax.value_and_grad(forward_loss, argnums=1,
                                             has_aux=True)
                (_, per_sample), grads = grad_fn(params, learn, aux)
                return per_sample, grads
            vc = split_chunked(learn, aux, total, n, chunk, pad)
            leaves, idx, mapped_v, _, _, mapped_c, rebuild = vc
            treedef = jax.tree_util.tree_structure(learn)
            # each chunk's loss is a mean over chunk rows, so every real
            # row's grad arrives as (1/chunk)*dL_row; rescale to match the
            # whole-batch mean's gradient exactly (padded duplicates only
            # affect their own sliced-away rows)
            scale = chunk / total

            def one(operand):
                vml, cml = operand

                def loss_of(vml):
                    learn_c, aux_c = rebuild(vml, cml)
                    return forward_loss(params, learn_c, aux_c)

                (_, ps), g = jax.value_and_grad(
                    loss_of, has_aux=True)(vml)
                return ps, jax.tree.map(lambda x: x * scale, g)

            ps, g_mapped = jax.lax.map(one, (mapped_v, mapped_c))
            unchunk = lambda a: a.reshape(
                a.shape[0] * a.shape[1], *a.shape[2:])[:total]
            grad_leaves = [jnp.zeros_like(a) for a in leaves]
            for j, i in enumerate(idx):
                grad_leaves[i] = unchunk(g_mapped[j])
            grads = jax.tree_util.tree_unflatten(treedef, grad_leaves)
            return unchunk(ps), grads

        def eval_chunked(params, learn, aux):
            n, chunk, pad = chunk_spec(total, self.max_batch_size)
            if n == 1:
                return eval_loss(params, learn, aux)
            vc = split_chunked(learn, aux, total, n, chunk, pad)
            _, _, mapped_v, _, _, mapped_c, rebuild = vc

            def one(operand):
                vml, cml = operand
                learn_c, aux_c = rebuild(vml, cml)
                return eval_loss(params, learn_c, aux_c)

            ps = jax.lax.map(one, (mapped_v, mapped_c))
            return ps.reshape(n * chunk)[:total]

        return forward_loss, value_and_grad_chunked, eval_chunked

    def _make_aux(self, data, m):
        """In-graph per-sample loss context from the per-image ``data``
        argument (shared by every compiled program of this problem)."""
        pop = self.popsize
        fixed_inputs = data.get("fixed", {})
        aux = {"fixed": {
            name: jax.lax.stop_gradient(jnp.repeat(v, pop, axis=0))
            for name, v in fixed_inputs.items()
            if name not in self.learnable_inputs}}
        if "ctx" in data:
            # per-image context (LPIPS target pyramid, precomputed ONCE
            # per batch on the M unique targets) repeated to per-sample
            # rows — compute-free vs re-running the backbone on M*pop
            aux["ctx"] = self._repeat_per_image(data["ctx"], pop, m)
        else:
            aux["target"] = jnp.repeat(data["targets"], pop, axis=0)
            if data.get("weights") is not None:
                aux["weight"] = jnp.repeat(data["weights"], pop, axis=0)
        if "tell_t" in data:
            # frozen per-image transform params + ORIGINAL-frame targets
            # for the inverted tell (image i owns rows [i*pop, (i+1)*pop))
            aux["tell_t"] = jnp.repeat(data["tell_t"], pop, axis=0)
            if "tell_ctx" in data:
                aux["tell_ctx"] = self._repeat_per_image(
                    data["tell_ctx"], pop, m)
            else:
                aux["tell_target"] = jnp.repeat(data["tell_target"], pop,
                                                axis=0)
                if data.get("tell_weight") is not None:
                    aux["tell_weight"] = jnp.repeat(data["tell_weight"], pop,
                                                    axis=0)
        aux = jax.lax.stop_gradient(aux)
        if self.mesh is not None:
            from pix2latent_tpu.parallel.mesh import constrain_variables
            aux = constrain_variables(aux, self.mesh)
        return aux

    def _build_generation(self, m, grad_steps):
        """One XLA program: M asks -> inner Adam scan over the concatenated
        [M*pop] batch -> post-loop re-eval -> per-image tells.

        Per-image data (targets/weights/fixed inputs and the precomputed
        loss context) arrives via the ``data`` ARGUMENT, so the compiled
        program is image-independent and caches across image batches (same
        rule as the single-image fused generation). When ``max_batch_size``
        is set, every forward/backward (and the post-loop re-eval) runs as
        a sequential ``lax.map`` over exact wrap-padded chunks — gradients
        rescaled by chunk/total so the result equals the whole-batch mean's
        gradient exactly (see ``core/step.py:_value_and_grad``).
        """
        pop = self.popsize
        total = m * pop
        params_cma = self.cma_params
        adam = self._make_adam()
        forward_loss, value_and_grad_chunked, eval_chunked = \
            self._loss_fns(m)

        def generation(params, data, states, key, gen_idx):
            fixed_inputs = data.get("fixed", {})
            aux = self._make_aux(data, m)

            k_ask, k_scan = jax.random.split(key)
            ask_keys = jax.random.split(k_ask, m)
            x = jax.vmap(lambda s, k: cma.ask(params_cma, s, k))(
                states, ask_keys)                        # [M, pop, d]
            z0 = x.reshape(total, self.z_dim)

            learn = {"z": z0}
            for name, default in fixed_inputs.items():
                if name in self.learnable_inputs:
                    learn[name] = jnp.repeat(default, pop, axis=0)
            if self.mesh is not None:
                from pix2latent_tpu.parallel.mesh import constrain_variables
                learn = constrain_variables(learn, self.mesh)

            opt_state = adam.init(learn)

            def body(carry, xs):
                learn, opt_state = carry
                i, k = xs
                if self.hook_fn is not None:
                    learn = {**learn, "z": self.hook_fn(k, learn["z"], i)}
                per_sample, grads = value_and_grad_chunked(
                    params, learn, aux)
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
            per_sample = eval_chunked(params, learn, aux)
            final_loss = per_sample.reshape(m, pop)
            states = jax.vmap(
                lambda s, xi, li: cma.tell(params_cma, s, xi, li))(
                    states, x, final_loss)
            # per-image generation minimum, reduced INSIDE the program so
            # the host can fetch it one-behind without enqueueing a late op
            # that would serialize the dispatch queue (BASELINE.md round 3)
            return states, learn, final_loss, final_loss.min(axis=1)

        return jax.jit(generation)

    def _get_generation(self, m, grad_steps, data):
        """Memoized generation program (a rebuilt closure would re-trace
        every optimize() call; the traced program also depends on which data
        fields exist and on the chunking config)."""
        key = (m, grad_steps, self.max_batch_size,
               "ctx" in data, data.get("weights") is not None,
               "tell_t" in data, data.get("tell_weight") is not None,
               self._tell_token(), tuple(sorted(data.get("fixed", {}))))
        if key not in self._gen_fns:
            self._gen_fns[key] = self._build_generation(m, grad_steps)
        return self._gen_fns[key]

    def _build_final_fns(self, m):
        """``(ask_init, segment, final_eval)`` jitted triple for the
        SEGMENTED final refinement.

        A single XLA program carrying the full ``last_grad_steps`` Adam scan
        over the concatenated batch reproducibly crashes the axon TPU worker
        ("kernel fault") once the scan is long — measured at 300 steps for
        M=7 plain AND M=12 chunked, the exact programs whose 30-step
        generation variants run fine; the same fault class as the 500-step
        w+ Adam scan (CLAUDE.md). The cure is the same: run the refinement
        as bounded per-dispatch segments whose Adam/learn carry stays on
        device. Per-step keys and step indices are precomputed with the
        SAME splits the one-scan program uses, so the segmented trajectory
        equals the single-scan trajectory step for step
        (``tests/test_optimizers.py::test_segmented_final_matches_one_scan``).
        """
        pop = self.popsize
        total = m * pop
        params_cma = self.cma_params
        adam = self._make_adam()
        _, value_and_grad_chunked, eval_chunked = self._loss_fns(m)

        def ask_init(params, data, states, k_ask):
            ask_keys = jax.random.split(k_ask, m)
            x = jax.vmap(lambda s, k: cma.ask(params_cma, s, k))(
                states, ask_keys)                        # [M, pop, d]
            learn = {"z": x.reshape(total, self.z_dim)}
            for name, default in data.get("fixed", {}).items():
                if name in self.learnable_inputs:
                    learn[name] = jnp.repeat(default, pop, axis=0)
            if self.mesh is not None:
                from pix2latent_tpu.parallel.mesh import constrain_variables
                learn = constrain_variables(learn, self.mesh)
            return learn, adam.init(learn)

        def segment(params, data, learn, opt_state, steps, keys):
            aux = self._make_aux(data, m)

            def body(carry, xs):
                learn, opt_state = carry
                i, k = xs
                if self.hook_fn is not None:
                    learn = {**learn, "z": self.hook_fn(k, learn["z"], i)}
                _, grads = value_and_grad_chunked(params, learn, aux)
                updates, opt_state = adam.update(grads, opt_state, learn)
                learn = optax.apply_updates(learn, updates)
                return (learn, opt_state), None

            (learn, opt_state), _ = jax.lax.scan(
                body, (learn, opt_state), (steps, keys))
            return learn, opt_state

        def final_eval(params, data, learn):
            aux = self._make_aux(data, m)
            return eval_chunked(params, learn, aux).reshape(m, pop)

        return jax.jit(ask_init), jax.jit(segment), jax.jit(final_eval)

    def _get_final_fns(self, m, data):
        key = ("final", m, self.max_batch_size,
               "ctx" in data, data.get("weights") is not None,
               "tell_t" in data, data.get("tell_weight") is not None,
               self._tell_token(), tuple(sorted(data.get("fixed", {}))))
        if key not in self._gen_fns:
            self._gen_fns[key] = self._build_final_fns(m)
        return self._gen_fns[key]

    def _run_final(self, m, data, states, meta_steps, last_grad_steps,
                   final_segment_steps):
        """Final long refinement: one more ask, ``last_grad_steps`` Adam
        steps, post-update re-eval; no tell. Segmented into bounded
        dispatches unless ``final_segment_steps`` is None/0 or already
        covers the budget (see :meth:`_build_final_fns`). Returns
        ``(learn, final_loss [M, pop])``; consumes exactly one key either
        way so the RNG stream is path-independent."""
        key = self._next_key()
        seg = final_segment_steps or last_grad_steps
        if seg >= last_grad_steps:
            final_fn = self._get_generation(m, last_grad_steps, data)
            _, learn, final_loss, _ = final_fn(
                self.model.params, data, states, key,
                jnp.asarray(meta_steps, jnp.int32))
            return learn, final_loss
        ask_fn, seg_fn, eval_fn = self._get_final_fns(m, data)
        # the one-scan program's exact splits: key -> (ask, scan), then the
        # scan key fans out to one key per step; step indices continue the
        # meta loop's numbering so hooks see the same iteration counter
        k_ask, k_scan = jax.random.split(key)
        keys = jax.random.split(k_scan, last_grad_steps)
        steps = jnp.asarray(
            meta_steps * last_grad_steps + np.arange(last_grad_steps),
            jnp.int32)
        learn, opt_state = ask_fn(self.model.params, data, states, k_ask)
        for s0 in range(0, last_grad_steps, seg):
            s1 = min(s0 + seg, last_grad_steps)
            learn, opt_state = seg_fn(self.model.params, data, learn,
                                      opt_state, steps[s0:s1], keys[s0:s1])
        return learn, eval_fn(self.model.params, data, learn)

    def optimize(self, targets, weights=None, fixed_inputs=None,
                 meta_steps=30, grad_steps=30, last_grad_steps=300,
                 final_segment_steps=50,
                 checkpoint_path=None, checkpoint_every=1,
                 progress_every=0, tell_inverted=None):
        """Invert ``targets [M, H, W, 3]`` simultaneously.

        ``fixed_inputs``: {name: [M, ...]} per-image model inputs (e.g.
        class embeddings); those listed in ``learnable_inputs`` are also
        Adam-refined. ``checkpoint_path`` makes the generation loop
        crash-safe/resumable (one-behind saves that never stall the
        dispatch queue — same protocol as the other fused drivers).
        ``final_segment_steps`` bounds the final refinement's per-dispatch
        scan length (long single scans fault the axon TPU worker —
        :meth:`_build_final_fns`; pass None to force one program).
        ``tell_inverted``: frozen-transform phase-2 semantics (the two-phase
        workflow with ``targets`` = the pre-warped per-image targets): a
        dict ``{"transform_fn": t_fn, "t": [M, t_dim], "targets":
        [M, H, W, 3] original frames, "weights": optional originals}`` —
        tells, loss curves, and winner selection then score the generated
        image un-warped back to the original frame against the original
        target with the binarized original weight, exactly the reference's
        ``inverted_loss`` (``base_cma_optimizer.py:113-139``); the inner
        Adam objective stays the warped-frame loss.
        Returns a dict with per-image best latents, losses, outputs, and
        ``loss_curves [meta_steps, M]`` (per-generation per-image min tell
        losses, fetched one generation behind the dispatch queue).
        """
        targets = jnp.asarray(targets)
        m = targets.shape[0]
        fixed_inputs = {k: jnp.asarray(v)
                        for k, v in (fixed_inputs or {}).items()}
        cprint(f"(batched basin-cma) {m} images x pop {self.popsize} = "
               f"{m * self.popsize} samples/generation"
               + (f", max_batch_size {self.max_batch_size}"
                  if self.max_batch_size else ""), "y")

        _, state0 = cma.init(np.zeros(self.z_dim), self.sigma, self.popsize)
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (m, *a.shape)), state0)

        data = {"targets": targets, "fixed": fixed_inputs}
        if weights is not None:
            data["weights"] = jnp.asarray(weights)
        if tell_inverted is not None:
            from pix2latent_tpu.utils.image import binarize
            self._tell_fn = tell_inverted["transform_fn"]
            data["tell_t"] = jnp.asarray(tell_inverted["t"])
            data["tell_target"] = jnp.asarray(tell_inverted["targets"])
            tw = tell_inverted.get("weights")
            if tw is not None:
                data["tell_weight"] = binarize(jnp.asarray(tw))
        if hasattr(self.loss_fn, "precompute"):
            # target-side loss context (LPIPS pyramid) ONCE per batch, on
            # the M unique rows; generations repeat it per-sample in-graph
            pre = jax.jit(lambda t, w: self.loss_fn.precompute(t, w))
            data["ctx"] = pre(targets, data.get("weights"))
            if "tell_t" in data:
                # second context on the M unique ORIGINAL targets, so the
                # inverted tell never re-extracts the target pyramid
                data["tell_ctx"] = pre(data.pop("tell_target"),
                                       data.pop("tell_weight", None))

        gen_fn = self._get_generation(m, grad_steps, data)

        from pix2latent_tpu.utils.checkpoint import FusedCheckpointer
        ckpt = FusedCheckpointer(checkpoint_path, "batched basin-cma",
                                 every=checkpoint_every)
        start = ckpt.resume({"states": states, "key": self._key})
        if ckpt.loaded is not None:
            states, self._key = ckpt.loaded["states"], ckpt.loaded["key"]

        self.losses = []
        prev_min = None
        for gi in range(start, meta_steps):
            carry_in, key_in = states, self._key
            states, _, _, gen_min = gen_fn(
                self.model.params, data, states, self._next_key(),
                jnp.asarray(gi, jnp.int32))
            if prev_min is not None:
                # prev generation's mins: already computed -> free fetch,
                # one generation behind the dispatch queue
                self.losses.append(np.asarray(prev_min))
                if progress_every and gi % progress_every == 0:
                    cprint(f"(batched basin-cma) gen {gi}/{meta_steps} "
                           f"min tell losses "
                           f"{np.round(self.losses[-1], 4)}", "c")
            prev_min = gen_min
            # carry_in (generation gi's input) is materialized: the
            # loaded/initial host state at gi == start, or gen gi-1's
            # output whose min-losses were just fetched
            ckpt.save(gi, {"states": carry_in, "key": key_in})
        if prev_min is not None:
            self.losses.append(np.asarray(prev_min))
        ckpt.finalize(meta_steps, {"states": states, "key": self._key})

        # final long generation: ask once more, refine longer, skip the tell
        learn, final_loss = self._run_final(
            m, data, states, meta_steps, last_grad_steps,
            final_segment_steps)

        loss = np.asarray(final_loss)                    # [M, pop]
        loss = np.where(np.isfinite(loss), loss, np.inf)  # nan-samples lose
        best = loss.argmin(axis=1)                       # per-image winner
        z_all = np.asarray(learn["z"]).reshape(m, self.popsize, self.z_dim)
        result = {
            "z": jnp.asarray(z_all[np.arange(m), best]),    # [M, d]
            "loss": jnp.asarray(loss[np.arange(m), best]),  # [M]
            "all_losses": loss,
            "cma_states": states,
            "loss_curves": (np.stack(self.losses)
                            if self.losses else np.zeros((0, m))),
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
