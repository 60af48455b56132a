"""The execution core: fused forward/loss/grad steps.

TPU-native replacement for the reference's closure machinery
(``pix2latent/optimizer/closure.py:6-79``). Where the reference loops over
mini-batch chunks, calls the model, backprops, and syncs the loss to the host
*every step*, here an entire run of inner gradient steps is ONE jitted
``lax.scan``:

    hooks -> model forward -> loss -> grad -> per-variable Adam update

with the population dimension vmapped-by-construction (all variables carry a
leading ``pop`` axis) and optionally sharded across a device mesh. Per-step
losses come back as a single ``[n_steps, pop]`` array at the end — zero
host round-trips inside the loop (the reference paid one per step,
``closure.py:60``).

Variable-name contract (same as the reference): registered *input* variable
names are the model's forward kwargs; *output* variable names are the loss
kwargs (``examples/invert_biggan_adam.py:59-60``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pix2latent_tpu.models.base import as_model
from pix2latent_tpu.parallel.mesh import (population_sharding, replicate,
                                          shard_variables)
from pix2latent_tpu.utils.image import binarize
from pix2latent_tpu.variables import VariableManager, Variables


def chunk_spec(pop: int, max_batch_size) -> tuple:
    """(n_chunks, chunk_size, pad_rows) for a population of ``pop`` rows.

    Chunks are exactly ``max_batch_size`` rows; when the population does not
    divide evenly the LAST chunk is padded by wrapping the first ``pad_rows``
    population rows (their results and gradients are sliced away — exact,
    since per-sample losses are independent). Wrap-padding keeps peak memory
    at the requested chunk size for ANY population: a divisor rule silently
    degrades awkward sizes (pop 7 with mbs 4 would run 7 chunks of 1; pop 22
    with mbs 4 would run 11 of 2 — far more serialization than asked for).
    Shared by :class:`ExecutionCore` and the batched multi-image driver
    (``optimizers/batched.py``)."""
    if not max_batch_size or pop <= max_batch_size:
        return 1, pop, 0
    chunk = int(max_batch_size)
    n = -(-pop // chunk)
    return n, chunk, n * chunk - pop


def split_chunked(variables, ctx, pop, n, chunk, pad):
    """Chunking plumbing shared by the grad and eval paths: wrap-pad and
    reshape every population-leading leaf of ``variables`` AND of the
    auxiliary tree ``ctx`` (per-sample precomputed loss contexts, repeated
    targets, fixed inputs — leaving them whole under the chunked map would
    broadcast against the chunk and mix rows). Shared 1-row / non-pop leaves
    stay OUT of the map — they are closed over (a broadcast into the map
    stack tiles 42x on TPU for thin-channel images).
    Returns ``(leaves, idx, mapped_v, cleaves, cidx, mapped_c, rebuild)``
    where ``rebuild(vml, cml) -> (variables, ctx)`` for one chunk."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    idx = [i for i, a in enumerate(leaves) if a.shape[0] == pop]
    cleaves, ctreedef = jax.tree_util.tree_flatten(ctx)
    cidx = [i for i, a in enumerate(cleaves)
            if jnp.ndim(a) > 0 and a.shape[0] == pop]

    def to_chunks(a):
        if pad:
            a = jnp.concatenate([a, a[:pad]])     # wrap-pad last chunk
        return a.reshape(n, chunk, *a.shape[1:])

    mapped_v = tuple(to_chunks(leaves[i]) for i in idx)
    mapped_c = tuple(to_chunks(cleaves[i]) for i in cidx)

    def rebuild(vml, cml):
        full = list(leaves)
        for j, i in enumerate(idx):
            full[i] = vml[j]
        cfull = list(cleaves)
        for j, i in enumerate(cidx):
            cfull[i] = cml[j]
        return (jax.tree_util.tree_unflatten(treedef, full),
                jax.tree_util.tree_unflatten(ctreedef, cfull))

    return leaves, idx, mapped_v, cleaves, cidx, mapped_c, rebuild


class ExecutionCore:
    """Builds and caches the jitted step programs for one inversion problem."""

    def __init__(self, model, var_manager: VariableManager, loss_fn: Callable,
                 mesh=None, track_variables: bool = False,
                 max_batch_size: Optional[int] = None,
                 segment_steps: Optional[int] = 50):
        self.model = as_model(model)
        self.var_manager = var_manager
        self.loss_fn = loss_fn
        self.mesh = mesh
        self.track_variables = track_variables
        # population microbatching: when set, forward/backward runs as a
        # sequential lax.map over chunks of <= max_batch_size samples —
        # bounding peak activation memory exactly like the reference's
        # split_vars chunking (variable_manager.py:16-46), but inside the
        # compiled program. Needed for e.g. FFHQ-1024 x pop-22 on one chip
        # (the 1024^2 x 32ch tensors lane-pad 4x on TPU).
        self.max_batch_size = max_batch_size
        # long-scan segmentation: gradient runs longer than this many steps
        # execute as bounded per-dispatch scan segments whose Adam/variable
        # carry stays on device — trajectory-equal to one scan (the per-step
        # key/step arrays are the single program's exact splits), but immune
        # to the axon TPU worker fault that long scans over a big forward
        # reproducibly trigger (measured at 300-500 steps; CLAUDE.md). 50 is
        # the measured-safe repo constant (the batched driver's
        # final_segment_steps). None/0 disables segmentation.
        self.segment_steps = segment_steps
        self.optimizer = var_manager.make_optimizer()
        # transform registry: dst var name -> dict(fn, param name)
        self.transform_fns: Dict[str, dict] = {}
        self._compiled: Dict[Any, Callable] = {}

    # ------------------------------------------------------------------ #
    # transforms (reference base_optimizer.py:44-78)                     #
    # ------------------------------------------------------------------ #

    def register_transform(self, transform_fn, transform_var_name: str,
                           target_var_name: str):
        """Warp ``target_var`` by the ``transform_var`` parameter before the
        inner loop (reference ``_BaseOptimizer.register_transform``)."""
        self.transform_fns[target_var_name] = {
            "fn": transform_fn,
            "transform_param": transform_var_name,
            "target_var": target_var_name,
        }

    def apply_transforms(self, variables: Variables) -> Variables:
        """Pure version of ``_BaseOptimizer.apply_transform``: returns new
        variables with each registered dst var warped by its transform."""
        if not self.transform_fns:
            return variables
        info = self.var_manager.variable_info
        out = {vt: dict(d) for vt, d in variables.items()}
        for dst_name, td in self.transform_fns.items():
            src_type = info[td["transform_param"]]["var_type"]
            dst_type = info[dst_name]["var_type"]
            t = out[src_type][td["transform_param"]]
            out[dst_type][dst_name] = td["fn"](out[dst_type][dst_name], t)
        return out

    # ------------------------------------------------------------------ #
    # fused forward / loss                                               #
    # ------------------------------------------------------------------ #

    def _dedupe_outputs(self, variables: Variables) -> Variables:
        """Shrink constant output variables to one shared row.

        ``initialize`` broadcasts defaults to [pop, ...] (reference
        semantics), but when an output var has a default, no gradient, no
        hook and no registered transform, all rows are identical — and the
        per-sample copy is catastrophic on TPU for thin-channel images
        (a [22,1024,1024,3] f32 temp pads 42x to 11GB in HBM). The losses
        broadcast 1-row targets, so this is exact.
        """
        info = self.var_manager.variable_info
        outputs = variables.get("output")
        if not outputs:
            return variables
        out = {vt: dict(d) for vt, d in variables.items()}
        for name, data in outputs.items():
            spec = info[name]
            if (spec["default"] is not None and not spec["requires_grad"]
                    and spec["hook_fn"] is None
                    and name not in self.transform_fns
                    and data.shape[0] != 1):
                out["output"][name] = data[:1]
        return out

    def _freeze(self, variables: Variables) -> Variables:
        """stop_gradient on every requires_grad=False variable.

        Without this, ``value_and_grad`` over the whole Variables pytree
        backprops through the frozen branches too — most expensively the
        LPIPS backbone applied to the TARGET — and optax then multiplies the
        result by zero. Stopping the gradient lets XLA delete those backward
        paths entirely; forward values are bit-identical.
        """
        info = self.var_manager.variable_info
        return {
            vt: {
                name: (a if info.get(name, {}).get("requires_grad", True)
                       else jax.lax.stop_gradient(a))
                for name, a in d.items()
            }
            for vt, d in variables.items()}

    def _forward_loss(self, params, variables: Variables, ctx=None):
        variables = self._freeze(variables)
        inputs = variables.get("input", {})
        outputs = variables.get("output", {})
        out = self.model.apply(params, **inputs)
        if ctx is not None:
            loss_map = self.loss_fn.from_ctx(out, ctx)
        else:
            loss_map = self.loss_fn(out, **outputs)
        pop = out.shape[0]
        per_sample = loss_map.reshape(pop, -1).mean(axis=1)
        return per_sample.mean(), (per_sample, out)

    def _can_precompute(self) -> bool:
        """True when the loss supports target-side precomputation AND every
        output variable is loop-invariant inside a scan (frozen, no hook).
        Transforms don't disqualify: they are applied before the scan."""
        if not hasattr(self.loss_fn, "precompute"):
            return False
        outs = [s for s in self.var_manager.variable_info.values()
                if s["var_type"] == "output"]
        if not outs:
            return False
        return all(not s["requires_grad"] and s["hook_fn"] is None
                   for s in outs)

    def _make_ctx(self, variables: Variables):
        """Precompute the loss's target-side context (e.g. the LPIPS target
        feature pyramid) ONCE, for reuse across every step of a scan. Returns
        None when precomputation isn't applicable."""
        if not self._can_precompute():
            return None
        outputs = variables.get("output")
        if not outputs:
            return None
        return self.loss_fn.precompute(
            **jax.tree.map(jax.lax.stop_gradient, dict(outputs)))

    def _pop(self, variables) -> int:
        """Population size: the max leading dim (deduped outputs are 1-row)."""
        return max(a.shape[0] for a in jax.tree.leaves(variables))

    def _chunk_spec(self, variables):
        """(n_chunks, chunk_size, pad_rows) for the current population
        (see module-level :func:`chunk_spec` for the wrap-padding rule)."""
        return chunk_spec(self._pop(variables), self.max_batch_size)

    def _n_chunks(self, variables) -> int:
        """Number of sequential microbatches for the current population."""
        return self._chunk_spec(variables)[0]

    def _value_and_grad(self, params, variables, ctx=None):
        """(per_sample, out), grads — chunked over the population when
        max_batch_size demands it (lax.map runs chunks sequentially, so peak
        activation memory is one chunk's forward+backward). ``ctx`` is an
        optional precomputed loss context (see :meth:`_make_ctx`)."""
        grad_fn = jax.value_and_grad(self._forward_loss, argnums=1,
                                     has_aux=True)
        n, chunk, pad = self._chunk_spec(variables)
        if n == 1:
            (_, (per_sample, out)), grads = grad_fn(params, variables, ctx)
            return per_sample, out, grads

        pop = self._pop(variables)
        vc = self._split_chunked(variables, ctx, pop, n, chunk, pad)
        leaves, idx, mapped_v, cleaves, cidx, mapped_c, rebuild = vc
        treedef = jax.tree_util.tree_structure(variables)

        # each chunk's loss is a mean over chunk_size samples, so every real
        # row's grad arrives as (1/chunk)*dL_row (padded duplicates only
        # affect their own sliced-away rows); rescale so the result equals
        # the whole-population mean's gradient exactly
        scale = chunk / pop

        def one(operand):
            vml, cml = operand

            def loss_of(vml):
                vars_, ctx_ = rebuild(vml, cml)
                return self._forward_loss(params, vars_, ctx_)

            (_, (ps, o)), g = jax.value_and_grad(
                loss_of, has_aux=True)(vml)
            # flatten images: a stacked [n, chunk, H, W, 3] tiles its 3-wide
            # minor dim to 128 lanes on TPU (42x padding, 11GB at 1024^2)
            o_flat = o.reshape(o.shape[0], -1)
            return ps, o_flat, jax.tree.map(lambda x: x * scale, g)

        probe_v, probe_c = rebuild(tuple(m[0] for m in mapped_v),
                                   tuple(m[0] for m in mapped_c))
        out_shape = self._out_shape(params, probe_v)
        ps, out_flat, grads_mapped = jax.lax.map(one, (mapped_v, mapped_c))
        unchunk = lambda a: a.reshape(
            a.shape[0] * a.shape[1], *a.shape[2:])[:pop]
        out = unchunk(out_flat).reshape(pop, *out_shape[1:])
        # grads tree matching `variables`: zeros for shared (frozen) leaves
        grad_leaves = [jnp.zeros_like(a) for a in leaves]
        for j, i in enumerate(idx):
            grad_leaves[i] = unchunk(grads_mapped[j])
        grads = jax.tree_util.tree_unflatten(treedef, grad_leaves)
        return unchunk(ps), out, grads

    def _split_chunked(self, variables, ctx, pop, n, chunk, pad):
        """Delegates to the module-level :func:`split_chunked` (shared with
        the batched multi-image driver)."""
        return split_chunked(variables, ctx, pop, n, chunk, pad)

    def _eval_chunked(self, params, variables, ctx=None):
        """(per_sample, out) without gradients, chunked like above."""
        n, chunk, pad = self._chunk_spec(variables)
        if n == 1:
            _, (per_sample, out) = self._forward_loss(params, variables, ctx)
            return per_sample, out
        pop = self._pop(variables)
        vc = self._split_chunked(variables, ctx, pop, n, chunk, pad)
        _, _, mapped_v, _, _, mapped_c, rebuild = vc

        def one(operand):
            vml, cml = operand
            vars_, ctx_ = rebuild(vml, cml)
            _, (ps, o) = self._forward_loss(params, vars_, ctx_)
            return ps, o.reshape(o.shape[0], -1)   # flat: see _value_and_grad

        probe_v, _ = rebuild(tuple(m[0] for m in mapped_v),
                             tuple(m[0] for m in mapped_c))
        out_shape = self._out_shape(params, probe_v)
        ps, out_flat = jax.lax.map(one, (mapped_v, mapped_c))
        unchunk = lambda a: a.reshape(
            a.shape[0] * a.shape[1], *a.shape[2:])[:pop]
        out = unchunk(out_flat).reshape(pop, *out_shape[1:])
        return unchunk(ps), out

    def _get(self, kind, **static):
        key = (kind, tuple(sorted(static.items())))
        if key not in self._compiled:
            self._compiled[key] = self._build(kind, **static)
        return self._compiled[key]

    def _build(self, kind, **static):
        vm = self.var_manager

        if kind == "eval":
            def eval_fn(params, variables, key, step):
                variables = self._dedupe_outputs(variables)
                variables = vm.apply_hooks(key, variables, step)
                per_sample, out = self._eval_chunked(params, variables)
                return out, per_sample
            return jax.jit(eval_fn)

        if kind == "grad_scan":
            n_steps = static["n_steps"]
            track = static["track"]

            def scan_fn(params, variables, opt_state, key, start_step):
                variables = self._dedupe_outputs(variables)
                out_shape = self._out_shape(params, variables)
                # loop-invariant loss context (e.g. the LPIPS target feature
                # pyramid) computed ONCE here, outside the scan body — the
                # scan carries the raw target, so XLA cannot hoist the
                # backbone pass itself (VERDICT.md round 1, item 2)
                ctx = self._make_ctx(variables)

                def body(carry, xs):
                    variables, opt_state, _ = carry
                    i, k = xs
                    variables = vm.apply_hooks(k, variables, i)
                    per_sample, out, grads = self._value_and_grad(
                        params, variables, ctx)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, variables)
                    variables = optax.apply_updates(variables, updates)
                    ys = {"loss": per_sample}
                    if track:
                        ys["tracked"] = variables.get("input", {})
                    # carry images flat: [pop, H, W, 3] in a carry gets
                    # lane-padded 42x on TPU (3 -> 128); [pop, H*W*3] doesn't
                    return (variables, opt_state,
                            out.reshape(out.shape[0], -1)), ys

                out0 = jnp.zeros((out_shape[0],
                                  int(np.prod(out_shape[1:]))), jnp.float32)
                steps = start_step + jnp.arange(n_steps)
                keys = jax.random.split(key, n_steps)
                (variables, opt_state, out_flat), ys = jax.lax.scan(
                    body, (variables, opt_state, out0), (steps, keys))
                return variables, opt_state, out_flat.reshape(out_shape), ys
            # donate the population + Adam state: they are always replaced by
            # the returned values, and donation lets XLA reuse their HBM
            return jax.jit(scan_fn, donate_argnums=(1, 2))

        if kind == "grad_scan_xs":
            # One SEGMENT of a long gradient run: identical body to
            # "grad_scan" but the per-step (steps, keys) arrays arrive as
            # ARGUMENTS — the caller pre-splits the master key exactly as
            # the single-scan program would (jax.random.split is
            # deterministic, traced or not), so a chain of segments is
            # bit-equal to one scan while every dispatch stays bounded
            # (the axon long-scan fault, CLAUDE.md). Not donated: the
            # segment's input carry is what the one-behind checkpoint
            # protocol saves after dispatching the next segment.
            track = static["track"]

            def seg_fn(params, variables, opt_state, steps, keys):
                variables = self._dedupe_outputs(variables)
                out_shape = self._out_shape(params, variables)
                ctx = self._make_ctx(variables)

                def body(carry, xs):
                    variables, opt_state, _ = carry
                    i, k = xs
                    variables = vm.apply_hooks(k, variables, i)
                    per_sample, out, grads = self._value_and_grad(
                        params, variables, ctx)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, variables)
                    variables = optax.apply_updates(variables, updates)
                    ys = {"loss": per_sample}
                    if track:
                        ys["tracked"] = variables.get("input", {})
                    return (variables, opt_state,
                            out.reshape(out.shape[0], -1)), ys

                out0 = jnp.zeros((out_shape[0],
                                  int(np.prod(out_shape[1:]))), jnp.float32)
                (variables, opt_state, out_flat), ys = jax.lax.scan(
                    body, (variables, opt_state, out0), (steps, keys))
                return variables, opt_state, out_flat.reshape(out_shape), ys
            return jax.jit(seg_fn)

        if kind in ("tell_loss", "tell_loss_raw"):
            # CMA tell loss: a fresh forward of the post-inner-loop variables
            # (the reference re-evaluates inside cma_update when loss=None,
            # ``base_cma_optimizer.py:113-114``); with a registered transform,
            # the output is un-warped back to the ORIGINAL frame and scored
            # against the un-warped target (``base_cma_optimizer.py:118-139``,
            # inverted_loss=True).
            inverted = static["inverted"]

            def tell_fn(params, variables, key, step, defaults=None,
                        ctx=None):
                # ``defaults`` carries the per-problem output defaults
                # (original un-warped target/weight) as ARGUMENTS — reading
                # them from the spec inside the trace would embed the image
                # as a compile-time constant (one recompile per inversion).
                variables = self._dedupe_outputs(variables)
                variables = vm.apply_hooks(key, variables, step)
                use_inv = (inverted and self.transform_fns
                           and "transform" in variables)
                per_sample, out = self._eval_chunked(
                    params, variables, ctx=None if use_inv else ctx)
                if not use_inv:
                    return per_sample
                info = vm.variable_info
                defaults = defaults or {}
                target = jnp.asarray(
                    defaults.get("target", info["target"]["default"]))[None]
                td = self.transform_fns["target"]
                t = variables[info[td["transform_param"]]["var_type"]][
                    td["transform_param"]]
                out_inv = td["fn"](out, t, invert=True)
                kwargs = {}
                w = defaults.get(
                    "weight",
                    info["weight"]["default"] if "weight" in info else None)
                if w is not None:
                    kwargs["weight"] = binarize(jnp.asarray(w)[None])
                loss_map = self.loss_fn(out_inv, target=target, **kwargs)
                pop = out.shape[0]
                return loss_map.reshape(pop, -1).mean(axis=1)
            # _raw: the untransformed function, for tracing inside larger
            # fused programs (e.g. BasinCMA's one-dispatch generation)
            return tell_fn if kind == "tell_loss_raw" else jax.jit(tell_fn)

        raise ValueError(kind)

    def _out_shape(self, params, variables):
        """Static output shape via eval_shape (no FLOPs)."""
        shape = jax.eval_shape(
            lambda p, v: self._forward_loss(p, v)[1][1], params, variables)
        return shape.shape

    # ------------------------------------------------------------------ #
    # public steps                                                       #
    # ------------------------------------------------------------------ #

    def eval(self, variables, key, step=0):
        """Hooks + forward + per-sample loss; no updates. Returns (out, loss)."""
        return self._get("eval")(self.model.params, variables, key,
                                 jnp.asarray(step, jnp.int32))

    def grad_steps(self, variables, opt_state, key, n_steps,
                   start_step=0, track: Optional[bool] = None,
                   checkpoint_path=None, checkpoint_every: int = 1):
        """Run ``n_steps`` fused hook/forward/grad/Adam steps.

        Runs as ONE scan when ``n_steps <= self.segment_steps`` (or
        segmentation is disabled); longer budgets execute as bounded
        per-dispatch segments that reproduce the single scan's trajectory
        bit for bit (same key splits, same step indices — the library-level
        cure for the axon long-scan worker fault, VERDICT.md round 4
        weak #1). ``checkpoint_path`` makes the segmented run crash-safe:
        the segment carry (variables + Adam state + steps done) is saved
        one-behind every ``checkpoint_every`` segments and auto-resumed.

        Returns ``(variables, opt_state, out, ys)`` where ``ys['loss']`` is
        ``[n_steps, pop]`` (post-resume steps only when resuming) and
        ``ys['tracked']`` (when tracking) stacks the input variables per
        step.
        """
        track = self.track_variables if track is None else track
        n_steps = int(n_steps)
        seg = self.segment_steps
        if not checkpoint_path and (not seg or n_steps <= seg):
            fn = self._get("grad_scan", n_steps=n_steps, track=bool(track))
            return fn(self.model.params, variables, opt_state, key,
                      jnp.asarray(start_step, jnp.int32))
        return self._grad_steps_segmented(
            variables, opt_state, key, n_steps, int(start_step),
            bool(track), int(seg) if seg else n_steps, checkpoint_path,
            max(int(checkpoint_every), 1))

    def _grad_steps_segmented(self, variables, opt_state, key, n_steps,
                              start_step, track, seg, ckpt_path, ckpt_every):
        """Segmented executor for :meth:`grad_steps` (see its docstring).

        Trajectory equality: the single-scan program computes
        ``keys = jax.random.split(key, n_steps)`` and
        ``steps = start_step + arange(n_steps)`` inside the trace; both are
        deterministic, so pre-computing them here and feeding slices to the
        segment program reproduces the one-scan trajectory exactly
        (``tests/test_core.py::TestSegmentedGradSteps``). Checkpoints use
        the same one-behind protocol as the fused meta loops
        (``utils/checkpoint.py:FusedCheckpointer``): the carry ENTERING the
        just-dispatched segment is already materialized, so the host write
        never stalls the dispatch queue."""
        from pix2latent_tpu.utils.checkpoint import (checkpoint_exists,
                                                     load_checkpoint,
                                                     save_checkpoint)
        keys = jax.random.split(key, n_steps)
        done = 0
        if ckpt_path and checkpoint_exists(ckpt_path):
            template = {"variables": variables, "opt_state": opt_state,
                        "done": jnp.asarray(0, jnp.int32)}
            loaded = load_checkpoint(ckpt_path, template)
            done = int(loaded.pop("done"))
            variables, opt_state = loaded["variables"], loaded["opt_state"]
            if self.mesh is not None:
                variables = self.place(variables)
            from pix2latent_tpu.utils.misc import cprint
            cprint(f"(checkpoint) resumed gradient run at step {done}"
                   f"/{n_steps}", "y")
        if done >= n_steps:
            # fully-complete checkpoint: recompute (out, loss) with one eval
            # (the in-scan final out is not persisted; hook noise differs by
            # one draw — loss-equivalent, documented)
            out, loss = self.eval(variables, keys[-1],
                                  step=start_step + n_steps - 1)
            return variables, opt_state, out, {"loss": jnp.asarray(loss)[None]}

        fn = self._get("grad_scan_xs", track=track)
        losses, tracked = [], []
        out = None
        for si, s0 in enumerate(range(done, n_steps, seg)):
            s1 = min(s0 + seg, n_steps)
            carry_in = (variables, opt_state)
            variables, opt_state, out, ys = fn(
                self.model.params, variables, opt_state,
                jnp.asarray(start_step + np.arange(s0, s1), jnp.int32),
                keys[s0:s1])
            losses.append(ys["loss"])
            if track:
                # fetch each segment's tracked snapshot to HOST immediately
                # (the reference tracks to CPU every step,
                # base_optimizer.py:100-107): keeping all segments' stacks
                # on device OOMs big-variable runs — w+ noises are ~350k
                # dims x pop x 500 steps = 6+ GB — while per-segment device
                # residency stays bounded at segment_steps rows
                tracked.append(jax.tree.map(np.asarray, ys["tracked"]))
            if ckpt_path and si % ckpt_every == 0:
                # one-behind: carry_in is segment s0's INPUT — materialized
                # once the previous segment finished, while this segment is
                # already in flight
                save_checkpoint(ckpt_path,
                                {"variables": carry_in[0],
                                 "opt_state": carry_in[1],
                                 "done": jnp.asarray(s0, jnp.int32)})
        if ckpt_path:
            save_checkpoint(ckpt_path,
                            {"variables": variables, "opt_state": opt_state,
                             "done": jnp.asarray(n_steps, jnp.int32)})
        ys = {"loss": jnp.concatenate(losses, axis=0)}
        if track and tracked:
            # host (numpy) arrays by construction — see the per-segment
            # fetch above; consumers (np.asarray in _accumulate_tracked)
            # are agnostic
            ys["tracked"] = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=0), *tracked)
        return variables, opt_state, out, ys

    def tell_loss(self, variables, key, step=0, inverted=True):
        """Fresh per-sample loss for the CMA tell (un-warped frame when a
        transform is registered and ``inverted``)."""
        return self._get("tell_loss", inverted=bool(inverted))(
            self.model.params, variables, key, jnp.asarray(step, jnp.int32),
            self.var_manager.defaults("output"))

    def init_opt_state(self, variables):
        return self.optimizer.init(variables)

    # ------------------------------------------------------------------ #
    # sharding                                                           #
    # ------------------------------------------------------------------ #

    def place(self, variables: Variables) -> Variables:
        """Shard the population across the mesh (no-op without a mesh)."""
        if self.mesh is None:
            return variables
        return shard_variables(variables, self.mesh)

    def place_in_graph(self, variables: Variables) -> Variables:
        """Trace-safe population-sharding constraint for variables created
        INSIDE a jitted program (the fused one-dispatch generations)."""
        if self.mesh is None:
            return variables
        from pix2latent_tpu.parallel.mesh import constrain_variables
        return constrain_variables(variables, self.mesh)

    def place_replicated(self, tree):
        if self.mesh is None:
            return tree
        return replicate(tree, self.mesh)
