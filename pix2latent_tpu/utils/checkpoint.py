"""Checkpoint/resume for long inversion runs.

The reference persists only final results — a crash loses the whole BasinCMA
run (SURVEY.md §5.3-4). Here the full ask-eval-tell carry (CMA strategy
state, RNG key, meta-iteration counter, best candidates, arbitrary extra
pytrees) round-trips through a single ``.npz`` written atomically, so long
runs are resumable. Orbax is available in the environment for sharded
multi-host state; for this workload the strategy state is tiny (< n² floats)
and a flat npz keeps restores dependency-light.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path, tree):
    """Atomically write a pytree of arrays/scalars to ``path`` (.npz)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    payload["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_token(tree)).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def load_checkpoint(path, like):
    """Restore a pytree saved by :func:`save_checkpoint`. ``like`` provides
    the tree structure (and NamedTuple/class types) to restore into."""
    with np.load(path, allow_pickle=False) as z:
        n = len([k for k in z.files if k.startswith("leaf_")])
        flat = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    treedef = jax.tree_util.tree_structure(like)
    assert treedef.num_leaves == len(flat), (
        f"checkpoint has {len(flat)} leaves; expected {treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, flat)


def _treedef_token(tree):
    """Structural fingerprint for sanity messages (not used for unflatten)."""
    return str(jax.tree_util.tree_structure(tree))


def checkpoint_exists(path):
    return os.path.exists(path)


class FusedCheckpointer:
    """Crash-safe resume for the fused one-dispatch meta loops.

    The four fused drivers (BasinCMA/Hybrid-NG ``optimize_fused``, the
    transform search's ``optimize_fused`` / ``optimize_fused_batched``)
    share this instead of hand-rolling load/save/resume-print. Two
    contracts distinguish it from :class:`LoopCheckpointer` (the host-loop
    drivers' helper):

    - The carry is an explicit dict the driver threads itself (fused loops
      keep their state in local variables, not optimizer attributes).
    - ``save(gi, carry)`` is called with the carry that was INPUT to the
      generation just dispatched — i.e. the previous generation's output,
      which the one-behind loss fetch has already materialized — so the
      host write never blocks on the in-flight dispatch. The dispatch
      queue stays full; a crash costs at most two generations. (Saving the
      just-dispatched generation's output would fetch-sync every
      generation, serializing host dispatch against device compute — the
      exact stall the fused drivers' one-behind loss recording avoids.)
    - ``finalize(meta_steps, carry)`` writes the terminal carry after the
      loop (when it is materialized anyway) so re-running a completed run
      skips the whole loop.
    """

    def __init__(self, path, label: str, every: int = 1):
        self.path = path
        self.label = label
        self.every = max(int(every), 1)
        self.loaded = None

    def resume(self, template: dict) -> int:
        """Load ``{**template, meta_iter}`` if a checkpoint exists; the
        restored carry lands in ``self.loaded``. Returns the start
        generation (0 on a fresh run)."""
        if not self.path or not checkpoint_exists(self.path):
            return 0
        saved = load_checkpoint(
            self.path,
            {**template, "meta_iter": jnp.asarray(0, jnp.int32)})
        start = int(saved.pop("meta_iter"))
        self.loaded = saved
        from pix2latent_tpu.utils.misc import cprint
        cprint(f"(checkpoint) resumed {self.label} at generation {start}",
               "y")
        return start

    def save(self, meta_iter: int, carry: dict):
        """Write ``carry`` as the state entering generation ``meta_iter``
        (see the class docstring for why this is the previous generation's
        already-materialized output)."""
        if self.path and meta_iter % self.every == 0:
            save_checkpoint(
                self.path,
                {**carry, "meta_iter": jnp.asarray(meta_iter, jnp.int32)})

    def finalize(self, meta_steps: int, carry: dict):
        if self.path:
            save_checkpoint(
                self.path,
                {**carry, "meta_iter": jnp.asarray(meta_steps, jnp.int32)})


class LoopCheckpointer:
    """Crash-safe resume for any ask-eval-tell meta loop.

    Wraps one optimizer attribute holding the strategy state (``cma_state``
    for the CMA drivers, ``ng_state`` for the registry drivers) plus the
    driver's RNG key and meta-iteration counter. Every driver exposing
    ``checkpoint_path=`` delegates here, so resumability is a uniform
    property of the framework (SURVEY.md §5.3) instead of a BasinCMA-only
    feature (VERDICT.md round 1, item 9).

    Usage::

        ckpt = LoopCheckpointer(path, opt, "cma_state", every=k)
        start = ckpt.resume()            # 0 if no checkpoint on disk
        for i in range(start, n):
            ...
            ckpt.save(i + 1)             # no-op unless (i+1) % every == 0
    """

    def __init__(self, path, optimizer, state_attr: str, every: int = 1,
                 extra_attrs: tuple = ()):
        self.path = path
        self.opt = optimizer
        self.state_attr = state_attr
        self.every = max(int(every), 1)
        self.extra_attrs = tuple(extra_attrs)

    def _carry(self, meta_iter: int):
        carry = {"state": getattr(self.opt, self.state_attr),
                 "key": self.opt._key,
                 "meta_iter": jnp.asarray(meta_iter, jnp.int32)}
        if self.extra_attrs:
            # extra driver state (e.g. the transform driver's propagation
            # EMA + best-candidate tracking); each attribute must hold a
            # pytree whose structure is stable across the meta loop
            carry["extra"] = {a: getattr(self.opt, a)
                              for a in self.extra_attrs}
        return carry

    def resume(self) -> int:
        if not self.path or not checkpoint_exists(self.path):
            return 0
        carry = load_checkpoint(self.path, self._carry(0))
        setattr(self.opt, self.state_attr, carry["state"])
        self.opt._key = carry["key"]
        for a in self.extra_attrs:
            setattr(self.opt, a, carry["extra"][a])
        start = int(carry["meta_iter"])
        from pix2latent_tpu.utils.misc import cprint
        cprint(f"(checkpoint) resumed at generation {start}", "y")
        return start

    def save(self, meta_iter: int):
        if self.path and meta_iter % self.every == 0:
            save_checkpoint(self.path, self._carry(meta_iter))
