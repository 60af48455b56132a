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
