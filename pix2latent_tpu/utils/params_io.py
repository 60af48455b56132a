"""Self-describing .npz persistence for converted model parameter trees.

The torch->Flax converters (``models/biggan.py::convert_torch_biggan``,
``models/stylegan2.py::convert_torch_stylegan2``,
``losses/lpips.py::convert_torch_lpips``) produce nested dict pytrees; this
module flattens them to '/'-joined key paths so an ``.npz`` on disk can be
reloaded WITHOUT knowing the tree structure — the conversion needs torch,
the reload does not (deploy once, load anywhere). Used by
``scripts/convert.py`` and the model wrappers' ``pretrained_path=*.npz``
fast path.
"""

from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert _SEP not in str(k), (
                f"key {k!r} contains the separator {_SEP!r}")
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params_npz(path: str, params) -> dict:
    """Atomically write a nested-dict params tree to ``path``.

    Returns {key_path: shape} — the shape report the CLI prints.
    """
    flat = _flatten(params)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return {k: v.shape for k, v in flat.items()}


def load_params_npz(path: str):
    """Rebuild the nested dict tree saved by :func:`save_params_npz`."""
    tree: dict = {}
    with np.load(path, allow_pickle=False) as z:
        for key in z.files:
            parts = key.split(_SEP)
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return tree
