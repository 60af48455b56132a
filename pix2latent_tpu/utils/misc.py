"""Console/reporting/seed utilities.

Counterpart of the reference's ``pix2latent/utils/misc.py``. Torch-specific
helpers (inplace-ReLU rewrite, spectral-norm removal) have no JAX analogue —
spectral norm is baked into weights at conversion time instead
(see ``models/biggan.py``).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_COLORS = {
    "r": "\033[91m", "g": "\033[92m", "y": "\033[93m",
    "b": "\033[94m", "m": "\033[95m", "c": "\033[96m",
}
_END = "\033[0m"


def set_seed(seed: int):
    """Seed numpy and return a fresh JAX PRNG key (reference ``misc.py:17``)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def to_onehot(idx, num_classes=1000):
    """Integer (or list of ints) -> one-hot float array [n, num_classes]."""
    idx = np.atleast_1d(np.asarray(idx, np.int32))
    out = np.zeros((idx.size, num_classes), np.float32)
    out[np.arange(idx.size), idx] = 1.0
    return jnp.asarray(out)


def to_numpy(x):
    """Device array -> host numpy (reference ``misc.py:25-26``'s
    ``.detach().cpu().numpy()``)."""
    return np.asarray(x)


def prepare_variables(variables, precision="float"):
    """Cast a list/pytree of arrays to the requested precision and place on
    the default device (reference ``misc.py:50-56``'s
    ``[v.half().cuda() for v in vars]``; 'half' means bfloat16 on TPU)."""
    return jax.device_put(set_model_precision(variables, precision))


def set_model_precision(params, precision="float"):
    """Cast a weight pytree: 'half' -> bfloat16 (TPU-native low precision),
    'float' -> float32, 'double' -> float64 (reference ``misc.py:36-56``
    used fp16; bf16 is the TPU equivalent)."""
    dtype = {"half": jnp.bfloat16, "bfloat16": jnp.bfloat16,
             "float": jnp.float32, "float32": jnp.float32,
             "double": jnp.float64}[precision]
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, params)


class HiddenPrints:
    """Suppress stdout inside a with-block (reference ``misc.py:59-73``)."""

    def __enter__(self):
        self._stdout = sys.stdout
        sys.stdout = open(os.devnull, "w")

    def __exit__(self, exc_type, exc_val, exc_tb):
        sys.stdout.close()
        sys.stdout = self._stdout


def cprint(text, color=None, **kwargs):
    """ANSI color print (reference ``misc.py:76-113``)."""
    if color in _COLORS:
        print(f"{_COLORS[color]}{text}{_END}", **kwargs)
    else:
        print(text, **kwargs)


def loss_to_color(loss):
    """Colorize a loss magnitude for console reporting (``misc.py:116-129``)."""
    if loss < 0.3:
        return "g"
    if loss < 0.6:
        return "y"
    return "r"


def color_str(string, color):
    """Wrap ``string`` in ANSI codes (reference ``misc.py:96-99``); unknown
    colors pass through uncolored."""
    if color in _COLORS:
        return f"{_COLORS[color]}{string}{_END}"
    return str(string)


def color_loss(loss):
    """Loss formatted with the reference's magnitude color thresholds
    (``misc.py:116-129``: <0.01 cyan, <0.1 green, <0.5 yellow, else red)."""
    c = "r"
    if loss < 0.5:
        c = "y"
    if loss < 0.1:
        c = "g"
    if loss < 0.01:
        c = "c"
    return color_str(f"{loss:.5f}", c)


def progress_print(task, curr, total, color=None, t_avg=None):
    """Progress line with %-done and sec/iter (reference ``misc.py:132-138``)."""
    pct = 100.0 * curr / max(total, 1)
    msg = f"[{task}] {curr}/{total} ({pct:.1f}%)"
    if t_avg is not None:
        msg += f"  {t_avg:.3f} sec/iter"
    cprint(msg, color)


class Timer:
    """Tiny wall-clock timer for sec/iter reporting."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()

    def avg(self, iters):
        return (time.time() - self.t0) / max(iters, 1)
