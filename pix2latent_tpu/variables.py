"""Variable registry and population state.

TPU-native counterpart of the reference's ``pix2latent/variable_manager.py``.
The public API (``register`` / ``unregister`` / ``edit_variable`` /
``initialize`` and the module-level ``split_vars`` / ``save_variables``) keeps
the reference's names and keyword semantics (``variable_manager.py:83-240``),
but the materialized state is a *pytree*:

    Variables = {var_type: {var_name: f32[num_samples, *shape]}}

instead of per-sample CUDA tensors bound to a torch optimizer. The optimizer
is built separately (``make_optimizer`` -> optax ``multi_transform`` with
per-variable learning rates), so the whole population state can flow through
``jit`` / ``lax.scan`` / ``shard_map`` untouched.
"""

from __future__ import annotations

import pprint
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pix2latent_tpu import distribution as dist

# A Variables object is a plain nested dict pytree:
#   {var_type: {var_name: array[num_samples, *shape]}}
Variables = Dict[str, Dict[str, jax.Array]]

_FROZEN = "__frozen__"


def num_samples(variables: Variables) -> int:
    """Population size of a Variables pytree."""
    for var_dict in variables.values():
        for arr in var_dict.values():
            return int(arr.shape[0])
    raise ValueError("empty Variables")


def split_vars(variables: Variables, size: int):
    """Split a Variables pytree into chunks of at most ``size`` samples.

    Host-side utility kept for API parity with the reference's mini-batch
    chunking (``variable_manager.py:16-46``). On TPU the population is
    normally kept whole and sharded across the device mesh instead.
    """
    n = num_samples(variables)
    out = []
    for i in range(0, n, size):
        out.append(jax.tree.map(lambda a: a[i:i + size], variables))
    return out


def stack_splits(chunks):
    """Inverse of :func:`split_vars`."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


def save_variables(save_path, variables, extras: Optional[dict] = None):
    """Persist a Variables pytree (plus optional extras) to ``.npy``.

    Counterpart of the reference's ``save_variables``
    (``variable_manager.py:49-65``), minus its torch-optimizer pickling bug.
    """
    payload = {
        "variables": jax.tree.map(lambda a: np.asarray(a), variables),
    }
    if extras:
        payload.update(jax.tree.map(lambda a: np.asarray(a), extras))
    # np.save(path, ...) silently appends ".npy" to extension-less / foreign
    # extensions, breaking save->load round-trips on the exact same path;
    # writing through a file handle honors the path verbatim.
    with open(save_path, "wb") as f:
        np.save(f, payload, allow_pickle=True)


def load_variables(path):
    """Load a payload saved by :func:`save_variables`."""
    return np.load(path, allow_pickle=True).item()


class VariableManager:
    """Registry of named optimization variables.

    Mirrors the reference API (``variable_manager.py:69-240``): a variable is
    a named spec with shape, ``var_type`` (``input`` feeds the model forward,
    ``output`` feeds the loss, ``transform`` feeds registered transforms),
    gradient / gradient-free flags, init distribution, per-variable optimizer
    and learning rate, and an optional per-step hook.
    """

    def __init__(self, seed: int = 0):
        self.variable_info: Dict[str, Dict[str, Any]] = {}
        self._key = jax.random.PRNGKey(seed)

    def __str__(self):
        return "<VariableManager>\n{}".format(pprint.pformat(self.variable_info))

    # ------------------------------------------------------------------ #
    # registry                                                           #
    # ------------------------------------------------------------------ #

    def register(self,
                 variable_name: str,
                 shape,
                 var_type: str = "input",
                 requires_grad: bool = True,
                 default=None,
                 distribution=None,
                 optimizer="adam",
                 learning_rate: float = 0.05,
                 hook_fn: Optional[Callable] = None,
                 grad_free=False):
        """Register a variable spec (reference ``variable_manager.py:83-145``).

        Args:
            variable_name: name; must match the model forward kwarg (for
                ``var_type='input'``) or the loss kwarg (``'output'``).
            shape: per-sample shape tuple.
            var_type: one of ``input`` / ``output`` / ``transform``.
            requires_grad: if True the variable receives Adam updates.
            default: default per-sample value (array of ``shape``); overrides
                ``distribution`` when set.
            distribution: sampler ``(key, num_samples, shape) -> array``;
                defaults to ``TruncatedNormalModulo(sigma=1, trunc=2)``.
            optimizer: 'adam' | 'sgd' | 'adamw' or callable ``lr ->``
                ``optax.GradientTransformation``.
            learning_rate: per-variable learning rate.
            hook_fn: pure hook ``(key, x, step) -> x`` applied inside the step.
            grad_free: False, True, or ``(mu, sigma)`` — marks the variable for
                the gradient-free (CMA / NG) outer loop; ``(mu, sigma)`` seeds
                the search distribution at N(mu, sigma^2 I).
        """
        if variable_name in self.variable_info:
            print(f"variable `{variable_name}` already exists.")
            return False

        shape = tuple(shape)
        if default is not None:
            default = jnp.asarray(default, dtype=jnp.float32)
            assert tuple(default.shape) == shape, (
                f"default and shape must match but got "
                f"{tuple(default.shape)} vs {shape}")

        if distribution is None:
            distribution = dist.TruncatedNormalModulo(sigma=1.0, trunc=2.0)

        self.variable_info[variable_name] = {
            "shape": shape,
            "var_type": var_type,
            "requires_grad": bool(requires_grad),
            "default": default,
            "distribution": distribution,
            "optimizer": optimizer,
            "learning_rate": float(learning_rate),
            "hook_fn": hook_fn,
            "grad_free": grad_free,
        }
        return True

    def unregister(self, *variable_names):
        for v in variable_names:
            if v in self.variable_info:
                del self.variable_info[v]
            else:
                print(f"no variable named {v}")

    def edit_variable(self, variable_name: str, replace_dict: dict):
        """Edit attributes of a registered variable (``variable_manager.py:167-194``)."""
        if variable_name not in self.variable_info:
            print(f"variable `{variable_name}` does not exist")
            return False
        for k, v in replace_dict.items():
            if k not in self.variable_info[variable_name]:
                print(f"variable `{variable_name}` has no attribute {k}")
                return False
            if k == "default" and v is not None:
                v = jnp.asarray(v, dtype=jnp.float32)
            self.variable_info[variable_name][k] = v
        return True

    # ------------------------------------------------------------------ #
    # materialization                                                    #
    # ------------------------------------------------------------------ #

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def initialize(self, num_samples: int, key=None,
                   defaults: Optional[Dict[str, jax.Array]] = None) -> Variables:
        """Materialize a fresh population (``variable_manager.py:196-240``).

        Returns a Variables pytree; unlike the reference no optimizer is
        created here — use :meth:`make_optimizer` once and re-init its state
        per population (BasinCMA re-initializes Adam state every generation
        by re-calling ``optimizer.init``).

        ``defaults``: optional {name: array[shape]} overriding the registered
        defaults. Jitted programs that call ``initialize`` inside their trace
        (e.g. the fused BasinCMA generation) MUST pass the defaults through
        this argument — reading the spec constants from inside a jit embeds
        the target image into the executable, forcing a full recompile per
        inversion (the constant-embedding failure mode CLAUDE.md forbids).
        """
        if key is None:
            key = self._next_key()
        defaults = defaults or {}
        variables: Variables = {}
        names = sorted(self.variable_info)
        keys = jax.random.split(key, max(len(names), 1))
        for k, name in zip(keys, names):
            spec = self.variable_info[name]
            default = defaults.get(name, spec["default"])
            if default is not None:
                default = jnp.asarray(default, jnp.float32)
                data = jnp.broadcast_to(
                    default[None], (num_samples, *spec["shape"]))
                data = jnp.asarray(data)
            else:
                data = spec["distribution"](k, num_samples, spec["shape"])
                data = jnp.asarray(data, dtype=jnp.float32)
            variables.setdefault(spec["var_type"], {})[name] = data
        return variables

    def defaults(self, var_type: Optional[str] = None) -> Dict[str, jax.Array]:
        """{name: default} for every registered variable with a default
        (optionally restricted to one ``var_type``) — the per-problem data
        a jitted program should receive as ARGUMENTS (see ``initialize``)."""
        return {
            name: spec["default"]
            for name, spec in self.variable_info.items()
            if spec["default"] is not None
            and (var_type is None or spec["var_type"] == var_type)}

    # ------------------------------------------------------------------ #
    # gradient plumbing                                                  #
    # ------------------------------------------------------------------ #

    def _optax_for(self, spec):
        opt = spec["optimizer"]
        lr = spec["learning_rate"]
        if callable(opt) and not isinstance(opt, str):
            return opt(lr)
        name = str(opt).lower()
        if name in ("adam",):
            return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        if name in ("adamw",):
            return optax.adamw(lr)
        if name in ("sgd",):
            return optax.sgd(lr)
        if name in ("lamb",):
            return optax.lamb(lr)
        raise ValueError(f"unknown optimizer spec: {opt!r}")

    def labels(self, variables: Variables):
        """Label pytree for optax.multi_transform: var name, or frozen."""
        return {
            vt: {
                name: (name if self.variable_info[name]["requires_grad"]
                       else _FROZEN)
                for name in var_dict
            }
            for vt, var_dict in variables.items()
        }

    def make_optimizer(self) -> optax.GradientTransformation:
        """One optax optimizer over the full Variables pytree.

        Per-variable transforms keyed by name; frozen (requires_grad=False)
        variables get ``set_to_zero`` so targets/weights never move.
        """
        transforms = {_FROZEN: optax.set_to_zero()}
        for name, spec in self.variable_info.items():
            if spec["requires_grad"]:
                transforms[name] = self._optax_for(spec)
        return optax.multi_transform(transforms, self.labels)

    def apply_hooks(self, key, variables: Variables, step=0) -> Variables:
        """Apply all registered hook_fns (pure; used inside the jitted step)."""
        out = {vt: dict(d) for vt, d in variables.items()}
        names = [n for n, s in sorted(self.variable_info.items())
                 if s["hook_fn"] is not None]
        if not names:
            return out
        keys = jax.random.split(key, len(names))
        for k, name in zip(keys, names):
            spec = self.variable_info[name]
            vt = spec["var_type"]
            if vt in out and name in out[vt]:
                out[vt][name] = spec["hook_fn"](k, out[vt][name], step)
        return out

    # ------------------------------------------------------------------ #
    # grad-free bookkeeping                                              #
    # ------------------------------------------------------------------ #

    def grad_free_variables(self):
        """[(var_type, name, spec)] for variables searched gradient-free."""
        out = []
        for name, spec in sorted(self.variable_info.items()):
            if spec["grad_free"] is not False:
                out.append((spec["var_type"], name, spec))
        return out
