"""Gradient-free strategy driver mixin (the Nevergrad-bridge replacement).

Counterpart of the reference's ``_BaseNevergradOptimizer``
(``pix2latent/optimizer/base_ng_optimizer.py:10-171``): same
setup/init/update flow, but the strategy registry is the on-device
``pix2latent_tpu.strategies.registry`` — population size is free (unlike
PyCMA) and the whole ask/eval/tell loop stays on device.

Deliberate deviation: the reference special-cases nevergrad methods flagged
``no_parallelization`` by asking ONE candidate per step
(``base_ng_optimizer.py:36-41,100-102``). Serial asks idle a TPU, so that
mode is not reproduced; inherently-sequential methods are represented by
batched-λ variants instead (e.g. ``OnePlusOne`` evaluates λ parallel
mutations per generation with a λ-adjusted 1/5th success rule).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.parallel.mesh import (pad_population)
from pix2latent_tpu.strategies.registry import (is_valid_method, registry,
                                                resolve)
from pix2latent_tpu.utils.misc import cprint


class _BaseNGOptimizer:
    """Mixin used jointly with ``_BaseOptimizer``. Only a single grad-free
    variable is supported (the reference asserts the same,
    ``base_ng_optimizer.py:86-88``)."""

    def __init__(self, method: str):
        self.method = method
        self.valid_methods = sorted(registry) + ["Host:<backend>"]
        assert is_valid_method(method), (
            f"unknown strategy: {method}; available: {self.valid_methods}")
        self.ng_strategy = None
        self.ng_state = None
        self._gf_var = None
        self._sampled = None

    def setup_ng(self, var_manager, num_samples: int, budget=None):
        """Initialize the strategy for the grad-free variable (reference
        ``base_ng_optimizer.py:51-89``). ``budget`` is the total evaluation
        count (nevergrad's definition, generations x population); it is
        forwarded to factories that route or scale on it (``NGOpt``'s
        portfolio branches, ``MetaRecentering``'s recentering scale) and
        ignored by fixed algorithms."""
        gf = var_manager.grad_free_variables()
        assert len(gf) == 1, (
            "currently only a single variable can be optimized gradient-free "
            f"but got: {[(vt, n) for vt, n, _ in gf]}")
        var_type, name, spec = gf[0]
        shape = spec["shape"]
        dim = int(np.prod(shape))

        mu, sigma = None, 1.0
        if isinstance(spec["grad_free"], tuple):
            m, s = spec["grad_free"]
            if m is not None:
                mu = np.asarray(m, np.float32).reshape(-1)
            if s is not None:
                sigma = float(s)

        requested = int(num_samples)
        num_samples = pad_population(num_samples, getattr(self, "mesh", None))
        if budget is not None and num_samples != requested:
            # keep budget consistent with the padded worker count: callers
            # compute budget = generations x requested population, and the
            # NGOpt routing branches compare workers against budget — mixed
            # units would silently flip branches on meshed runs only
            budget = budget * num_samples / max(requested, 1)
        factory = resolve(self.method)
        kwargs = {}
        if budget is not None:
            import inspect
            try:
                if "budget" in inspect.signature(factory).parameters:
                    kwargs["budget"] = budget
            except (TypeError, ValueError):
                pass
        self.ng_strategy = factory(dim, num_samples, mu, sigma, **kwargs)
        self.ng_state = self.ng_strategy.init(self.next_key())
        self.num_samples = num_samples
        self._gf_var = (var_type, name, shape)
        cprint(f"({self.method}) number of samples: {num_samples}", "y")

    def reject_host_checkpoint(self, checkpoint_path):
        """``Host:`` strategies cannot checkpoint: the real optimizer state
        lives in the wrapped host Python object (``strategies/host.py``
        saves only the i32 ordering token), so a resumed run would print
        "resumed at generation N" while the search silently restarts from
        scratch. Refuse loudly instead of degrading silently."""
        from pix2latent_tpu.strategies.host import HostStrategy
        if checkpoint_path and isinstance(self.ng_strategy, HostStrategy):
            raise ValueError(
                f"checkpoint_path is unsupported with '{self.method}': "
                "Host:<backend> strategies keep their state in the wrapped "
                "host optimizer object, which cannot be serialized — a "
                "resume would silently restart the search. Drop "
                "checkpoint_path or use an on-device strategy.")

    def ng_init(self, var_manager, num_samples: Optional[int] = None, key=None):
        """Fresh population with the grad-free variable filled from ask
        (reference ``base_ng_optimizer.py:92-117``)."""
        if key is None:
            key = self.next_key()
        k_init, k_ask = jax.random.split(key)
        variables = var_manager.initialize(num_samples=self.num_samples,
                                           key=k_init)
        x, aux = self.ng_strategy.ask_with_aux(self.ng_state, k_ask)
        var_type, name, shape = self._gf_var
        variables[var_type][name] = x.reshape(self.num_samples, *shape)
        # defensive copy: the reshaped view shares the buffer that the
        # donated grad-scan consumes; the tell needs the original ask
        self._sampled = jnp.array(x, copy=True)
        self._ask_aux = aux
        return self.core.place(variables)

    def ng_update(self, variables, loss=None, inverted_loss=False, step=0):
        """Tell the strategy the population fitness (reference
        ``base_ng_optimizer.py:120-171``)."""
        if loss is None:
            loss = self.core.tell_loss(variables, self.next_key(), step,
                                       inverted=inverted_loss)
        from pix2latent_tpu.strategies.cma import sanitize_fitness
        self.ng_state = self.ng_strategy.tell(
            self.ng_state, self._sampled,
            sanitize_fitness(jnp.asarray(loss)),
            aux=getattr(self, "_ask_aux", None))
        return loss
