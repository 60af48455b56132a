"""Host-callback escape hatch: wrap ANY host-side ask/tell optimizer.

The reference accepts every name in ``ng.optimizers.registry``
(``pix2latent/optimizer/base_ng_optimizer.py:33,81-83``) — hundreds of
optimizers, most of them host-side Python with impure state. The on-device
registry covers the core algorithms; this module recovers the *full*
surface (SURVEY.md §2 native table, Nevergrad row; VERDICT.md round 2,
item 4): :class:`HostStrategy` adapts any stateful host optimizer exposing

    xs = host.ask()            # [num_samples, dim] float
    host.tell(xs, losses)      # losses [num_samples]

to the registry's pure ask/tell interface. Outside jit (the host meta
loops) the calls go straight through to the Python object; INSIDE jit (the
fused one-dispatch generations) they run via ordered
``jax.experimental.io_callback`` — the device program blocks on the host
round trip exactly where the reference's host-PyCMA/nevergrad bridge did,
so exotic host methods work in every driver at the cost the reference
always paid. Runtime caveat: the experimental axon TPU tunnel never
completes host callbacks issued from inside jit (measured — a trivial
jitted io_callback hangs; CLAUDE.md), so on axon use the host-loop
drivers (``optimize``) with ``Host:`` strategies, not ``optimize_fused``.

Sequential semantics: a host backend is free to produce its candidate batch
however it wants — the nevergrad adapter below asks its wrapped optimizer
ONE candidate at a time (λ sequential asks per generation), which restores
the reference's ask-one-at-a-time behavior for ``no_parallelization``
methods (``base_ng_optimizer.py:36-41,100-102``) that the on-device
registry deliberately drops.

Usage::

    registry-style:  resolve("Host:OnePlusOne")(dim, n, mu, sigma)
    drivers:         NevergradOptimizer("Host:<ng-name>", ...)  # needs
                     nevergrad importable; any custom backend via
                     register_host_backend("MyOpt", factory)
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class HostStrategy:
    """Registry-interface adapter around a stateful host optimizer.

    The pure-state contract is satisfied with an opaque ordering token:
    the real state lives in the wrapped Python object, and the token
    threads data dependencies through traced programs so XLA cannot
    reorder or elide the callbacks. Consequently a ``HostStrategy`` run is
    only replayable through its host object (no checkpoint/resume of the
    opaque state — the same limitation the reference's nevergrad bridge
    had); the on-device strategies remain the first-class citizens.
    """

    def __init__(self, dim, num_samples, host, name="host"):
        self.dim = int(dim)
        self.num_samples = int(num_samples)
        self.sigma0 = 1.0           # interface parity; the host owns sigma
        self.mu0 = jnp.zeros(dim, jnp.float32)
        self._host = host
        self.name = name

    class State(NamedTuple):
        version: jax.Array          # i32 ordering token

    def cache_token(self):
        """Per-INSTANCE token (unlike the on-device strategies'
        config-derived one): a traced program closes over the mutable host
        object via the io_callback, so it must never be reused for a
        different ``HostStrategy`` even with identical config."""
        return (type(self).__name__, self.name, self.dim, self.num_samples,
                id(self))

    def init(self, key):
        return self.State(jnp.zeros((), jnp.int32))

    # -- host halves ---------------------------------------------------- #

    def _ask_host(self, version):
        x = np.asarray(self._host.ask(), np.float32)
        assert x.shape == (self.num_samples, self.dim), (
            f"host backend returned {x.shape}, expected "
            f"{(self.num_samples, self.dim)}")
        return x

    def _tell_host(self, x, loss):
        self._host.tell(np.asarray(x, np.float32),
                        np.asarray(loss, np.float32))
        return np.zeros((), np.int32)

    # -- registry interface --------------------------------------------- #

    @staticmethod
    def _tracing(*leaves) -> bool:
        return any(isinstance(a, jax.core.Tracer) for a in leaves)

    def ask(self, state, key):
        """key is accepted for interface parity; the host backend owns its
        own RNG (same as the reference's nevergrad bridge).

        Eager calls (the host meta-loop drivers) go STRAIGHT to the host
        object — no io_callback involved, so ``Host:`` strategies work on
        every runtime, including the axon TPU tunnel, whose remote
        runtime never completes host callbacks issued from inside jit
        (measured: a trivial jitted io_callback hangs; CLAUDE.md). Only
        traced calls (the fused one-dispatch drivers) use the ordered
        io_callback — fine on CPU/standard TPU runtimes, documented
        unsupported under axon (use the host-loop ``optimize`` there).
        """
        if not self._tracing(state.version, key):
            return jnp.asarray(self._ask_host(np.asarray(state.version)))
        import jax.experimental

        return jax.experimental.io_callback(
            self._ask_host,
            jax.ShapeDtypeStruct((self.num_samples, self.dim), jnp.float32),
            state.version, ordered=True)

    def ask_with_aux(self, state, key):
        return self.ask(state, key), None

    def tell(self, state, x, loss, aux=None):
        if not self._tracing(state.version, x, loss):
            self._tell_host(np.asarray(x), np.asarray(loss))
            return self.State(state.version + 1)
        import jax.experimental

        token = jax.experimental.io_callback(
            self._tell_host, jax.ShapeDtypeStruct((), jnp.int32),
            x, loss, ordered=True)
        return self.State(state.version + 1 + 0 * token)

    def mean(self, state):
        """Best-known point from the host (fetched eagerly; only called
        from host code). Accepts a ``mean()`` method or a ``mean``
        attribute on the backend."""
        m = getattr(self._host, "mean", None)
        if callable(m):
            m = m()
        if m is None:
            return jnp.asarray(np.zeros(self.dim, np.float32))
        return jnp.asarray(np.asarray(m, np.float32))


# -- backends ----------------------------------------------------------- #

_HOST_BACKENDS: Dict[str, Callable] = {}


def register_host_backend(name: str, factory: Callable):
    """Register ``factory(dim, num_samples, mu, sigma) -> host object`` so
    ``resolve("Host:<name>")`` finds it (tests use a stub backend; real
    deployments can plug nevergrad or anything else)."""
    _HOST_BACKENDS[name] = factory


class _NevergradBackend:
    """Adapter: nevergrad optimizer -> the host ask/tell contract.

    Asks ONE candidate at a time (λ sequential asks per generation) — the
    reference's ``no_parallelization`` semantics — and keeps the candidate
    objects for the tell.
    """

    def __init__(self, ng_name, dim, num_samples, mu, sigma):
        import nevergrad as ng

        init = (np.zeros(dim, np.float64) if mu is None
                else np.asarray(mu, np.float64).reshape(-1))
        param = ng.p.Array(init=init)
        if sigma is not None and float(sigma) != 1.0:
            # the registered grad_free (mu, sigma) seed must reach the host
            # optimizer too — nevergrad scales mutations via the
            # parametrization's mutation sigma (default 1.0)
            param.set_mutation(sigma=float(sigma))
        self._opt = ng.optimizers.registry[ng_name](
            parametrization=param, budget=None, num_workers=1)
        self._pending = []
        self.num_samples = num_samples

    def ask(self):
        self._pending = [self._opt.ask() for _ in range(self.num_samples)]
        return np.stack([c.value for c in self._pending])

    def tell(self, x, loss):
        for cand, f in zip(self._pending, loss):
            self._opt.tell(cand, float(f))
        self._pending = []

    def mean(self):
        return np.asarray(self._opt.provide_recommendation().value)


def make_host_strategy(name: str):
    """Factory for ``resolve("Host:<name>")``: a registered custom backend
    wins; otherwise the name is looked up in nevergrad's registry (loud
    error when nevergrad isn't importable — this environment ships
    without it by design; the on-device registry is the native path)."""
    backend_name = name.split(":", 1)[1]

    def build(dim, num_samples, mu=None, sigma=1.0):
        if backend_name in _HOST_BACKENDS:
            host = _HOST_BACKENDS[backend_name](dim, num_samples, mu, sigma)
            return HostStrategy(dim, num_samples, host, name=name)
        try:
            import nevergrad  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                f"'{name}' needs either a backend registered via "
                f"register_host_backend({backend_name!r}, factory) or an "
                "importable nevergrad package; neither is present. The "
                "on-device registry (pix2latent_tpu.strategies.registry) "
                "covers the core algorithms without host round trips."
            ) from e
        host = _NevergradBackend(backend_name, dim, num_samples, mu, sigma)
        return HostStrategy(dim, num_samples, host, name=name)

    return build
