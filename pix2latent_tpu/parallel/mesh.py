"""Device-mesh population sharding.

The reference is single-GPU and chunks the CMA population into mini-batches
(``split_vars``, ``variable_manager.py:16-46``; ``max_batch_size=9``). On TPU
the population *is* the data-parallel axis: every sample is independent (the
generator weights are frozen and replicated), so we shard the leading
``pop`` dimension of every variable across a 1-D ``('pop',)`` mesh and let
GSPMD partition the vmapped generator forward. The only cross-device
communication in the whole BasinCMA generation is the implicit all-gather of
per-sample scalar losses feeding the (replicated) CMA tell — a few hundred
bytes over ICI.

Multi-host: build the mesh from ``jax.devices()`` after
``jax.distributed.initialize``; nothing else changes.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POP_AXIS = "pop"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = POP_AXIS,
              devices=None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all available)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def population_sharding(mesh: Mesh, axis_name: str = POP_AXIS) -> NamedSharding:
    """Shard the leading (population) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params, CMA state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_variables(variables, mesh: Mesh, axis_name: str = POP_AXIS):
    """Place a Variables pytree with the population dim sharded."""
    sharding = population_sharding(mesh, axis_name)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), variables)


def constrain_variables(variables, mesh: Mesh, axis_name: str = POP_AXIS):
    """In-graph (trace-safe) counterpart of :func:`shard_variables`.

    The fused one-dispatch generation creates its population INSIDE jit
    (fresh ``initialize`` + CMA ask), where ``jax.device_put`` can't run and
    GSPMD would otherwise propagate the replicated sharding of the CMA state
    onto the whole inner loop. A ``with_sharding_constraint`` on the
    population pytree pins the data-parallel layout. Leaves whose leading
    dim isn't divisible by the mesh (e.g. deduped 1-row outputs) are left
    for GSPMD to place.
    """
    sharding = population_sharding(mesh, axis_name)
    n_dev = mesh.shape[axis_name]

    def constrain(a):
        if a.ndim >= 1 and a.shape[0] % n_dev == 0:
            return jax.lax.with_sharding_constraint(a, sharding)
        return a

    return jax.tree.map(constrain, variables)


def pad_population(num_samples: int, mesh: Optional[Mesh],
                   axis_name: str = POP_AXIS) -> int:
    """Round a population size up to a multiple of the mesh axis so every
    device gets an equal shard (CMA-ES accepts any λ; extra samples only add
    selection pressure)."""
    if mesh is None:
        return num_samples
    n_dev = mesh.shape[axis_name]
    return ((num_samples + n_dev - 1) // n_dev) * n_dev
