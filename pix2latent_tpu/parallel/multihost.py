"""Multi-host (multi-process) population sharding.

The reference has no distributed execution at all (SURVEY.md §5.8: no
``torch.distributed``/NCCL/MPI anywhere); this module is the upgrade path
for running one inversion's CMA population across TPU hosts. Design
(SURVEY.md §5.8 / ``parallel/mesh.py``): the population axis is the only
sharded axis, generator weights and CMA state are replicated, and the only
collective is the implicit all-gather of per-sample scalar losses into the
replicated tell — so multi-host changes *where devices come from*, nothing
about the program.

Usage on each host of a pod slice (or GPU/CPU cluster)::

    from pix2latent_tpu.parallel import multihost, make_mesh
    multihost.initialize_multihost()        # env-driven (TPU: zero args)
    mesh = make_mesh()                      # global mesh over ALL devices
    ... BasinCMAOptimizer(...).optimize_fused(...)   # unchanged

Every process must run the same program (SPMD); results land replicated, so
any host can save them.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids=None) -> dict:
    """Idempotent wrapper over ``jax.distributed.initialize``.

    On TPU pods all arguments are discovered from the environment; on
    CPU/GPU clusters pass them explicitly or via the standard variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``). Returns a summary dict
    ``{process_index, process_count, local_devices, global_devices}``.
    Safe to call when already initialized (returns the current topology) and
    in single-process runs (no-op unless explicitly configured: calling
    ``jax.distributed.initialize`` with no coordinator on a non-TPU
    single process would try to spawn a coordination service).
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    want_init = (coordinator_address is not None
                 or num_processes is not None
                 or jax.default_backend() == "tpu")
    if want_init and not _initialized and jax.process_count() == 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids)
            _initialized = True
        except (RuntimeError, ValueError) as e:
            # already initialized by the launcher, or single-host TPU where
            # there is nothing to coordinate — both fine
            if "already" not in str(e).lower() and num_processes not in (
                    None, 1):
                raise
    return topology()


def topology() -> dict:
    """Current process/device topology summary."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def local_population_rows(mesh, num_samples: int,
                          axis_name: str = "pop") -> range:
    """Population rows whose shards live on THIS host's devices.

    With the population dim sharded over ``axis_name``, row blocks map to
    mesh positions in order; useful for host-side work that should touch
    only local samples (per-host logging, saving collages shard-locally).
    """
    devices = list(mesh.devices.flat)
    n_dev = len(devices)
    per = num_samples // n_dev
    assert per * n_dev == num_samples, (
        f"population {num_samples} must divide the {n_dev}-device mesh")
    mine = [i for i, d in enumerate(devices)
            if d.process_index == jax.process_index()]
    if not mine:
        return range(0)
    lo, hi = min(mine), max(mine)
    assert mine == list(range(lo, hi + 1)), \
        "non-contiguous device blocks for this process"
    return range(lo * per, (hi + 1) * per)
