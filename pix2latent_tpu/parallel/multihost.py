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
    multihost.initialize_multihost()        # FIRST jax-touching call!
    mesh = make_mesh()                      # global mesh over ALL devices
    ... BasinCMAOptimizer(...).optimize_fused(...)   # unchanged

``jax.distributed.initialize`` must run before anything initializes the XLA
backend, so call :func:`initialize_multihost` before any other JAX work.
Every process runs the same program (SPMD); results land replicated, so any
host can save them.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

def _multi_host_markers() -> bool:
    """True only for env markers SPECIFIC to multi-host slices. Single-host
    TPU VMs also export TPU_WORKER_ID / a one-entry TPU_WORKER_HOSTNAMES,
    and treating those as pod markers would send zero-config single-host
    runs into jax's cluster auto-detection (metadata-server probes that can
    raise or retry for minutes when unreachable)."""
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def _distributed_client():
    """The live jax.distributed client, or None. (There is no public
    is_initialized(); this reads the documented-stable internal state.)"""
    try:
        from jax._src import distributed as _dist
        return getattr(_dist.global_state, "client", None)
    except (ImportError, AttributeError):  # pragma: no cover - jax moved
        return None


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids=None) -> dict:
    """Idempotent wrapper over ``jax.distributed.initialize``.

    MUST be the first JAX-touching call in the process — it deliberately
    avoids querying the backend itself, because initializing the XLA
    backend makes ``jax.distributed.initialize`` impossible.

    Initialization happens when the caller (or the environment) provides
    distributed config: explicit arguments, the standard variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``), or TPU-pod launcher markers (auto-discovery).
    Plain single-process runs with none of those are a no-op. Failures
    (bad coordinator address, called after backend init, ...) raise —
    silently degrading a pod job to independent single-host runs would
    compute garbage. Returns ``{process_index, process_count,
    local_devices, global_devices}``.
    """
    if _distributed_client() is not None:      # launcher already did it
        return topology()

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    markers = _multi_host_markers()
    if explicit or markers:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids)
        except Exception as e:
            if isinstance(e, RuntimeError) and "backend" in str(e).lower():
                raise RuntimeError(
                    "initialize_multihost must run before any JAX call "
                    "that initializes the XLA backend (jax.devices, "
                    "jax.default_backend, jnp ops, ...). Move it to the "
                    "top of the program.") from e
            # Both triggers mean this IS a distributed job — explicit
            # config, or pod markers that only fire on genuine multi-host
            # slices (>1 TPU_WORKER_HOSTNAMES / megascale coordinator, see
            # _multi_host_markers). Silently degrading to independent
            # single-host runs would compute garbage, so fail loudly
            # either way.
            if explicit:
                raise
            raise RuntimeError(
                "jax.distributed.initialize failed on a multi-host slice "
                "(detected via TPU pod env markers). Each host proceeding "
                "independently would silently compute garbage. Fix the "
                "coordinator (or pass coordinator_address/num_processes/"
                "process_id explicitly); to force single-host execution, "
                "clear TPU_WORKER_HOSTNAMES/MEGASCALE_COORDINATOR_ADDRESS."
            ) from e
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
