"""Multi-host (DCN) runtime: the same ('data', 'spatial') mesh across hosts.

The reference is strictly single-process single-GPU (SURVEY §2.4 — no
torch.distributed anywhere); multi-host scaling is a new, first-class
subsystem here. The JAX recipe:

1. every process calls :func:`initialize` (a thin, env-aware wrapper over
   ``jax.distributed.initialize``) BEFORE any backend touch;
2. every process constructs ONE global mesh over ``jax.devices()`` — the
   union of all processes' chips (``parallel.mesh.make_mesh`` unchanged);
3. the mesh layout puts DCN on the *data* axis: ``jax.devices()`` orders
   devices process-major and ``make_mesh`` reshapes data-major, so the
   'data' (batch) axis spans hosts — the per-step gradient all-reduce is
   the only collective that crosses DCN — while 'spatial' (conv halo
   exchanges, latency-sensitive) stays inside a host on ICI whenever
   ``spatial`` divides the per-host device count.

Host-side coordination that jit does not cover lives here too:

* :func:`stage_replicated` / :func:`stage_batch` — per-process data
  staging. Under multi-process JAX, committed global arrays must be built
  explicitly: replicated inputs (pyramid images, start images — every
  host holds the full value) via ``device_put`` with a global sharding;
  batch-sharded inputs from *process-local* shards via
  ``jax.make_array_from_process_local_data``.
* :func:`is_primary` — exactly one process writes host-side artifacts
  (loss curves, PNG dumps, json); orbax array writes are themselves
  collective (each process commits its addressable shards) and must be
  called by ALL processes.

Verified by ``tests/test_distributed.py``: 2 localhost processes x 4
virtual CPU devices each run the full trainer + sampler on a global
(data=4, spatial=2) mesh and must match the single-process 8-device mesh
run to numerical tolerance, through an orbax save/restore round-trip.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

__all__ = [
    "initialize",
    "is_initialized",
    "is_primary",
    "process_index",
    "process_count",
    "stage_replicated",
    "stage_batch",
    "local_batch_slice",
]

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-process runtime; returns True if distributed.

    Arguments fall back to the ``SINDDM_COORDINATOR`` /
    ``SINDDM_NUM_PROCESSES`` / ``SINDDM_PROCESS_ID`` environment (so a
    launcher can export once and run the unmodified CLI), then to JAX's
    own cluster auto-detection (TPU pods, SLURM, ...). A no-op returning
    False when neither flags nor env request multi-process — the
    single-process path stays untouched.

    Must run before the first backend touch (``jax.devices()`` etc.);
    ``jax.distributed.initialize`` raises otherwise.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "SINDDM_COORDINATOR"
    )
    if num_processes is None and os.environ.get("SINDDM_NUM_PROCESSES"):
        num_processes = int(os.environ["SINDDM_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SINDDM_PROCESS_ID"):
        process_id = int(os.environ["SINDDM_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def is_initialized() -> bool:
    return _INITIALIZED


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the one process that writes host-side artifacts."""
    return jax.process_index() == 0


def stage_replicated(x, mesh):
    """Commit a host value (same on every process) as a global replicated
    array over ``mesh``. Works single- and multi-process."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(mesh, P()))


def local_batch_slice(global_batch: int, sharding) -> slice:
    """The rows of a [B, ...] global batch this process must stage.

    With the batch sharded over the 'data' axis, each process owns the
    contiguous row block that ``make_array_from_process_local_data``
    expects (device order is process-major, see module docstring).
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n_proc} processes"
        )
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def fetch(x):
    """Host numpy value of a (possibly sharded) global array, every process.

    Replicated / single-process arrays are host-local already; a
    batch-sharded global array under multi-host is all-gathered first
    (``multihost_utils.process_allgather``) so PNG/metric writers see the
    full batch on the primary.
    """
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def stage_batch(local_rows, sharding):
    """Commit per-process batch rows as ONE global batch-sharded array.

    ``local_rows``: this process's ``local_batch_slice`` of the global
    [B, ...] batch (host numpy). Single-process this is just device_put.
    """
    import numpy as np

    local_rows = np.asarray(local_rows)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    global_shape = (
        local_rows.shape[0] * jax.process_count(),
    ) + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, local_rows, global_shape
    )
