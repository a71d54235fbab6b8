"""Device mesh and sharding layout.

The reference is strictly single-process single-GPU (SURVEY §2.4: no
torch.distributed anywhere); scaling is a new, first-class subsystem here.
The design is the standard JAX recipe: one ``jax.sharding.Mesh`` with axes

  * ``data``    — batch-parallelism for training and sampling. Gradients
    are reduced by XLA-inserted all-reduces over ICI when the loss is
    jitted with batch-sharded inputs and replicated params.
  * ``spatial`` — optional sharding of the image H axis for very large
    ``--scale_mul`` canvases. The denoiser is fully convolutional with a
    35-px receptive field; GSPMD partitions the convolutions spatially and
    inserts the halo exchanges automatically (the image analog of
    sequence/context parallelism).

Multi-host: the same mesh spans DCN by constructing it over
``jax.devices()`` of all processes, after joining the multi-process
runtime via :mod:`sinddm_tpu.parallel.distributed` (initialize, data
staging, primary-only host IO) — verified by the 2-process localhost
equality test in ``tests/test_distributed.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    grid = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for [B, H, W, C] image batches: B over data, H over spatial."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    return NamedSharding(mesh, P(DATA_AXIS, None, None, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    return jax.device_put(params, replicated_sharding(mesh))


def require_named_sharding(sharding) -> Optional[NamedSharding]:
    """Validate an app-level ``sharding`` argument (NamedSharding or None).

    The app layer replicates params over ``sharding.mesh``; any other
    Sharding subtype (SingleDeviceSharding, PositionalSharding, ...) would
    silently skip replication and later fail deep inside jit with a
    mixed-device error — reject it up front instead.
    """
    if sharding is None:
        return None
    if not isinstance(sharding, NamedSharding):
        raise TypeError(
            "sharding must be a jax.sharding.NamedSharding over a "
            f"('{DATA_AXIS}', '{SPATIAL_AXIS}') mesh (see batch_sharding); "
            f"got {type(sharding).__name__}"
        )
    return sharding
