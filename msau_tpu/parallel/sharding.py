"""Device mesh + sharding helpers.

The reference is single-device (cuda:0 hard-coded,
model/training/trainer.py:9); scaling here is TPU-native SPMD
(SURVEY.md §2.10): a ``jax.sharding.Mesh`` with a ``data`` axis for batch
parallelism (XLA/GSPMD inserts the gradient psum) and an optional ``spatial``
axis for sharding the chargrid H dimension (the context-parallel analog for
dense 2-D workloads — halo exchange lives in msau_tpu/parallel/spatial.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over available devices; -1 infers the remaining dim."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    assert total <= n, f"mesh {shape} needs {total} devices, have {n}"
    dev_array = np.array(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the batch axis, replicate the rest."""
    spec = [None] * ndim
    spec[0] = batch_axis
    return NamedSharding(mesh, P(*spec))


def spatial_sharding(
    mesh: Mesh, ndim: int, batch_axis: str = "data", spatial_axis: str = "spatial",
    h_dim: int = 1,
) -> NamedSharding:
    """Shard batch over 'data' and the H dimension over 'spatial'."""
    spec: list = [None] * ndim
    spec[0] = batch_axis
    spec[h_dim] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, batch_axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with dim-0 sharded over the mesh."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis))

    return jax.tree_util.tree_map(put, batch)


# ---------------------------------------------------------------------------
# multi-host (SURVEY.md §5.8: jax.distributed + per-host input feed)
# ---------------------------------------------------------------------------
def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env/coordinates are given.

    Returns True if a multi-process runtime was initialized.  Single-host
    runs (this repo's test/bench environment) no-op and return False.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_batch_to_global(batch: Any, mesh: Mesh, batch_axis: str = "data") -> Any:
    """Assemble per-host shards into global arrays
    (jax.make_array_from_process_local_data): each host feeds its local slice
    of the global batch; dim 0 is sharded over ``batch_axis``."""

    def put(x):
        sharding = batch_sharding(mesh, np.asarray(x).ndim, batch_axis)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
