"""Spatial (H-axis) sharding with explicit halo exchange.

The chargrid resolution is this workload's "sequence length"
(SURVEY.md §5.7); scaling 1024²+ grids across chips shards H over a
``spatial`` mesh axis.  Two mechanisms are provided:

1. **GSPMD (default)** — annotate inputs with
   ``PartitionSpec('data', 'spatial', None, None)`` and jit; XLA partitions
   the convolutions and inserts halo exchanges itself.  This is what the
   Trainer and ``__graft_entry__.dryrun_multichip`` use.
2. **Explicit shard_map (this module)** — ``halo_exchange`` trades boundary
   rows between H-neighbors with ``ppermute`` (ICI neighbor traffic only)
   and ``sharded_conv2d`` runs a VALID conv over the halo-extended block.
   Useful when hand-scheduling beats the partitioner (e.g. fusing the
   exchange with Pallas kernels) and as an executable spec of what GSPMD
   does.

Both paths are numerically identical to the unsharded op (tests pin this
on the virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a [N, Hs, W, C] block with ``halo`` rows from H-neighbors.

    Edge shards zero-pad on the outer side (TF-SAME boundary semantics).
    Communication: two ppermute shifts over the ICI ring.
    """
    if halo == 0:
        return x
    idx = lax.axis_index(axis_name)
    n_shards = lax.axis_size(axis_name)

    # bottom rows of the previous shard -> our top halo
    send_down = [(i, i + 1) for i in range(n_shards - 1)]
    top = lax.ppermute(x[:, -halo:], axis_name, send_down)
    # top rows of the next shard -> our bottom halo
    send_up = [(i + 1, i) for i in range(n_shards - 1)]
    bottom = lax.ppermute(x[:, :halo], axis_name, send_up)

    zeros = jnp.zeros_like(x[:, :halo])
    top = jnp.where(idx == 0, zeros, top)
    bottom = jnp.where(idx == n_shards - 1, zeros, bottom)
    return jnp.concatenate([top, x, bottom], axis=1)


def sharded_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,       # [kh, kw, cin, cout]
    mesh: Mesh,
    *,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
) -> jnp.ndarray:
    """SAME conv with H sharded over ``spatial_axis`` via manual halos.

    Requires odd kh (symmetric halo) and H divisible by the axis size.
    """
    kh, kw = kernel.shape[:2]
    assert kh % 2 == 1, "sharded_conv2d assumes odd kernel height"
    halo = kh // 2

    def local(xb, kb):
        xb = halo_exchange(xb, halo, spatial_axis)
        return lax.conv_general_dilated(
            xb,
            kb,
            (1, 1),
            padding=((0, 0), (kw // 2, (kw - 1) // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, spatial_axis, None, None), P()),
        out_specs=P(batch_axis, spatial_axis, None, None),
    )(x, kernel)


def spatial_shardings(mesh: Mesh, batch_axis: str = "data", spatial_axis: str = "spatial"):
    """(input, label) NamedShardings for GSPMD spatial training."""
    return (
        NamedSharding(mesh, P(batch_axis, spatial_axis, None, None)),
        NamedSharding(mesh, P(batch_axis, spatial_axis, None)),
    )
