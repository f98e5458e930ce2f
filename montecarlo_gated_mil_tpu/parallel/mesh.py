"""Device mesh construction and sharding helpers.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed,
no NCCL, one ``torch.device``).  The TPU-native scaling design (SURVEY.md §5,
BASELINE.json): **data parallelism over bags** via ``jax.sharding`` — the
model is ~11M parameters, so parameters replicate and per-bag work shards
across chips on the ``data`` axis; XLA inserts the gradient ``psum`` over
ICI.  An optional ``inst`` axis is reserved for sharding instances of
oversized bags (the MIL analogue of sequence parallelism).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, inst: int = 1, devices: list | None = None
) -> Mesh:
    """Mesh with axes ``(data, inst)``. ``data=-1`` -> all remaining devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if inst <= 0:
        raise ValueError(f"inst axis must be positive, got {inst}")
    if n % inst:
        raise ValueError(f"{n} devices not divisible by inst={inst}")
    if data == -1:
        data = n // inst
    if data * inst != n:
        raise ValueError(f"data*inst = {data * inst} != {n} devices")
    return Mesh(devs.reshape(data, inst), axis_names=("data", "inst"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Leading axis sharded over ``data``, rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (rank - 1))))


def shard_batch(mesh: Mesh, tree):
    """Place a stacked-bag pytree with its leading axis over ``data``."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        ),
        tree,
    )
