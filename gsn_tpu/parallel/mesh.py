"""Device mesh utilities.

The reference has no distributed execution at all (SURVEY §2.3); this
layer is where the TPU framework goes beyond it: a 1-D ``dp`` mesh shards
whole graphs of a batch across chips, and the ``ep`` (edge-partition)
axis of ``gsn_tpu.parallel.edge_partition`` splits a single giant
batch's edge list across chips with halo exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",)) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices[:n]).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (device-batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))
