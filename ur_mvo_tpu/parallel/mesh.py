"""Device-mesh helpers.

The reference has no distributed runtime at all (SURVEY §2.3); the scaling
axes of this framework are (a) batch (multi-sequence VO, matching pairs,
training) and (b) the map axis (points/observations of the BA problem).
Both ride a 1-D ``jax.sharding.Mesh``; multi-host extends the same mesh
via ``jax.distributed`` with XLA collectives over ICI/DCN — no custom
transport.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: one call per host before any mesh use
    (``jax.distributed.initialize``); afterwards ``jax.devices()`` spans
    the full slice and the same mesh/collective code runs over ICI+DCN."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an array sharded along its leading dimension."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
