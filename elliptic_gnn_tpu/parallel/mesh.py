"""Device-mesh utilities for multi-chip training.

The reference is single-process/single-device (SURVEY.md §2.3: no
torch.distributed anywhere); the TPU framework scales full-batch GNN
training over a pod slice by sharding graph rows (destination nodes) across
a 1-D `nodes` mesh axis. Dense-layer parameters stay replicated — at
hidden<=128 tensor parallelism would be all overhead (SURVEY.md §2.3 table).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NODE_AXIS = "nodes"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} available"
                )
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (NODE_AXIS,))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (leading dim) split across the node axis."""
    return NamedSharding(mesh, P(NODE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
