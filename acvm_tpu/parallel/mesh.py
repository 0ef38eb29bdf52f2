"""Device-mesh utilities for scaling the batched solver.

The workload is instance-data-parallel (SURVEY.md section 2.10): independent
circuit instances shard over the ``data`` mesh axis; per-instance work needs no
cross-chip communication, so XLA compiles each solver segment into pure SPMD
with no collectives on the hot path.  (Intra-gadget reductions — EC
bucket/window sums, wide hash batches — will add a ``model`` axis with psum
reductions when their limb kernels land.)

Multi-host: build the mesh over all of ``jax.devices()`` after
``jax.distributed.initialize()``; batch inputs created with
``shard_batch`` land shard-local and scale across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch/instance) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(arrays, mesh: Mesh, axis_name: str = "data"):
    """device_put a pytree of batch-major arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), arrays
    )


def rows_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for the fused engine's witness-major panel (NW, L, S, 128):
    the instance axis is S (batch B = S * 128), so shard dimension 2."""
    return NamedSharding(mesh, P(None, None, axis_name, None))


def shard_state(state, mesh: Mesh, axis_name: str = "data"):
    """device_put a solver state pytree: 4-D witness-major panels shard on
    their S axis (dim 2), everything else (ok/fail/mem/legacy 3-D panels) on
    the leading batch axis."""
    rows = rows_sharding(mesh, axis_name)
    batch = batch_sharding(mesh, axis_name)

    def put(a):
        target = rows if getattr(a, "ndim", 0) == 4 else batch
        return jax.device_put(a, target)

    return jax.tree_util.tree_map(put, state)
