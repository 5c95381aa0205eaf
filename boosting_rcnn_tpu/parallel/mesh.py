"""Device mesh + sharding utilities (the parallelism layer).

The reference is data-parallel only (SURVEY.md §2.4: ``MMDistributedData
Parallel`` + NCCL).  TPU-native equivalent: a 1-D ``data`` mesh; the batch
axis of every input is sharded over it, parameters are replicated, and XLA
inserts the gradient/normaliser all-reduces over ICI (multi-host: DCN)
automatically.  ``jax.distributed.initialize`` covers the reference's
``init_dist`` launcher surface (``tools/train.py:117-124``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for multi-step batches with a leading (steps, batch, ...)
    layout (engine.train.make_multi_step_train): the scan/steps axis is
    unsharded, the batch axis is data-parallel."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host-global numpy batch onto the mesh, batch axis sharded.

    Uses chunked transfers: the remote-TPU relay aborts on single
    host->device copies over ~128 MiB (see ``utils/transfer.py``)."""
    from ..utils.transfer import chunked_device_put

    sh = batch_sharding(mesh)
    return {k: chunked_device_put(v, sharding=sh) for k, v in batch.items()}


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def init_distributed():
    """Multi-host init (no-op on a single host)."""
    import os

    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
