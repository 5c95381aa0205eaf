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


def _first_hostname(nodelist: str) -> str:
    """First host of a Slurm hostlist expression.

    Handles the forms srun actually emits: ``host``, ``a,b``, and the
    bracket form ``prefix[001-003,007]`` (zero-padded width preserved).
    Only the FIRST host is needed (it becomes the coordinator), so full
    hostlist expansion is not implemented.
    """
    head = nodelist.split(",")[0] if "[" not in nodelist.split(",")[0] \
        else nodelist
    if "[" in head:
        prefix, rest = head.split("[", 1)
        first = rest.split("]", 1)[0].split(",")[0].split("-")[0]
        return prefix + first
    return head


def cluster_spec_from_env(env=None):
    """``(coordinator_address, num_processes, process_id)`` from the env.

    Covers the reference's launcher surface (``init_dist`` pytorch/slurm
    branches, mmcv ``dist_utils``): explicit ``COORDINATOR_ADDRESS`` /
    ``NUM_PROCESSES`` / ``PROCESS_ID`` win; otherwise ``SLURM_*`` task
    variables (the env ``tools/slurm_train.sh``'s srun gives every task)
    are parsed — ``SLURM_PROCID`` → process_id, ``SLURM_NTASKS`` →
    num_processes, first host of ``SLURM_STEP_NODELIST`` (fallback
    ``SLURM_JOB_NODELIST``) plus a deterministic port derived from
    ``SLURM_JOB_ID`` (override: ``COORDINATOR_PORT``) → coordinator.
    Returns ``None`` on a single host (neither form present, or ntasks=1
    without an explicit coordinator).
    """
    import os

    env = os.environ if env is None else env
    if env.get("COORDINATOR_ADDRESS"):
        return (
            env["COORDINATOR_ADDRESS"],
            int(env["NUM_PROCESSES"]) if env.get("NUM_PROCESSES") else None,
            int(env["PROCESS_ID"]) if env.get("PROCESS_ID") else None,
        )
    nodelist = env.get("SLURM_STEP_NODELIST") or env.get("SLURM_JOB_NODELIST")
    if not nodelist or not env.get("SLURM_NTASKS"):
        return None
    ntasks = int(env["SLURM_NTASKS"])
    if ntasks <= 1:
        return None
    port = int(env.get("COORDINATOR_PORT",
                       8476 + int(env.get("SLURM_JOB_ID", 0)) % 1024))
    return (
        f"{_first_hostname(nodelist)}:{port}",
        ntasks,
        int(env.get("SLURM_PROCID", 0)),
    )


def init_distributed():
    """Multi-host init (no-op on a single host)."""
    spec = cluster_spec_from_env()
    if spec is None:
        return
    addr, nproc, pid = spec
    kw = {"coordinator_address": addr}
    if nproc is not None:
        kw.update(num_processes=nproc, process_id=pid or 0)
    jax.distributed.initialize(**kw)
