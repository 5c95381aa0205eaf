"""Host->device transfer helpers.

The remote-TPU relay aborts on single host->device transfers larger than
~128 MiB (root-caused from the round-1 "bs16 UNAVAILABLE" fault: bs10
inference at 800x1344 f32 images = 129 MB worked, bs12 = 155 MB aborted;
staging the same bs12 batch in 64 MB chunks + on-device concat succeeds).
``chunked_device_put`` splits oversized arrays along axis 0 transparently.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

MAX_TRANSFER_BYTES = 1 << 26  # 64 MiB: comfortably under the relay cap


def chunked_device_put(x, sharding=None, max_bytes: int = MAX_TRANSFER_BYTES):
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
        else jax.device_put
    if nbytes <= max_bytes or x.ndim == 0 or x.shape[0] <= 1:
        return put(x)
    n = x.shape[0]
    per = max(1, int(n * max_bytes // nbytes))
    if sharding is not None:
        # keep each chunk divisible by the sharded batch axis so the
        # on-device concat of identically-sharded parts preserves layout
        try:
            ndev = len(sharding.device_set)
        except Exception:
            ndev = 1
        if n % ndev == 0 and ndev > 1:
            per = max(ndev, (per // ndev) * ndev)
            if per >= n:
                return put(x)
    chunks = [put(x[i : i + per]) for i in range(0, n, per)]
    return jnp.concatenate(chunks, axis=0)


def batch_to_device(batch: Dict[str, Any], sharding=None) -> Dict[str, Any]:
    return {k: chunked_device_put(v, sharding) for k, v in batch.items()}
