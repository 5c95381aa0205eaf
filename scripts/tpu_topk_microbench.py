"""Microbench: exact lax.top_k vs lax.approx_max_k on the RPN proposal
geometry ([8, 151200] fused scores -> top 2000 per image).

Round-4 trace: the level-0 top-k lowers to a full [8,151200] kv-sort at
1.6 ms/step.  This measures whether the TPU PartialReduce path
(approx_max_k) is worth a documented deviation from the reference's
exact topk.  K-delta timing (scan of K iterations minus scan of 1) to
cancel relay dispatch overhead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def kdelta(fn, x, k_iters=64):
    def scan_n(n):
        def body(c, _):
            s, i = fn(c)
            # fold outputs back so iterations can't be elided
            c = c + jnp.float32(1e-6) * jnp.sum(s) / s.size
            return c, None
        return jax.jit(
            lambda x0: jax.lax.scan(body, x0, None, length=n)[0])

    f1, fk = scan_n(1), scan_n(k_iters)
    for f in (f1, fk):
        f(x).block_until_ready()
    t1 = time.perf_counter()
    f1(x).block_until_ready()
    t2 = time.perf_counter()
    fk(x).block_until_ready()
    t3 = time.perf_counter()
    return ((t3 - t2) - (t2 - t1)) / (k_iters - 1) * 1e3


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(8, 151200), jnp.float32)
    k = 2000

    exact = lambda c: jax.lax.top_k(c, k)
    ms_exact = kdelta(exact, x)
    print(f"exact lax.top_k      : {ms_exact:7.3f} ms")

    for rt in (0.90, 0.95, 0.99):
        apx = lambda c, rt=rt: jax.lax.approx_max_k(
            c, k, recall_target=rt, aggregate_to_topk=True)
        ms = kdelta(apx, x)
        print(f"approx_max_k r={rt:.2f} : {ms:7.3f} ms")

    # recall sanity on one draw
    s_e, i_e = jax.lax.top_k(x, k)
    s_a, i_a = jax.lax.approx_max_k(x, k, recall_target=0.95,
                                    aggregate_to_topk=True)
    hit = np.mean([
        len(set(np.asarray(i_e[b]).tolist())
            & set(np.asarray(i_a[b]).tolist())) / k
        for b in range(8)
    ])
    print(f"measured recall @0.95 target: {hit:.4f}")


if __name__ == "__main__":
    main()

# Result note (2026-08-19): isolated micro-timings through the axon relay
# are unreliable (both scan-1 and scan-65 report ~0.07 ms total — the
# documented tiny-program artifact, docs/TRAIN_PERF.md round-2 notes).
# The authoritative number is the in-step trace: sort [8,151200] = 1.6
# ms/step.  Measured approx_max_k recall at target 0.95: 0.9937.
