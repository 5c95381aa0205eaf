"""Op-level jax.profiler trace of the full flagship train step on the TPU.

Round-3 follow-up to ``tpu_profiler_attempt.py`` (which proved device-side
traces DO survive the axon relay, overturning the round-2 assumption).
Captures N chained train steps under ``jax.profiler.trace`` and prints the
top device ops by total self-duration parsed from the chrome-trace dump —
the op-level breakdown the K-delta segment harness could not give
(docs/TRAIN_PERF.md).

Usage: python scripts/tpu_trace_train.py [trace_dir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train"


def main():
    from __graft_entry__ import _build
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        step_lr_schedule,
    )
    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    batch, canvas = 8, (800, 1344)
    det = _build(tiny=False)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    tx = make_optimizer(
        step_lr_schedule(0.005, 1000), grad_clip_norm=35.0,
        params=variables["params"], frozen_stages=1,
    )
    state = create_train_state(variables, tx)
    loader = FakeDetLoader(
        batch_size=batch, canvas=canvas, num_classes=4, num_batches=1)
    tb = next(loader.epoch_iter(0))
    tb.pop("ori_shape")
    tb = {k: chunked_device_put(v) for k, v in tb.items()}
    tstep = jax.jit(make_train_step(det, anchors, nla))
    rng = jax.random.PRNGKey(0)
    s, m = tstep(state, tb, rng)
    jax.block_until_ready((s, m))
    for _ in range(2):  # settle
        s, m = tstep(s, tb, rng)
    jax.block_until_ready((s, m))

    n_traced = 3
    with jax.profiler.trace(OUT):
        for _ in range(n_traced):
            s, m = tstep(s, tb, rng)
        jax.block_until_ready((s, m))

    # aggregate device-lane complete events from the chrome trace
    traces = sorted(glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print(json.dumps({"error": "no trace.json.gz produced",
                          "files": os.listdir(OUT)}))
        return
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device lanes: pid whose process_name metadata mentions TPU/device
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if not any(k in pname.lower() for k in ("tpu", "device", "xla")):
            continue
        d = float(e.get("dur", 0.0))
        dur_by_name[e.get("name", "?")] += d
        total += d
    top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps({
        "trace_file": traces[-1],
        "device_lanes": sorted(set(pid_name.values())),
        "n_steps_traced": n_traced,
        "total_device_us": round(total, 1),
        "per_step_ms": round(total / 1e3 / max(n_traced, 1), 2),
        "top_ops_us": [[k, round(v, 1)] for k, v in top],
    }, indent=1))


if __name__ == "__main__":
    main()
