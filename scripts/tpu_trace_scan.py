"""Trace the multi-step (lax.scan) train dispatch and attribute hot HLO ops.

Round-3 follow-up: ``tpu_trace_train.py`` put the single-step device time
at 127.98 ms/step, yet the scan-4 dispatch benched *slower* (57.5 img/s =
139 ms/step).  This script answers two questions with device data:

1. What is the scan program's actual per-step device time (trace one
   scan-S dispatch)?  If > single-step, the while-loop carry costs real
   HBM traffic (copies), not relay artifacts.
2. What are ``fusion.34`` / ``while.66`` / ``closed_call.19`` in the
   single-step program?  Dumps post-optimization HLO via
   ``compiled.as_text()`` and prints the ``metadata op_name`` of the top
   ops from the trace, mapping XLA names back to JAX source ops.

Usage: python scripts/tpu_trace_scan.py [out_dir]
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_scan"
SCAN_S = int(os.environ.get("SCAN_S", "4"))


def device_top(trace_dir, n=25):
    traces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        return None, []
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if not any(k in pid_name.get(e.get("pid"), "").lower()
                   for k in ("tpu", "device", "xla")):
            continue
        d = float(e.get("dur", 0.0))
        dur[e.get("name", "?")] += d
        total += d
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:n]
    return total, top


def hlo_attribution(hlo_text, op_names):
    """op name -> metadata op_name/source line from post-opt HLO."""
    out = {}
    for op in op_names:
        # match the def line: `  %fusion.34 = ... metadata={op_name="..."}`
        m = re.search(
            r"%?" + re.escape(op) + r"\s*=\s*[^\n]*", hlo_text)
        if not m:
            out[op] = None
            continue
        line = m.group(0)
        meta = re.search(r'op_name="([^"]+)"', line)
        kind = re.search(r"=\s*\S+\s+(\w+)\(", line)
        out[op] = {
            "op_name": meta.group(1) if meta else None,
            "kind": kind.group(1) if kind else None,
            "line_head": line[:180],
        }
    return out


def main():
    from __graft_entry__ import _build
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_multi_step_train,
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
    rng = jax.random.PRNGKey(0)
    report = {}

    # --- single-step program: HLO dump + attribution of known hot ops ---
    tb_dev = {k: chunked_device_put(np.asarray(v)) for k, v in tb.items()}
    tstep = jax.jit(make_train_step(det, anchors, nla))
    lowered = tstep.lower(state, tb_dev, rng)
    compiled = lowered.compile()
    try:
        hlo = compiled.as_text()
        with open("/tmp/hlo_train_single.txt", "w") as f:
            f.write(hlo)
        hot = ["while.66", "while.57", "while.56", "fusion.34",
               "fusion.1816", "and_reduce_fusion.10", "closed_call.19",
               "closed_call.18", "subtract_maximum_fusion.10",
               "fusion.2802", "sort", "copy.2435", "copy.2537"]
        report["single_step_hot_op_attribution"] = hlo_attribution(hlo, hot)
        report["hlo_file"] = "/tmp/hlo_train_single.txt"
    except Exception as e:  # relay may not ship post-opt HLO
        report["hlo_error"] = str(e)[:300]

    # --- scan-S program: trace one dispatch ---
    tb_scan = {
        k: chunked_device_put(np.stack([np.asarray(v)] * SCAN_S))
        for k, v in tb.items()
    }
    mstep = jax.jit(make_multi_step_train(det, anchors, nla),
                    donate_argnums=(0,))
    s, m = mstep(state, tb_scan, rng)
    jax.block_until_ready((s, m))
    s, m = mstep(s, tb_scan, rng)
    jax.block_until_ready((s, m))
    with jax.profiler.trace(OUT):
        s, m = mstep(s, tb_scan, rng)
        jax.block_until_ready((s, m))
    total, top = device_top(OUT)
    report["scan_steps"] = SCAN_S
    report["scan_total_device_us"] = round(total or 0.0, 1)
    report["scan_per_step_ms"] = round((total or 0.0) / 1e3 / SCAN_S, 2)
    report["scan_top_ops_us"] = [[k, round(v, 1)] for k, v in top]
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
