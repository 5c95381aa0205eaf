"""Op-level jax.profiler trace of the flagship INFERENCE path on the TPU.

Twin of ``tpu_trace_train.py`` for the predict program ``bench.py`` measures
(bs8, 800x1344).  The forward was untouched in round 3 while the train path
got trace-guided fixes; this finds whether the same serial-gather /
while-chain patterns dominate the 41 ms inference step.

Usage: python scripts/tpu_trace_infer.py [trace_dir]
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
import jax.numpy as jnp
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_infer"


def main():
    from __graft_entry__ import _build
    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    batch, canvas = int(os.environ.get("BENCH_BATCH", "8")), (800, 1344)
    det = _build(tiny=False)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    rs = np.random.RandomState(0)
    images = chunked_device_put(rs.rand(batch, *canvas, 3).astype(np.float32))
    img_shape = jnp.asarray([[canvas[0], canvas[1] - 11]] * batch, jnp.float32)
    scale_factor = jnp.ones((batch, 4), jnp.float32)

    @jax.jit
    def run(v, im, shp, sf):
        return det.predict(
            v, {"images": im, "img_shape": shp, "scale_factor": sf},
            anchors, nla)

    out = run(variables, images, img_shape, scale_factor)
    jax.block_until_ready(out)
    for _ in range(3):
        out = run(variables, images, img_shape, scale_factor)
    jax.block_until_ready(out)

    n_traced = 4
    with jax.profiler.trace(OUT):
        for _ in range(n_traced):
            out = run(variables, images, img_shape, scale_factor)
        jax.block_until_ready(out)

    traces = sorted(glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print(json.dumps({"error": "no trace.json.gz produced",
                          "files": os.listdir(OUT)}))
        return
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    meta_by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if not any(k in pname.lower() for k in ("tpu", "device", "xla")):
            continue
        d = float(e.get("dur", 0.0))
        dur_by_name[e.get("name", "?")] += d
        args = e.get("args") or {}
        if "long_name" in args or "op_name" in args:
            meta_by_name.setdefault(
                e.get("name", "?"),
                (args.get("op_name") or args.get("long_name", ""))[:160])
        total += d
    top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps({
        "trace_file": traces[-1],
        "device_lanes": sorted(set(pid_name.values())),
        "n_steps_traced": n_traced,
        "total_device_us": round(total, 1),
        "per_step_ms": round(total / 1e3 / max(n_traced, 1), 2),
        "top_ops_us": [[k, round(v, 1), meta_by_name.get(k, "")]
                       for k, v in top],
    }, indent=1))


if __name__ == "__main__":
    main()
