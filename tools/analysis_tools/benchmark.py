#!/usr/bin/env python
"""Inference FPS benchmark (reference ``tools/analysis_tools/benchmark.py``:
warmup then timed loop, ``measure_inference_speed:59``)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config

    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
    mc = cfg.model.to_dict()
    canvas = (800, 1344)
    if args.tiny:
        from tools.train import shrink_model

        mc = shrink_model(mc)
        canvas = (256, 320)
        dtype = jnp.float32
    det = build_detector(mc, dtype=dtype)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    if args.checkpoint:
        from boosting_rcnn_tpu.engine.checkpoint import load_params

        params, bs = load_params(args.checkpoint)
        variables = {"params": params, "batch_stats": bs}
    anchors, nla = det.anchors_for(canvas)

    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.rand(args.batch, *canvas, 3), jnp.float32),
        "img_shape": jnp.asarray([[canvas[0], canvas[1]]] * args.batch, jnp.float32),
        "scale_factor": jnp.ones((args.batch, 4), jnp.float32),
    }
    run = jax.jit(lambda v, b: det.predict(v, b, anchors, nla))
    out = run(variables, batch)
    jax.block_until_ready(out)
    for _ in range(args.warmup - 1):
        out = run(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.batch * args.iters / dt
    print(f"Overall fps: {fps:.1f} img/s ({1000*dt/(args.iters*args.batch):.2f} ms/img)")


if __name__ == "__main__":
    main()
