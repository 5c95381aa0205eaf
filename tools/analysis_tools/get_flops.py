#!/usr/bin/env python
"""FLOPs/params counter via XLA cost analysis (reference
``tools/analysis_tools/get_flops.py`` used mmcv's hook-based counter; on TPU
the compiled HLO itself reports exact FLOPs)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[800, 1344])
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config

    cfg = load_config(args.config)
    mc = cfg.model.to_dict()
    canvas = tuple(args.shape)
    if args.tiny:
        from tools.train import shrink_model

        mc = shrink_model(mc)
        canvas = (128, 160)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    batch = {
        "images": jnp.zeros((1, *canvas, 3), jnp.float32),
        "img_shape": jnp.asarray([[canvas[0], canvas[1]]], jnp.float32),
        "scale_factor": jnp.ones((1, 4), jnp.float32),
    }
    lowered = jax.jit(lambda v, b: det.predict(v, b, anchors, nla)).lower(
        variables, batch
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan")) if ca else float("nan")
    print(f"Input shape: (1, {canvas[0]}, {canvas[1]}, 3)")
    print(f"Params: {n_params/1e6:.2f} M")
    print(f"FLOPs (XLA cost analysis): {flops/1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
