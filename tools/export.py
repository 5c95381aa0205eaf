#!/usr/bin/env python
"""Serving export via ``jax.export`` (the reference ships ONNX/TensorRT
export under ``tools/deployment/pytorch2onnx.py``; the TPU-native serving
artifact is a serialized StableHLO program + params)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--out", default="model_export")
    p.add_argument("--shape", type=int, nargs=2, default=[800, 1344])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

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
    if args.checkpoint:
        from boosting_rcnn_tpu.engine.checkpoint import load_params

        params, bs = load_params(args.checkpoint)
        variables = {"params": params, "batch_stats": bs}
    anchors, nla = det.anchors_for(canvas)

    def serve(images, img_shape, scale_factor):
        return det.predict(
            variables,
            {"images": images, "img_shape": img_shape, "scale_factor": scale_factor},
            anchors,
            nla,
        )

    b = args.batch
    example = (
        jnp.zeros((b, *canvas, 3), jnp.float32),
        jnp.zeros((b, 2), jnp.float32),
        jnp.ones((b, 4), jnp.float32),
    )
    exported = jexport.export(jax.jit(serve))(*example)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(args.out, "params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)
    print(
        f"exported to {args.out}: StableHLO for input {example[0].shape}, "
        f"outputs {[str(o) for o in exported.out_avals]}"
    )


if __name__ == "__main__":
    main()
