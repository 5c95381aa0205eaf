#!/usr/bin/env python
"""Run an exported StableHLO model (reference ``tools/deployment/test.py``
ran exported ONNX/TensorRT models through the dataset)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("export_dir")
    p.add_argument("--image", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(os.path.join(args.export_dir, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    in_avals = exported.in_avals
    print("exported signature:", [str(a) for a in in_avals])

    if args.image:
        import cv2

        from boosting_rcnn_tpu.data.pipeline import preprocess

        img = cv2.imread(args.image)
        h, w = in_avals[0].shape[1:3]
        s = preprocess(img, np.zeros((0, 4), np.float32),
                       np.zeros((0,), np.int64), canvas=(h, w))
        images = s["images"][None]
        shp = s["img_shape"][None]
        sf = s["scale_factor"][None]
    else:
        images = np.zeros(in_avals[0].shape, np.float32)
        shp = np.asarray([[in_avals[0].shape[1], in_avals[0].shape[2]]], np.float32)
        sf = np.ones((in_avals[0].shape[0], 4), np.float32)
    out = exported.call(jnp.asarray(images), jnp.asarray(shp), jnp.asarray(sf))
    dets, labels, valid = map(np.asarray, out)
    print(f"detections: {int(valid.sum())} valid "
          f"(top score {dets[..., 4].max():.3f})")


if __name__ == "__main__":
    main()
