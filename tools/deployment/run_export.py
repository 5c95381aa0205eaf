#!/usr/bin/env python
"""Run an exported StableHLO model: single image, or a whole dataset with
COCO-style eval (reference ``tools/deployment/test.py`` evaluates exported
ONNX/TensorRT models through the dataset and reports the usual metrics).

Modes:
  run_export.py <export_dir>                       # zeros smoke call
  run_export.py <export_dir> --image img.jpg       # one image
  run_export.py <export_dir> --data cfg.py [--eval bbox]
      # iterate data.test of the config through the exported artifact and
      # print the dataset metrics as one JSON line
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def load_exported(export_dir):
    from jax import export as jexport

    with open(os.path.join(export_dir, "model.stablehlo"), "rb") as f:
        return jexport.deserialize(f.read())


def eval_dataset(exported, config_path, metric="bbox", cfg_options=None,
                 logger=None):
    """Reference ``tools/deployment/test.py:56-116``: dataset -> exported
    forward -> dataset.evaluate.  Returns the metrics dict."""
    import jax.numpy as jnp

    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.builder import build_dataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    cfg = load_config(config_path)
    if cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in cfg_options))
    data_cfg = cfg.data.to_dict()
    pipeline = data_cfg["test"].get("pipeline", {})

    b, h, w = exported.in_avals[0].shape[:3]
    ds = build_dataset(data_cfg["test"], test_mode=True)
    loader = DetDataLoader(
        ds, batch_size=b, canvas=(h, w), train=False,
        img_norm=pipeline.get("img_norm"),
    )
    results = []
    for batch in loader.epoch_iter(0):
        batch.pop("ori_shape", None)
        out = exported.call(
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["img_shape"]),
            jnp.asarray(batch["scale_factor"]),
        )
        dets, labels, valid = map(np.asarray, out[:3])
        for i in range(dets.shape[0]):
            m = valid[i]
            results.append((dets[i][m], labels[i][m]))
        if logger:
            logger.info(f"exported eval: {len(results)} imgs")
    return ds.evaluate(results, metric=metric)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("export_dir")
    p.add_argument("--image", default=None)
    p.add_argument("--data", default=None,
                   help="config whose data.test to evaluate through the "
                        "exported artifact")
    p.add_argument("--eval", default="bbox")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    exported = load_exported(args.export_dir)
    in_avals = exported.in_avals
    print("exported signature:", [str(a) for a in in_avals])

    if args.data:
        metrics = eval_dataset(
            exported, args.data, metric=args.eval,
            cfg_options=args.cfg_options,
        )
        def _jsonable(v):
            try:
                return round(float(v), 4)
            except (TypeError, ValueError):
                return str(v)

        print(json.dumps({k: _jsonable(v) for k, v in metrics.items()}))
        return

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
