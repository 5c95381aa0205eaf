#!/usr/bin/env python
"""Corruption robustness benchmark (reference ``tools/analysis_tools/
test_robustness.py`` + ``robustness_eval.py``): evaluate a checkpoint under
image corruptions at several severities and report mPC (mean performance
under corruption)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--corruptions", nargs="*", default=None)
    p.add_argument("--severities", type=int, nargs="*", default=[1, 3, 5])
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--out", default=None, help="dump the results table (json)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.builder import build_dataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader
    from boosting_rcnn_tpu.data.transforms import CORRUPTIONS, corrupt
    from boosting_rcnn_tpu.engine.eval import run_eval
    from boosting_rcnn_tpu.utils.logging import get_root_logger

    logger = get_root_logger()
    cfg = load_config(args.config)
    mc = cfg.model.to_dict()
    canvas = (800, 1344)
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

    data_cfg = cfg.data.to_dict()
    ds = build_dataset(data_cfg["test"], test_mode=True)

    corruptions = args.corruptions or list(CORRUPTIONS)
    results_table = {}
    for corr in ["clean"] + corruptions:
        per_sev = []
        for sev in [0] if corr == "clean" else args.severities:

            class CorruptLoader(DetDataLoader):
                def _load(self, i, rng):
                    info = self.ds.data_infos[i]
                    from boosting_rcnn_tpu.data.pipeline import load_image, preprocess

                    img = load_image(self.ds.img_path(i))
                    if corr != "clean":
                        img = corrupt(img, corr, sev, rng)
                    return preprocess(
                        img, info["bboxes"], info["labels"],
                        canvas=self.canvas, scale=self.scale,
                        max_gt=self.max_gt,
                    )

            loader = CorruptLoader(
                ds, batch_size=data_cfg.get("samples_per_gpu", 2),
                canvas=canvas, train=False,
            )
            results = run_eval(det, variables, loader, anchors, nla, logger=logger)
            m = ds.evaluate(results)
            per_sev.append(m.get("bbox_mAP", m.get("mAP", 0.0)))
            logger.info(f"{corr} sev{sev}: {per_sev[-1]:.4f}")
        results_table[corr] = float(np.mean(per_sev))
    clean = results_table.pop("clean")
    mpc = float(np.mean(list(results_table.values())))
    out = {"clean_mAP": clean, "mPC": mpc, "rPC": mpc / max(clean, 1e-9),
           "per_corruption": results_table}
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
