#!/usr/bin/env python
"""Evaluation CLI — mirrors the reference's ``tools/test.py``:

    python tools/test.py <config> <checkpoint> [--eval bbox]
        [--out results.json] [--cfg-options k=v ...]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", nargs="*", default=["bbox"])
    p.add_argument("--out", default=None, help="dump results json")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--classwise", action="store_true")
    p.add_argument(
        "--tta", action="store_true",
        help="multi-scale + flip test-time augmentation "
        "(reference MultiScaleFlipAug)",
    )
    p.add_argument(
        "--tta-scales", type=int, nargs="*", default=None,
        help="short sides for TTA (default: the test pipeline scale only, "
        "i.e. flip-only TTA)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.builder import build_dataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader
    from boosting_rcnn_tpu.engine.checkpoint import load_params
    from boosting_rcnn_tpu.engine.eval import run_eval
    from boosting_rcnn_tpu.utils.logging import get_root_logger

    from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    logger = get_root_logger()
    cfg = load_config(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))

    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
    mc = cfg.model.to_dict()
    if args.tiny:
        from tools.train import shrink_model

        mc = shrink_model(mc)
        if cfg.get("compute_dtype") is None:
            dtype = jnp.float32
    det = build_detector(mc, dtype=dtype)

    data_cfg = cfg.data.to_dict()
    pipeline = data_cfg["test"].get("pipeline", {})
    canvas = tuple(pipeline.get("canvas", (800, 1344)))
    if args.tiny:
        canvas = (128, 160)
    ds = build_dataset(data_cfg["test"], test_mode=True)
    loader = DetDataLoader(
        ds,
        batch_size=data_cfg.get("samples_per_gpu", 2),
        canvas=canvas,
        train=False,
        img_norm=pipeline.get("img_norm"),
    )
    variables = det.init(jax.random.PRNGKey(0), canvas)
    if args.checkpoint:
        params, batch_stats = load_params(args.checkpoint)
        variables = {"params": params, "batch_stats": batch_stats}
    anchors, nla = det.anchors_for(canvas)

    if args.tta:
        from boosting_rcnn_tpu.engine.eval import run_eval_tta

        scale = tuple(pipeline.get("scale", (1333, 800)))
        scales = args.tta_scales or [scale[1]]
        results = run_eval_tta(
            det, variables, ds,
            batch_size=data_cfg.get("samples_per_gpu", 2),
            scales=scales, long_side=scale[0], logger=logger,
        )
    else:
        results = run_eval(det, variables, loader, anchors, nla, logger=logger)
    if args.out and hasattr(ds, "results_to_coco_json"):
        with open(args.out, "w") as f:
            json.dump(ds.results_to_coco_json(results), f)
        logger.info(f"wrote {args.out}")
    if args.eval:
        metrics = ds.evaluate(results, metric=args.eval, classwise=args.classwise)
        logger.info(f"eval: {metrics}")
        print(json.dumps({k: v for k, v in metrics.items() if k != "classwise"}))


if __name__ == "__main__":
    main()
