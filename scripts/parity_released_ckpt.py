#!/usr/bin/env python
"""Push-button released-checkpoint parity: convert -> eval -> compare.

The BASELINE gate "UTDAC2020 mAP within 0.3 of the released checkpoint"
(BASELINE.md; reference ``README.md:66-92`` links the .pth) cannot be
proven offline because the checkpoint file is not in this environment.
This script makes it one command once the file exists:

    python scripts/parity_released_ckpt.py boosting_rcnn.pth \
        [--config configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py] \
        [--expected-map 0.642] [--tol 0.003] [--cfg-options k=v ...]

Steps:
  1. ``tools.convert_torch_weights.convert_mmdet_checkpoint`` on the .pth
  2. graft over the detector's init tree with a STRICT coverage report
     (every converted leaf must exist with the right shape; parameters the
     conversion did not cover are listed — a released checkpoint must
     reach 100% coverage)
  3. save an orbax checkpoint and run ``tools/test.py`` on data.test
  4. compare bbox mAP against --expected-map within --tol

Exit code 0 = parity (or no expectation given), 1 = gate failed.
"""
import argparse
import json
import os
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flat(tree, pre=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, pre + k + "/"))
        else:
            out[pre + k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="mmdet .pth file")
    ap.add_argument(
        "--config",
        default=os.path.join(
            REPO, "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py"))
    ap.add_argument("--expected-map", type=float, default=None)
    ap.add_argument("--tol", type=float, default=0.003,
                    help="absolute AP tolerance (BASELINE gate: 0.3 AP "
                    "points = 0.003)")
    ap.add_argument("--eval", nargs="*", default=["bbox"])
    ap.add_argument("--work-dir", default="/tmp/parity_released_ckpt")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model (self-test harness; a real "
                    "released checkpoint needs the full-size graph)")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()

    import numpy as np

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from tools.convert_torch_weights import (
        _merge_leaves,
        convert_mmdet_checkpoint,
    )

    print("== convert ==", flush=True)
    params, stats = convert_mmdet_checkpoint(args.checkpoint)

    cfg = load_config(args.config)
    if args.cfg_options:
        cfg.merge_from_options(
            dict(kv.split("=", 1) for kv in args.cfg_options))
    mc = cfg.model.to_dict()
    if args.tiny:
        from tools.train import shrink_model

        mc = shrink_model(mc)
    det = build_detector(mc)
    # param shapes are canvas-independent: init small to keep this cheap
    import jax

    variables = det.init(jax.random.PRNGKey(0), (128, 160))

    init_flat = _flat(jax.tree.map(np.asarray, variables["params"]))
    conv_flat = _flat(params)
    extra = sorted(set(conv_flat) - set(init_flat))
    missing = sorted(set(init_flat) - set(conv_flat))
    bad_shape = sorted(
        k for k in set(conv_flat) & set(init_flat)
        if np.shape(conv_flat[k]) != np.shape(init_flat[k]))
    cov = 1.0 - len(missing) / max(1, len(init_flat))
    print(f"coverage: {len(init_flat) - len(missing)}/{len(init_flat)} "
          f"({cov:.1%}); extra={len(extra)} shape-mismatch={len(bad_shape)}")
    for tag, lst in (("MISSING", missing), ("EXTRA", extra),
                     ("SHAPE", bad_shape)):
        for k in lst[:20]:
            print(f"  {tag}: {k}")
    if bad_shape or extra:
        print("conversion does not fit this graph", file=sys.stderr)
        return 1
    if args.expected_map is not None and missing:
        print("parity gate needs 100% coverage", file=sys.stderr)
        return 1

    merged_p = _merge_leaves(
        jax.tree.map(np.asarray, variables["params"]), params)
    merged_s = _merge_leaves(
        jax.tree.map(np.asarray, variables.get("batch_stats", {})), stats)

    from boosting_rcnn_tpu.engine.checkpoint import save_checkpoint

    ckpt_dir = os.path.join(args.work_dir, "converted")
    state = types.SimpleNamespace(
        params=merged_p, batch_stats=merged_s, opt_state={}, step=0)
    save_checkpoint(ckpt_dir, state, meta={"source": args.checkpoint})
    print(f"saved {ckpt_dir}")

    print("== eval ==", flush=True)
    cmd = [sys.executable, os.path.join(REPO, "tools/test.py"),
           args.config, ckpt_dir, "--eval", *args.eval]
    if args.tiny:
        cmd.append("--tiny")
    if args.cfg_options:
        cmd += ["--cfg-options", *args.cfg_options]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    print(out.stdout[-2000:])
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        return 1
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    ap_val = metrics.get("bbox_mAP")
    print(f"converted-checkpoint bbox mAP = {ap_val}")
    if args.expected_map is None:
        print("no --expected-map given; conversion+eval OK")
        return 0
    ok = ap_val is not None and abs(ap_val - args.expected_map) <= args.tol
    print(f"PARITY {'OK' if ok else 'FAIL'}: |{ap_val} - "
          f"{args.expected_map}| {'<=' if ok else '>'} {args.tol}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
