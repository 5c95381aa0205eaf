"""End-to-end AP acceptance run (VERDICT r2 item 4).

Generates the deterministic synthetic shapes dataset, trains the flagship
Boosting R-CNN (tiny variant, from scratch) through ``tools/train.py``,
evaluates the saved checkpoint through ``tools/test.py``, and asserts
bbox mAP >= --min-map — the full reference workflow
(``tools/train.py:87`` -> ``tools/test.py:107``) producing a *good* AP,
not just decreasing losses.

Usage (CPU):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/e2e_ap_check.py [--min-map 0.8] [--epochs 8]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-map", type=float, default=0.8)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--data-dir", default="/tmp/synth_coco")
    ap.add_argument("--work-dir", default="/tmp/synth_coco_run")
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.0025)  # linear-scaled bs2
    ap.add_argument(
        "--dtype", choices=["f32", "bf16"], default="f32",
        help="compute dtype for train AND eval — bf16 proves the "
        "mixed-precision path holds AP (reference fp16 Faster R-CNN "
        "loses <0.1 AP, configs/fp16/metafile.yml)")
    ap.add_argument(
        "--tpu", action="store_true",
        help="run train+test on the TPU (default: CPU; the relay "
        "serializes sessions, so train and eval run sequentially — "
        "never run two TPU harnesses at once)")
    ap.add_argument(
        "--segm", action="store_true",
        help="train the tiny Mask R-CNN instead and assert SEGM mAP — "
        "proves the mask training/eval path end-to-end (the synthetic "
        "dataset carries exact shape polygons)")
    args = ap.parse_args()

    from scripts.make_synthetic_coco import generate

    if not os.path.exists(os.path.join(args.data_dir, "train.json")):
        generate(args.data_dir, n_train=args.n_train, n_val=50)

    if args.tpu:
        env = dict(os.environ)  # keep the axon relay registration
    else:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
    cfg = os.path.join(
        REPO, "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py")
    if args.segm:
        cfg = os.path.join(REPO, "configs/mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py")
    overrides = [
        f"data.train.ann_file={args.data_dir}/train.json",
        f"data.train.img_prefix={args.data_dir}/train",
        f"data.val.ann_file={args.data_dir}/val.json",
        f"data.val.img_prefix={args.data_dir}/val",
        f"data.test.ann_file={args.data_dir}/val.json",
        f"data.test.img_prefix={args.data_dir}/val",
        "data.train.type=CocoDataset",
        "data.val.type=CocoDataset",
        "data.test.type=CocoDataset",
        "data.samples_per_gpu=2",
        f"runner.max_epochs={args.epochs}",
        f"optimizer.lr={args.lr}",
        "lr_config.warmup_iters=200",
        f"lr_config.step=[{2 * args.epochs // 3},{args.epochs - 2}]",
        "model.backbone.frozen_stages=-1",  # from scratch: train the stem
        "model.backbone.init_cfg=None",
    ]
    if args.dtype == "bf16":
        overrides.append("compute_dtype=bfloat16")
    if args.segm:
        overrides += [
            "model.roi_head.bbox_head.num_classes=4",
            "model.roi_head.mask_head.num_classes=4",
        ]
    print("== train ==", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/train.py"), cfg,
         "--tiny", "--no-validate", "--work-dir", args.work_dir,
         "--seed", "0", "--cfg-options", *overrides],
        env=env, cwd=REPO)
    assert r.returncode == 0, "train failed"

    ckpt = os.path.join(args.work_dir, f"epoch_{args.epochs}")
    print("== test ==", flush=True)
    eval_metrics = ["bbox", "segm"] if args.segm else ["bbox"]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/test.py"), cfg, ckpt,
         "--tiny", "--eval", *eval_metrics, "--cfg-options", *overrides],
        env=env, cwd=REPO, capture_output=True, text=True)
    print(out.stdout[-2000:])
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    ap_val = metrics.get("bbox_mAP", metrics.get("AP"))
    print(f"e2e bbox mAP = {ap_val}")
    assert ap_val is not None and ap_val >= args.min_map, (
        f"mAP {ap_val} < {args.min_map}")
    if args.segm:
        seg_val = metrics.get("segm_mAP")
        print(f"e2e segm mAP = {seg_val}")
        assert seg_val is not None and seg_val >= args.min_map, (
            f"segm mAP {seg_val} < {args.min_map}")
    print("E2E AP CHECK OK")


if __name__ == "__main__":
    main()
