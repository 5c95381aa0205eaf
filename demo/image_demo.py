#!/usr/bin/env python
"""Single-image inference demo (reference ``demo/image_demo.py``)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--out-file", default="demo_out.jpg")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--palette", default="default", choices=["default", "underwater"])
    args = p.parse_args()

    import cv2
    import numpy as np

    from boosting_rcnn_tpu.apis import inference_detector, init_detector
    from boosting_rcnn_tpu.core.visualization import (
        PALETTE,
        UNDERWATER_PALETTE,
        draw_detections,
    )

    handle = init_detector(args.config, args.checkpoint)
    result = inference_detector(handle, args.img, score_thr=args.score_thr)
    img = cv2.imread(args.img)
    palette = UNDERWATER_PALETTE if args.palette == "underwater" else PALETTE
    for cls, dets in enumerate(result):
        if len(dets):
            img = draw_detections(
                img, dets, np.full(len(dets), cls), handle.classes,
                palette=palette,
            )
    cv2.imwrite(args.out_file, img)
    print(f"wrote {args.out_file}")


if __name__ == "__main__":
    main()
