#!/usr/bin/env python
"""Webcam inference demo (reference ``demo/webcam_demo.py``).

cv2.VideoCapture(camera_id) loop over ``inference_detector``; press
Esc / q / Q to exit.  Equivalent to the reference's per-frame
``inference_detector`` + ``model.show_result(show=True)`` loop
(``demo/webcam_demo.py:25-46``).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="webcam demo")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--score-thr", type=float, default=0.5)
    p.add_argument("--palette", default="default",
                   choices=["default", "underwater"])
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
    palette = UNDERWATER_PALETTE if args.palette == "underwater" else PALETTE

    camera = cv2.VideoCapture(args.camera_id)
    assert camera.isOpened(), f"cannot open camera {args.camera_id}"
    print('Press "Esc", "q" or "Q" to exit.')
    while True:
        ok, img = camera.read()
        if not ok:
            break
        result = inference_detector(handle, img, score_thr=args.score_thr)
        for cls, dets in enumerate(result):
            if len(dets):
                img = draw_detections(
                    img, dets, np.full(len(dets), cls), handle.classes,
                    palette=palette)
        cv2.imshow("webcam", img)
        if cv2.waitKey(1) in (27, ord("q"), ord("Q")):
            break
    camera.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
