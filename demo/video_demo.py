#!/usr/bin/env python
"""Video inference demo (reference ``demo/video_demo.py``).

Reads a video with cv2, runs every frame through ``inference_detector``
(the jitted predict path — one compile, then per-frame device calls),
draws detections, and writes/shows the result.  The reference iterates
``mmcv.VideoReader`` and calls ``model.show_result`` per frame
(``demo/video_demo.py:38-55``); this shim is the cv2-only equivalent.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="video demo")
    p.add_argument("video")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out", type=str, help="output video file")
    p.add_argument("--show", action="store_true")
    p.add_argument("--wait-time", type=float, default=1.0,
                   help="imshow interval (s); 0 blocks")
    p.add_argument("--palette", default="default",
                   choices=["default", "underwater"])
    args = p.parse_args()
    assert args.out or args.show, "specify --out and/or --show"

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

    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), f"cannot open {args.video}"
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = None
    if args.out:
        writer = cv2.VideoWriter(
            args.out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))

    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(handle, frame, score_thr=args.score_thr)
        for cls, dets in enumerate(result):
            if len(dets):
                frame = draw_detections(
                    frame, dets, np.full(len(dets), cls), handle.classes,
                    palette=palette)
        if args.show:
            cv2.namedWindow("video", 0)
            cv2.imshow("video", frame)
            if cv2.waitKey(max(1, int(args.wait_time * 1000))) in (
                    27, ord("q"), ord("Q")):
                break
        if writer is not None:
            writer.write(frame)
        n += 1
        if n % 25 == 0:
            print(f"{n} frames", flush=True)

    cap.release()
    if writer is not None:
        writer.release()
        print(f"wrote {args.out} ({n} frames)")
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
