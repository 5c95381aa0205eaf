#!/usr/bin/env python
"""Minimal HTTP inference server (the reference ships
``tools/deployment/mmdet2torchserve.py`` + a handler; here a dependency-free
endpoint around the jitted detector).

    python tools/deployment/serve.py CONFIG [CKPT] --port 8080
    curl -X POST --data-binary @img.jpg localhost:8080/predict
"""
import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--canvas", type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    import cv2

    from boosting_rcnn_tpu.apis import inference_detector, init_detector

    handle = init_detector(
        args.config, args.checkpoint, canvas=tuple(args.canvas)
    )
    classes = handle.classes or []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/predict":
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            buf = np.frombuffer(self.rfile.read(length), np.uint8)
            img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if img is None:
                self.send_response(400)
                self.end_headers()
                self.wfile.write(b'{"error": "bad image"}')
                return
            result = inference_detector(handle, img, score_thr=args.score_thr)
            out = []
            for cls, dets in enumerate(result):
                for d in dets:
                    out.append(
                        {
                            "bbox": [float(v) for v in d[:4]],
                            "score": float(d[4]),
                            "label": classes[cls] if cls < len(classes) else cls,
                        }
                    )
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    print(f"serving on :{args.port} (POST /predict)")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
