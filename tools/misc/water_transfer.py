"""Underwater style transfer for offline training-set augmentation.

TPU-native equivalent of the fork's style-transfer trio
(``tools/WaterTransfer.py`` + ``tools/CBST_model.py`` + ``tools/VGG.py``):
the reference stylizes land images toward 7 water-quality types with a
pretrained VGG encoder + joint-bilateral upsampling model loaded from the
author's local checkpoints (``WaterTransfer.py:22`` hardcodes
``/home/dailh/WCT2/water_quality``).  Those weights are not distributable,
so this rebuild provides the checkpoint-free statistical equivalents that
cover the same use (shifting the training distribution toward a water
color cast):

- ``reinhard``: Reinhard et al. colour transfer in the decorrelated lab
  space (mean/std matching per channel) — the classical statistical
  analogue of AdaIN-style transfer.
- ``hist``: per-channel monotone histogram matching to the style image.
- ``blend``: Beta(alpha, alpha)-weighted convex blend between the content
  image and its transferred version, mirroring the reference's random
  Beta-strength stylization (``WaterTransfer.py`` ``Beta`` draw).

Usage:
    python tools/misc/water_transfer.py CONTENT_DIR STYLE_DIR OUT_DIR \
        [--method reinhard|hist] [--alpha 2.0] [--seed 0]

Each content image is paired with a random style image (one of the
"water type" exemplars), matching the reference's per-image random style
pick.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from boosting_rcnn_tpu.data.style_transfer import (  # noqa: F401
    _lab_to_rgb,
    _rgb_to_lab,
    hist_match,
    reinhard_transfer,
    stylize,
)


def _load(path):
    from boosting_rcnn_tpu.data.pipeline import load_image

    return load_image(path)[..., ::-1].astype(np.float64) / 255.0  # BGR->RGB


def _save(path, img):
    import cv2

    cv2.imwrite(
        path, (np.clip(img[..., ::-1], 0, 1) * 255.0 + 0.5).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("content_dir")
    ap.add_argument("style_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--method", choices=("reinhard", "hist"),
                    default="reinhard")
    ap.add_argument("--alpha", type=float, default=2.0,
                    help="Beta blend strength (reference's Beta draw)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    styles = sorted(
        os.path.join(args.style_dir, f)
        for f in os.listdir(args.style_dir) if f.lower().endswith(exts))
    if not styles:
        raise SystemExit(f"no style images in {args.style_dir}")
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    n = 0
    for f in sorted(os.listdir(args.content_dir)):
        if not f.lower().endswith(exts):
            continue
        content = _load(os.path.join(args.content_dir, f))
        style = _load(styles[rng.randint(len(styles))])
        out = stylize(content, style, args.method, rng, args.alpha)
        _save(os.path.join(args.out_dir, f), out)
        n += 1
    print(f"stylized {n} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
