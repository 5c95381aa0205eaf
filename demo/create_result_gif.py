#!/usr/bin/env python
"""Build a good-vs-bad results GIF (reference ``demo/create_result_gif.py``).

The reference pairs images from two result directories produced by
``analyze_results.py`` into side-by-side matplotlib frames and saves a
GIF (``demo/create_result_gif.py:43-56,141``).  This shim accepts either
layout:

* a directory containing exactly two subdirectories (reference layout), or
* a flat directory of ``best_*.jpg`` / ``worst_*.jpg`` files — the layout
  ``tools/analysis_tools/analyze_results.py`` writes.

Frames are composed with cv2 (resize + hstack + title bar) and the GIF is
written with PIL (no imageio needed).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _collect(image_dir):
    """Return (left_title, left_paths), (right_title, right_paths)."""
    subs = sorted(
        d for d in os.listdir(image_dir)
        if os.path.isdir(os.path.join(image_dir, d)))
    if len(subs) == 2:
        cols = []
        for d in subs:
            files = sorted(
                os.path.join(image_dir, d, f)
                for f in os.listdir(os.path.join(image_dir, d))
                if f.lower().endswith((".jpg", ".png", ".jpeg")))
            cols.append((d, files))
        return cols[0], cols[1]
    files = sorted(os.listdir(image_dir))
    best = [os.path.join(image_dir, f) for f in files if f.startswith("best_")]
    worst = [os.path.join(image_dir, f) for f in files if f.startswith("worst_")]
    if not (best and worst):
        raise SystemExit(
            f"{image_dir}: need two subdirectories or best_*/worst_* files")
    return ("best", best), ("worst", worst)


def main():
    p = argparse.ArgumentParser(description="create result GIF")
    p.add_argument("image_dir",
                   help="analyze_results.py output directory")
    p.add_argument("--out", default="result.gif")
    p.add_argument("--duration", type=float, default=2.0,
                   help="seconds per frame")
    p.add_argument("--size", type=int, default=300,
                   help="per-image frame size (px)")
    args = p.parse_args()

    import cv2
    import numpy as np
    from PIL import Image

    (lt, left), (rt, right) = _collect(args.image_dir)
    s = args.size
    frames = []
    for lp, rp in zip(left, right):
        li, ri = cv2.imread(lp), cv2.imread(rp)
        if li is None or ri is None:
            continue
        pane = np.full((s + 28, 2 * s + 8, 3), 255, np.uint8)
        pane[28:, :s] = cv2.resize(li, (s, s))
        pane[28:, s + 8:] = cv2.resize(ri, (s, s))
        for title, x in ((lt, 4), (rt, s + 12)):
            cv2.putText(pane, title, (x, 20), cv2.FONT_HERSHEY_SIMPLEX,
                        0.6, (0, 0, 0), 1, cv2.LINE_AA)
        frames.append(Image.fromarray(pane[..., ::-1]))
    if not frames:
        raise SystemExit("no paired images found")
    frames[0].save(
        args.out, save_all=True, append_images=frames[1:],
        duration=int(args.duration * 1000), loop=0)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
