"""Detection visualization (reference ``mmdet/core/visualization/image.py``
``imshow_det_bboxes`` + the fork's underwater palette variant
``image_water.py``)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

# default palette + the fork's underwater palette
PALETTE = [
    (255, 56, 56), (56, 56, 255), (56, 255, 56), (255, 157, 151),
    (255, 112, 31), (72, 249, 10), (146, 204, 23), (61, 219, 134),
    (26, 147, 52), (0, 212, 187), (44, 153, 168), (0, 194, 255),
]
UNDERWATER_PALETTE = [
    (38, 148, 255), (255, 128, 0), (64, 255, 64), (255, 64, 255),
]


def draw_detections(
    img: np.ndarray,  # BGR uint8
    boxes: np.ndarray,  # (N, 4) or (N, 5) with scores
    labels: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.0,
    palette=None,
    thickness: int = 2,
) -> np.ndarray:
    if cv2 is None:
        return img
    palette = palette or PALETTE
    img = img.copy()
    for box, lab in zip(boxes, labels):
        score = box[4] if len(box) > 4 else None
        if score is not None and score < score_thr:
            continue
        color = palette[int(lab) % len(palette)]
        x1, y1, x2, y2 = [int(round(float(v))) for v in box[:4]]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        name = (
            class_names[int(lab)]
            if class_names and int(lab) < len(class_names)
            else str(int(lab))
        )
        text = f"{name}" + (f" {score:.2f}" if score is not None else "")
        cv2.putText(
            img, text, (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
            0.5, color, 1, cv2.LINE_AA,
        )
    return img
