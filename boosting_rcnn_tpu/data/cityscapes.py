"""Cityscapes dataset + protocol (reference
``mmdet/datasets/cityscapes.py``).

COCO-format annotations with the 8 Cityscapes "thing" classes; the
``cityscapes`` metric writes the official instance dump (per-image
``*_pred.txt`` listing one mask PNG + train-label-id + score per line —
the exact format ``cityscapesscripts`` consumes, ``format_results``) and
evaluates mask AP / AP50.  AP numbers come from the mask-IoU COCO-style
matcher (``core/evaluation/coco_eval.SegmCocoStyleEval``); the official
cityscapesscripts matcher additionally discounts crowd/ignore pixels per
instance, which is not reproduced — parity is at the dump format, where
the official tool can be run directly on the output.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .coco import CocoDataset

CITYSCAPES_THING_CLASSES = (
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
)
# cityscapes trainId -> labelId for the thing classes (official mapping)
CLASS_TO_LABEL_ID = {
    "person": 24, "rider": 25, "car": 26, "truck": 27, "bus": 28,
    "train": 31, "motorcycle": 32, "bicycle": 33,
}


class CityscapesDataset(CocoDataset):
    def __init__(self, ann_file, img_prefix: str = "",
                 classes: Optional[Sequence[str]] = None, **kwargs):
        super().__init__(
            ann_file, img_prefix,
            classes=classes or CITYSCAPES_THING_CLASSES, **kwargs,
        )

    def format_results(self, results, outfile_prefix: str):
        """Write the official cityscapes instance dump
        (reference ``cityscapes.py::format_results``): for every image a
        ``<stem>_pred.txt`` with lines ``<mask png> <labelId> <score>`` and
        one binary PNG per instance."""
        import cv2

        from .mask_utils import paste_mask

        os.makedirs(outfile_prefix, exist_ok=True)
        files = []
        for idx, per_img in enumerate(results):
            info = self.data_infos[idx]
            stem = os.path.splitext(
                os.path.basename(info["filename"]))[0]
            txt = os.path.join(outfile_prefix, f"{stem}_pred.txt")
            lines = []
            dets, labels, masks = per_img
            for j in range(len(dets)):
                score = float(dets[j][4])
                cls_name = self.CLASSES[int(labels[j])]
                label_id = CLASS_TO_LABEL_ID.get(cls_name, 24)
                png = f"{stem}_{j}.png"
                full = paste_mask(
                    np.asarray(masks[j], np.float32),
                    np.asarray(dets[j][:4], np.float32),
                    int(info["height"]), int(info["width"]),
                )
                cv2.imwrite(
                    os.path.join(outfile_prefix, png),
                    (full > 0.5).astype(np.uint8) * 255,
                )
                lines.append(f"{png} {label_id} {score:.6f}")
            with open(txt, "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
            files.append(txt)
        return files

    def evaluate(self, results, metric="bbox", classwise=False,
                 outfile_prefix=None):
        metrics = [metric] if isinstance(metric, str) else list(metric)
        out = {}
        if "cityscapes" in metrics:
            metrics.remove("cityscapes")
            if outfile_prefix and all(
                isinstance(r, tuple) and len(r) == 3 for r in results
            ):
                self.format_results(results, outfile_prefix)
            segm = super().evaluate(results, metric="segm",
                                    classwise=True)
            out["cityscapes_mAP"] = segm.get("segm_mAP", 0.0)
            out["cityscapes_AP50"] = segm.get("segm_mAP_50", 0.0)
            for k, v in segm.items():
                if k.startswith("classwise"):
                    out[k] = v
        if metrics:
            out.update(super().evaluate(results, metric=metrics,
                                        classwise=classwise))
        return out
