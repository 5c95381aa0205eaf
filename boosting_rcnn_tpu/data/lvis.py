"""LVIS dataset (v0.5 / v1) with federated evaluation.

Spec: reference ``mmdet/datasets/lvis.py`` (LVISDataset / LVISV1Dataset):
LVIS annotations are COCO-format json plus per-image
``neg_category_ids`` / ``not_exhaustive_category_ids``; v1 images carry a
``coco_url`` instead of a plain file name.  Evaluation is *federated*
(LVIS paper / lvis-api): a category's AP is computed only over images where
the category was verified — images containing a positive annotation of it,
or listing it in ``neg_category_ids`` — and detections use max_dets=300.
"""
from __future__ import annotations

import json
from typing import List, Optional, Sequence

import numpy as np

from .coco import CocoDataset


class LvisDataset(CocoDataset):
    """LVIS v0.5 / v1 (auto-detected from the image records)."""

    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        classes: Optional[Sequence[str]] = None,
        test_mode: bool = False,
        filter_empty_gt: bool = True,
        min_size: int = 32,
    ):
        # LVIS v1 stores the file name only inside coco_url; patch the
        # records before the COCO parser sees them.
        with open(ann_file) as f:
            raw = json.load(f)
        for im in raw.get("images", []):
            if "file_name" not in im and "coco_url" in im:
                # http://images.cocodataset.org/train2017/xxx.jpg ->
                # train2017/xxx.jpg (reference lvis.py LVISV1Dataset)
                im["file_name"] = im["coco_url"].replace(
                    "http://images.cocodataset.org/", ""
                )
        import tempfile, os

        self._neg_ids = {
            im["id"]: set(im.get("neg_category_ids", []))
            for im in raw.get("images", [])
        }
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False
        ) as tmp:
            json.dump(raw, tmp)
            patched = tmp.name
        try:
            super().__init__(
                ann_file=patched,
                img_prefix=img_prefix,
                classes=classes,
                test_mode=test_mode,
                filter_empty_gt=filter_empty_gt,
                min_size=min_size,
            )
        finally:
            os.unlink(patched)
        self.ann_file = ann_file

    def evaluate(self, results, metric="bbox", classwise=False,
                 max_dets: int = 300):
        """Federated LVIS AP: per category, only verified images count."""
        from ..core.evaluation.coco_eval import CocoStyleEval

        num_classes = len(self.CLASSES)
        per_class_ap: List[float] = []
        per_class_ap50: List[float] = []
        for c in range(num_classes):
            cat_id = self.cat_ids[c]
            gts_c, res_c = [], []
            for d, r in zip(self.data_infos, results):
                has_pos = bool((d["labels"] == c).any())
                verified_neg = cat_id in self._neg_ids.get(d["id"], ())
                if not (has_pos or verified_neg):
                    continue  # federated: unverified image, skip for c
                sel = d["labels"] == c
                gts_c.append(
                    dict(
                        bboxes=d["bboxes"][sel],
                        labels=np.zeros(int(sel.sum()), np.int64),
                        bboxes_ignore=d["bboxes_ignore"],
                        width=d["width"],
                        height=d["height"],
                    )
                )
                # per image either the engine format (dets (n, 5),
                # labels (n,)) or a per-class list of (n, 5) arrays
                if isinstance(r, tuple) and len(r) >= 2:
                    dets, lbls = np.asarray(r[0]), np.asarray(r[1])
                    det_c = dets[lbls == c].reshape(-1, 5)
                else:
                    det_c = np.asarray(r[c]).reshape(-1, 5)
                # evaluator consumes (dets (n, 5), labels (n,)) per image
                res_c.append((det_c, np.zeros(len(det_c), np.int64)))
            if not gts_c or not any(len(g["bboxes"]) for g in gts_c):
                continue  # category absent from the verified set
            ev = CocoStyleEval(gts_c, res_c, num_classes=1, max_dets=max_dets)
            stats = ev.summarize()
            per_class_ap.append(stats["AP"])
            per_class_ap50.append(stats["AP50"])
        out = {
            "bbox_mAP": float(np.mean(per_class_ap)) if per_class_ap else 0.0,
            "bbox_mAP_50": float(np.mean(per_class_ap50)) if per_class_ap50 else 0.0,
        }
        if classwise:
            out["classwise"] = {
                self.CLASSES[i]: ap for i, ap in enumerate(per_class_ap)
            }
        return out
