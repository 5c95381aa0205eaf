"""COCO panoptic dataset (reference ``mmdet/datasets/coco_panoptic.py:120``).

Parses the panoptic annotation json (per-image ``segments_info`` + a PNG id
map encoded as ``R + G*256 + B*256**2``), exposes thing instances as
detection targets (boxes/labels/mask crops) plus a per-pixel semantic class
map (``gt_semantic_seg``) for the PanopticFPN head, and evaluates PQ with
the built-in numpy implementation."""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def rgb2id(color: np.ndarray) -> np.ndarray:
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


class CocoPanopticDataset:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        seg_prefix: str = "",
        classes: Optional[Sequence[str]] = None,
        test_mode: bool = False,
    ):
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix
        with open(ann_file) as f:
            pan = json.load(f)
        cats = pan.get("categories", [])
        if classes:
            cats = [c for c in cats if c["name"] in set(classes)]
        # things first (detection classes), then stuff — mmdet convention
        things = [c for c in cats if c.get("isthing", 0)]
        stuff = [c for c in cats if not c.get("isthing", 0)]
        self.CLASSES = tuple(c["name"] for c in things)
        self.STUFF_CLASSES = tuple(c["name"] for c in stuff)
        self.num_things = len(things)
        self.num_stuff = len(stuff)
        self.cat2label = {c["id"]: i for i, c in enumerate(things)}
        self.cat2stuff = {
            c["id"]: self.num_things + i for i, c in enumerate(stuff)
        }
        imgs = {im["id"]: im for im in pan.get("images", [])}
        anns = {a["image_id"]: a for a in pan.get("annotations", [])}
        self.data_infos: List[dict] = []
        for img_id, im in imgs.items():
            a = anns.get(img_id)
            if a is None and not test_mode:
                continue
            boxes, labels, seg_ids = [], [], []
            if a is not None:
                for s in a.get("segments_info", []):
                    if s["category_id"] in self.cat2label and not s.get(
                        "iscrowd", 0
                    ):
                        x, y, w, h = s["bbox"]
                        boxes.append([x, y, x + w, y + h])
                        labels.append(self.cat2label[s["category_id"]])
                        seg_ids.append(s["id"])
            self.data_infos.append(
                dict(
                    id=img_id,
                    filename=im["file_name"],
                    seg_filename=a["file_name"] if a else None,
                    segments_info=a.get("segments_info", []) if a else [],
                    width=im["width"],
                    height=im["height"],
                    bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                    labels=np.asarray(labels, np.int64),
                    bboxes_ignore=np.zeros((0, 4), np.float32),
                    segmentations=[None] * len(boxes),
                    seg_instance_ids=seg_ids,
                )
            )
        self.flags = np.array(
            [1 if d["width"] / d["height"] > 1 else 0 for d in self.data_infos],
            np.uint8,
        )

    def __len__(self):
        return len(self.data_infos)

    def img_path(self, idx: int) -> str:
        return os.path.join(self.img_prefix, self.data_infos[idx]["filename"])

    def load_pan_map(self, idx: int) -> np.ndarray:
        """Instance-id map (H, W) from the panoptic PNG."""
        import cv2

        info = self.data_infos[idx]
        png = cv2.imread(
            os.path.join(self.seg_prefix, info["seg_filename"]),
            cv2.IMREAD_COLOR,
        )[:, :, ::-1]  # BGR -> RGB
        return rgb2id(png)

    def semantic_map(self, idx: int) -> np.ndarray:
        """Per-pixel class map: things [0, num_things), stuff
        [num_things, num_things + num_stuff), 255 void."""
        info = self.data_infos[idx]
        ids = self.load_pan_map(idx)
        out = np.full(ids.shape, 255, np.int32)
        for s in info["segments_info"]:
            cid = s["category_id"]
            if cid in self.cat2label:
                out[ids == s["id"]] = self.cat2label[cid]
            elif cid in self.cat2stuff:
                out[ids == s["id"]] = self.cat2stuff[cid]
        return out

    def gt_pan_map(self, idx: int) -> np.ndarray:
        """GT map in the fused encoding (cls + inst * INSTANCE_OFFSET)."""
        from ..core.post_processing.panoptic_fusion import INSTANCE_OFFSET

        info = self.data_infos[idx]
        ids = self.load_pan_map(idx)
        void = self.num_things + self.num_stuff
        out = np.full(ids.shape, void, np.int64)
        inst = 1
        for s in info["segments_info"]:
            cid = s["category_id"]
            if cid in self.cat2label:
                out[ids == s["id"]] = (
                    self.cat2label[cid] + inst * INSTANCE_OFFSET
                )
                inst += 1
            elif cid in self.cat2stuff:
                out[ids == s["id"]] = self.cat2stuff[cid]
        return out

    def evaluate_panoptic(self, pred_pan_maps: Sequence[np.ndarray]):
        from ..core.evaluation.panoptic import pq_compute

        gts = [self.gt_pan_map(i) for i in range(len(self))]
        return pq_compute(
            pred_pan_maps, gts,
            num_classes=self.num_things + self.num_stuff,
            void_id=self.num_things + self.num_stuff,
        )
