"""Dataset builder (reference ``mmdet/datasets/builder.py:55``
``build_dataset`` with wrapper support)."""
from __future__ import annotations

from typing import Any, Dict

from .coco import DATASET_CLASSES, CocoDataset
from .dataset_wrappers import ClassBalancedDataset, ConcatDataset, RepeatDataset
from .voc import VOCDataset


def build_dataset(cfg: Dict[str, Any], test_mode: bool = False):
    t = cfg.get("type", "CocoDataset")
    if t == "ConcatDataset":
        return ConcatDataset(
            [build_dataset(c, test_mode) for c in cfg["datasets"]]
        )
    if t == "RepeatDataset":
        return RepeatDataset(build_dataset(cfg["dataset"], test_mode), cfg["times"])
    if t == "ClassBalancedDataset":
        return ClassBalancedDataset(
            build_dataset(cfg["dataset"], test_mode),
            cfg.get("oversample_thr", 1e-3),
        )
    if t == "CocoPanopticDataset":
        from .coco_panoptic import CocoPanopticDataset

        return CocoPanopticDataset(
            ann_file=cfg["ann_file"],
            img_prefix=cfg.get("img_prefix", ""),
            seg_prefix=cfg.get("seg_prefix", ""),
            classes=cfg.get("classes"),
            test_mode=test_mode,
        )
    if t == "CityscapesDataset":
        from .cityscapes import CityscapesDataset

        return CityscapesDataset(
            ann_file=cfg["ann_file"],
            img_prefix=cfg.get("img_prefix", ""),
            classes=cfg.get("classes"),
            test_mode=test_mode,
        )
    if t == "WIDERFaceDataset":
        from .voc import WIDERFaceDataset

        return WIDERFaceDataset(
            ann_file=cfg["ann_file"],
            img_prefix=cfg.get("img_prefix", ""),
            test_mode=test_mode,
        )
    if t == "VOCDataset":
        return VOCDataset(
            ann_file=cfg["ann_file"],
            img_prefix=cfg.get("img_prefix", ""),
            classes=cfg.get("classes"),
            test_mode=test_mode,
        )
    if t in ("LVISDataset", "LVISV05Dataset", "LVISV1Dataset"):
        from .lvis import LvisDataset

        return LvisDataset(
            ann_file=cfg["ann_file"],
            img_prefix=cfg.get("img_prefix", ""),
            classes=cfg.get("classes"),
            test_mode=test_mode,
        )
    # CocoDataset + the underwater dataset aliases (UTDAC/Brackish/TrashCan)
    classes = cfg.get("classes")
    if classes is None and t in DATASET_CLASSES and t != "CocoDataset":
        classes = DATASET_CLASSES[t]
    return CocoDataset(
        ann_file=cfg["ann_file"],
        img_prefix=cfg.get("img_prefix", ""),
        classes=classes,
        test_mode=test_mode,
        seg_prefix=cfg.get("seg_prefix"),
    )
