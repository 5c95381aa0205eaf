"""Batched, aspect-ratio-bucketed data loader with background prefetch.

Replaces the reference's torch DataLoader + ``GroupSampler``/
``DistributedGroupSampler`` (``mmdet/datasets/samplers/group_sampler.py:10,
51``): batches are drawn from one aspect bucket (so every batch hits one of
two compiled canvas shapes), shuffled per epoch with a seeded RNG, and
sharded per host for multi-host data parallelism.  Prefetch runs on a
python thread (image decode is cv2/C++); a C++ decode pool is the planned
upgrade path.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .coco import CocoDataset
from .pipeline import collate, load_image, preprocess


class DetDataLoader:
    def __init__(
        self,
        dataset: CocoDataset,
        batch_size: int,
        canvas: Tuple[int, int] = (800, 1344),
        scale: Tuple[int, int] = (1333, 800),
        train: bool = True,
        flip_prob: float = 0.5,
        max_gt: int = 100,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        prefetch: int = 4,
        mstrain_range: Optional[Tuple[int, int]] = None,
        with_masks: bool = False,
        with_semantic: bool = False,
        semantic_stride: int = 8,
        mosaic_prob: float = 0.0,
        mixup_prob: float = 0.0,
        autoaugment: bool = False,
        lsj_range: Optional[Tuple[float, float]] = None,
        ssd_aug: bool = False,
        albu: Optional[Dict] = None,  # dict(transforms=[...], min_visibility=)
        instaboost: Optional[Dict] = None,  # reference InstaBoost kwargs
        domain_file: Optional[str] = None,
        img_norm: Optional[Dict] = None,  # dict(mean=, std=, to_rgb=)
        jigsaw: Optional[int] = None,  # JiGEN permutation classes (31)
        dgaug: bool = False,  # DGaug host-side style transfer
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.canvas = canvas
        self.canvas_portrait = (canvas[1], canvas[0])
        self.scale = scale
        self.train = train
        self.flip_prob = flip_prob if train else 0.0
        self.max_gt = max_gt
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.mstrain_range = mstrain_range
        self.with_masks = with_masks
        self.with_semantic = with_semantic
        self.semantic_stride = semantic_stride
        self.mosaic_prob = mosaic_prob if train else 0.0
        self.mixup_prob = mixup_prob if train else 0.0
        self.autoaugment = autoaugment and train
        self.lsj_range = tuple(lsj_range) if (lsj_range and train) else None
        self.ssd_aug = ssd_aug and train
        self.albu = albu if train else None
        self.instaboost = instaboost if train else None
        self.domain_map = None
        if domain_file:  # SUO-DAC domain labels (reference loading.py:87)
            from .suodac import DomainMap

            self.domain_map = DomainMap(domain_file)
        # JiGEN jigsaw self-supervision (reference detectors/faster_rcnn.py
        # :465-540 consumes img_puzzle/jig_labels; no loader for them was
        # committed upstream — this is the functional rebuild): a fixed
        # table of 3x3 tile permutations, id 0 = identity, the rest drawn
        # deterministically (the reference JiGen recipe's max-Hamming set
        # is not in the repo).
        self.jig_perms = None
        if jigsaw and train:
            prng = np.random.RandomState(0)
            perms = [np.arange(9)]
            seen = {tuple(perms[0])}
            while len(perms) < jigsaw:
                p = prng.permutation(9)
                if tuple(p) not in seen:
                    seen.add(tuple(p))
                    perms.append(p)
            self.jig_perms = np.stack(perms)
        self.dgaug = dgaug and train
        self._style_donors = None
        # per-config normalization (the caffe-pretrained family uses BGR
        # mean-only norm: img_norm_cfg in the reference caffe configs)
        from .pipeline import DEFAULT_MEAN, DEFAULT_STD

        img_norm = img_norm or {}
        self.norm_mean = np.asarray(
            img_norm.get("mean", DEFAULT_MEAN), np.float32)
        self.norm_std = np.asarray(
            img_norm.get("std", DEFAULT_STD), np.float32)
        self.norm_to_rgb = bool(img_norm.get("to_rgb", True))
        self.epoch = 0

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed + epoch)
        order = []
        for flag in (1, 0):  # landscape bucket first
            idx = np.where(self.ds.flags == flag)[0]
            if self.train:
                rng.shuffle(idx)
            # round up to full batches within the bucket (group sampler
            # semantics: batches never mix buckets)
            bs = self.batch_size * self.num_shards
            if len(idx) % bs and self.train and len(idx):
                pad = bs - len(idx) % bs
                idx = np.concatenate([idx, idx[:pad]])
            order.append(idx)
        idx = np.concatenate(order) if order else np.zeros(0, np.int64)
        return idx

    def _raw(self, i: int):
        info = self.ds.data_infos[i]
        return load_image(self.ds.img_path(i)), info["bboxes"], info["labels"]

    def _compose_mosaic_mixup(self, i: int, rng: np.random.RandomState):
        """YOLOX train-recipe composition (reference ``transforms.py:1948``
        Mosaic + ``:2197`` MixUp wired by ``configs/yolox``): 4-image mosaic,
        optionally mixed with a second image, before the fused
        resize/flip/normalize/pad."""
        from .transforms import mixup, mosaic

        n = len(self.ds.data_infos)
        extra = rng.randint(0, n, size=3)
        imgs, boxes, labels = zip(
            *[self._raw(j) for j in (i, *extra.tolist())]
        )
        oh = min(self.canvas) // 2 * 2
        img, b, l = mosaic(
            list(imgs), list(boxes), list(labels), rng, out_size=(oh, oh)
        )
        if rng.rand() < self.mixup_prob:
            j = int(rng.randint(0, n))
            img2, b2, l2 = self._raw(j)
            img, b, l = mixup(
                img, b, l, img2, b2, l2, rng, ratio=rng.beta(8.0, 8.0)
            )
        return img, b, l

    def _load(self, i: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        info = self.ds.data_infos[i]
        segs = info.get("segmentations") if self.with_masks else None
        # semantic/stuff raster for HTC-semantic / PanopticFPN training
        # (reference seg_prefix + LoadAnnotations(with_seg=True) +
        # SegRescale chain) — geometry-preserving path only
        sem = self.ds.semantic_map(i) if self.with_semantic else None
        composed = False
        if self.mosaic_prob > 0 and rng.rand() < self.mosaic_prob:
            img, bboxes, labels = self._compose_mosaic_mixup(i, rng)
            segs = None  # mosaic is a box-only recipe (YOLOX)
            composed = True
        else:
            img, bboxes, labels = self._raw(i)
        if self.instaboost and not composed and segs is not None:
            # instance jitter-paste (reference pipelines/instaboost.py;
            # native matting-free variant — data/instaboost.py).  Runs
            # first, like the reference op (pre-Resize, on the anns).
            from .instaboost import instaboost as _instaboost

            img, bboxes, segs = _instaboost(
                img, bboxes, labels, segs, rng, **self.instaboost)
            if sem is not None:  # pasted pixels invalidate the raster
                sem = np.full(img.shape[:2], 255, np.int32)
        if self.autoaugment:
            from .auto_augment import apply_policy

            img, bboxes, labels = apply_policy(img, bboxes, labels, rng)
            segs = None  # geometric policies invalidate polygon anns
            composed = True
        if self.albu and not composed:
            # native Albu chain (reference configs/albu_example; see
            # data/albu.py): applied at original resolution — pixel ops
            # are resolution-independent and the SSR affine composes with
            # the downstream keep-ratio resize
            from .albu import apply_albu

            img, bboxes, labels, segs = apply_albu(
                img, bboxes, labels, segs,
                self.albu.get("transforms", []), rng,
                min_visibility=self.albu.get("min_visibility", 0.0),
            )
            if sem is not None:
                # the raster is not warped alongside; emit full-ignore
                sem = np.full(img.shape[:2], 255, np.int32)
        if composed and sem is not None:
            # the composed image no longer matches the raster geometry —
            # emit a full-ignore map so the batch keeps a fixed key set
            sem = np.full(img.shape[:2], 255, np.int32)
        domain = None
        if self.domain_map is not None:
            domain = self.domain_map.one_hot(self.ds.img_path(i))
        if self.ssd_aug and not composed:
            # SSD train chain (reference ssd300/512 pipeline:
            # PhotoMetricDistortion -> Expand -> MinIoURandomCrop);
            # box-only geometry, so masks/rasters are dropped
            from .transforms import (
                expand,
                min_iou_random_crop,
                photo_metric_distortion,
            )

            img = photo_metric_distortion(img, rng)
            img, bboxes = expand(img, bboxes, rng)
            img, bboxes, labels = min_iou_random_crop(img, bboxes, labels, rng)
            segs = None
            if sem is not None:
                sem = np.full(img.shape[:2], 255, np.int32)
        flip = rng.rand() < self.flip_prob
        canvas = self.canvas if self.ds.flags[i] == 1 else self.canvas_portrait
        short = None
        scale = self.scale
        if self.lsj_range is not None and not composed:
            from .transforms import large_scale_jitter

            img, bboxes, labels, segs = large_scale_jitter(
                img, bboxes, labels, segs, rng, canvas, self.lsj_range)
            # image is now <= canvas; make the fused resize a no-op
            scale = (max(img.shape[:2]), min(img.shape[:2]))
            if sem is not None:  # geometry changed: full-ignore raster
                sem = np.full(img.shape[:2], 255, np.int32)
        elif self.mstrain_range is not None and self.train:
            short = int(rng.randint(self.mstrain_range[0], self.mstrain_range[1] + 1))
        out = preprocess(
            img,
            bboxes,
            labels,
            canvas=canvas,
            scale=scale,
            flip=flip,
            max_gt=self.max_gt,
            mean=self.norm_mean,
            std=self.norm_std,
            to_rgb=self.norm_to_rgb,
            short_side_override=short,
            segmentations=segs,
            semantic_map=sem,
            semantic_stride=self.semantic_stride,
        )
        if domain is not None:
            out["domain_label"] = domain
        if self.dgaug:
            # DGaugFasterRCNN (reference detectors/faster_rcnn.py:609-638):
            # the reference stylizes each train image toward its own
            # domain's water type (style_ids = argmax(domain_label),
            # faster_rcnn.py:628) with a private pretrained net; the
            # rebuild uses the checkpoint-free transfer core
            # (data/style_transfer.py) with a per-domain exemplar donor.
            # Without domain labels the donor is drawn per sample from the
            # loader rng (donor 0 always would collapse style diversity).
            # Photometric-only, so the second preprocess pass reuses the
            # identical geometry decisions.
            from .style_transfer import stylize

            donors = self._style_donor_list()
            donor_id = (int(np.argmax(domain)) if domain is not None
                        else int(rng.randint(len(donors))))
            content = img[..., ::-1].astype(np.float64) / 255.0
            aug = stylize(content, self._style_donor(donor_id), rng=rng)
            img_aug = (np.clip(aug, 0, 1) * 255.0 + 0.5).astype(
                np.uint8)[..., ::-1]
            out["img_aug"] = preprocess(
                img_aug, bboxes, labels, canvas=canvas, scale=scale,
                flip=flip, max_gt=self.max_gt, mean=self.norm_mean,
                std=self.norm_std, to_rgb=self.norm_to_rgb,
                short_side_override=short,
            )["images"]
        if self.jig_perms is not None:
            # tile-permute the padded canvas (largest 3x3-divisible crop)
            jid = int(rng.randint(len(self.jig_perms)))
            im = out["images"]
            h3, w3 = im.shape[0] // 3 * 3, im.shape[1] // 3 * 3
            th, tw = h3 // 3, w3 // 3
            tiles = (
                im[:h3, :w3]
                .reshape(3, th, 3, tw, -1)
                .transpose(0, 2, 1, 3, 4)
                .reshape(9, th, tw, -1)
            )
            puzzle = im.copy()
            puzzle[:h3, :w3] = (
                tiles[self.jig_perms[jid]]
                .reshape(3, 3, th, tw, -1)
                .transpose(0, 2, 1, 3, 4)
                .reshape(h3, w3, -1)
            )
            out["img_puzzle"] = puzzle
            one_hot = np.zeros(len(self.jig_perms), np.float32)
            one_hot[jid] = 1.0
            out["jig_labels"] = one_hot
        return out

    def _style_donor(self, domain_id: int):
        return self._style_donor_list()[
            domain_id % len(self._style_donor_list())]

    def _style_donor_list(self):
        """Per-domain style exemplars, loaded once: the first image of each
        domain list when domain labels exist, else the dataset's first
        images (downscaled — the transfer only consumes colour statistics)."""
        if self._style_donors is None:
            donors = []
            if self.domain_map is not None:
                paths = []
                by_name = {}
                for i in range(len(self.ds.data_infos)):
                    p = self.ds.img_path(i)
                    by_name.setdefault(
                        np.argmax(self.domain_map.one_hot(p)), p)
                for d in range(self.domain_map.num_domains):
                    paths.append(by_name.get(d, self.ds.img_path(0)))
            else:
                paths = [self.ds.img_path(i)
                         for i in range(min(4, len(self.ds.data_infos)))]
            from .pipeline import load_image

            for p in paths:
                im = load_image(p)[::4, ::4, ::-1].astype(np.float64) / 255.0
                donors.append(im)
            self._style_donors = donors
        return self._style_donors

    def __len__(self):
        return len(self._epoch_indices(0)) // (self.batch_size * self.num_shards)

    def epoch_iter(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices(epoch)
        # shard: contiguous batch interleave so every shard sees same bucket
        bs, ns = self.batch_size, self.num_shards
        rng = np.random.RandomState(self.seed * 1000 + epoch + self.shard_id)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in range(len(idx) // (bs * ns)):
                    if stop.is_set():
                        return
                    take = idx[(b * ns + self.shard_id) * bs :][:bs]
                    if len(take) < bs:
                        return
                    samples = [self._load(int(i), rng) for i in take]
                    q.put(collate(samples))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class FakeDetLoader:
    """Synthetic loader for tests/benchmarks (the `_demo_mm_inputs` analog,
    reference ``tests/test_models/test_forward.py``)."""

    def __init__(
        self,
        batch_size: int,
        canvas: Tuple[int, int],
        num_classes: int,
        max_gt: int = 20,
        seed: int = 0,
        num_batches: int = 10,
        with_masks: bool = False,
        mask_crop_size: int = 28,
        with_semantic: bool = False,
        num_semantic_classes: int = 8,
        semantic_stride: int = 8,
        num_domains: int = 0,  # >0: emit one-hot domain_label (DG wrappers)
        jigsaw: int = 0,  # >0: emit img_puzzle + jig_labels (JiGEN)
    ):
        self.batch_size = batch_size
        self.canvas = canvas
        self.num_classes = num_classes
        self.max_gt = max_gt
        self.seed = seed
        self.num_batches = num_batches
        self.with_masks = with_masks
        self.mask_crop_size = mask_crop_size
        self.with_semantic = with_semantic
        self.num_semantic_classes = num_semantic_classes
        self.semantic_stride = semantic_stride
        self.num_domains = num_domains
        self.jigsaw = jigsaw

    def __len__(self):
        return self.num_batches

    def epoch_iter(self, epoch: int):
        rng = np.random.RandomState(self.seed + epoch)
        h, w = self.canvas
        for _ in range(self.num_batches):
            b, g = self.batch_size, self.max_gt
            n = rng.randint(1, g + 1, size=b)
            cx = rng.uniform(50, w - 50, (b, g))
            cy = rng.uniform(50, h - 50, (b, g))
            bw = rng.uniform(20, 150, (b, g))
            bh = rng.uniform(20, 150, (b, g))
            boxes = np.stack(
                [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
            ).astype(np.float32)
            boxes[..., [0, 2]] = boxes[..., [0, 2]].clip(0, w)
            boxes[..., [1, 3]] = boxes[..., [1, 3]].clip(0, h)
            mask = np.arange(g)[None, :] < n[:, None]
            out = dict(
                images=rng.randn(b, h, w, 3).astype(np.float32),
                gt_bboxes=boxes * mask[..., None],
                gt_labels=(rng.randint(0, self.num_classes, (b, g)) * mask).astype(
                    np.int32
                ),
                gt_mask=mask,
                img_shape=np.tile(np.array([h, w], np.float32), (b, 1)),
                scale_factor=np.ones((b, 4), np.float32),
                ori_shape=np.tile(np.array([h, w], np.int32), (b, 1)),
            )
            if self.with_masks:
                s = self.mask_crop_size
                yy, xx = np.mgrid[0:s, 0:s]
                circle = (
                    ((yy - s / 2) ** 2 + (xx - s / 2) ** 2) < (s / 2.5) ** 2
                ).astype(np.uint8)
                out["gt_mask_crops"] = np.broadcast_to(
                    circle, (b, g, s, s)
                ).copy()
            if self.with_semantic:
                # non-trivial stuff raster at 1/stride canvas resolution:
                # stuff-class stripes + each gt box painted with its thing
                # label (a learnable image->class mapping for smoke tests)
                st = self.semantic_stride
                sh, sw = (h + st - 1) // st, (w + st - 1) // st
                sem = np.zeros((b, sh, sw), np.int32)
                for bi in range(b):
                    nstripe = rng.randint(2, 5)
                    edges = np.sort(rng.randint(0, sh, nstripe - 1))
                    cls = rng.randint(
                        self.num_classes,
                        self.num_classes + max(self.num_semantic_classes, 1),
                        nstripe,
                    )
                    prev = 0
                    for e, c in zip(list(edges) + [sh], cls):
                        sem[bi, prev:e] = c
                        prev = e
                    for gi in range(int(n[bi])):
                        x1, y1, x2, y2 = (boxes[bi, gi] / st).astype(int)
                        sem[bi, y1:y2, x1:x2] = out["gt_labels"][bi, gi]
                out["gt_semantic_seg"] = sem
            if self.num_domains > 0:
                out["domain_label"] = np.eye(self.num_domains, dtype=np.float32)[
                    rng.randint(0, self.num_domains, size=b)]
            if self.jigsaw > 0:
                out["img_puzzle"] = out["images"][:, ::-1].copy()
                jl = np.zeros((b, self.jigsaw), np.float32)
                jl[np.arange(b), rng.randint(0, self.jigsaw, size=b)] = 1.0
                out["jig_labels"] = jl
            yield out
