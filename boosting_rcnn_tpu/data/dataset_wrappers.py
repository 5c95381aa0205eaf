"""Dataset wrappers (reference ``mmdet/datasets/dataset_wrappers.py``:
ConcatDataset, RepeatDataset, ClassBalancedDataset)."""
from __future__ import annotations

import math
from collections import defaultdict
from typing import List, Sequence

import numpy as np


class _WrappedBase:
    @property
    def CLASSES(self):
        return self.datasets[0].CLASSES if hasattr(self, "datasets") else self.dataset.CLASSES


class ConcatDataset(_WrappedBase):
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])
        self.data_infos = [d for ds in self.datasets for d in ds.data_infos]
        self.flags = np.concatenate([ds.flags for ds in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def img_path(self, idx):
        di = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[di].img_path(idx - int(self._offsets[di]))


class RepeatDataset(_WrappedBase):
    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times
        self.data_infos = list(dataset.data_infos) * times
        self.flags = np.tile(dataset.flags, times)

    def __len__(self):
        return len(self.dataset) * self.times

    def img_path(self, idx):
        return self.dataset.img_path(idx % len(self.dataset))


class ClassBalancedDataset(_WrappedBase):
    """Repeat-factor sampling (LVIS paper, reference implementation):
    ``r(I) = max_{c in I} max(1, sqrt(t / f(c)))``."""

    def __init__(self, dataset, oversample_thr: float = 1e-3):
        self.dataset = dataset
        counts = defaultdict(int)
        n = len(dataset)
        for d in dataset.data_infos:
            for c in set(d["labels"].tolist()):
                counts[c] += 1
        freq = {c: cnt / n for c, cnt in counts.items()}
        cat_repeat = {
            c: max(1.0, math.sqrt(oversample_thr / f)) for c, f in freq.items()
        }
        self._indices = []
        for i, d in enumerate(dataset.data_infos):
            labels = set(d["labels"].tolist())
            r = max((cat_repeat.get(c, 1.0) for c in labels), default=1.0)
            self._indices.extend([i] * int(math.ceil(r)))
        self.data_infos = [dataset.data_infos[i] for i in self._indices]
        self.flags = dataset.flags[self._indices]

    def __len__(self):
        return len(self._indices)

    def img_path(self, idx):
        return self.dataset.img_path(self._indices[idx])
