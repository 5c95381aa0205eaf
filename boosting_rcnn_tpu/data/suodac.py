"""SUO-DAC domain supervision (fork contribution, reference
``mmdet/datasets/pipelines/loading.py:87`` ``LoadImageFromSUODAC``).

The underwater domain-adaptation recipe tags every image with a water-type
domain read from per-domain name lists (one txt per domain); training
batches then carry a one-hot ``domain_label``.  Here the mapping is a
host-side lookup resolved once at dataset build; the loader attaches the
label to the batch dict.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


class DomainMap:
    def __init__(self, domain_file: str):
        self.domains: List[List[str]] = []
        for name in sorted(os.listdir(domain_file)):
            with open(os.path.join(domain_file, name)) as f:
                self.domains.append([ln.strip() for ln in f if ln.strip()])
        self._index: Dict[str, int] = {}
        for i, names in enumerate(self.domains):
            for n in names:
                self._index.setdefault(n, i)

    @property
    def num_domains(self) -> int:
        return len(self.domains)

    def domain_of(self, path: str) -> int:
        """reference ``find_domain:136``: stem lookup, default domain 0."""
        stem = os.path.basename(path).rsplit(".", 1)[0]
        return self._index.get(stem, 0)

    def one_hot(self, path: str) -> np.ndarray:
        v = np.zeros((self.num_domains,), np.float32)
        v[self.domain_of(path)] = 1.0
        return v
