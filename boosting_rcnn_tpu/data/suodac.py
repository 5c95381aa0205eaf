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
    """Image-stem -> domain-id mapping.

    Accepts either a *directory* of per-domain txt name lists (the
    reference layout: one file per water type) or a *json file* holding
    ``{"domain_name": ["stem", ...], ...}`` or ``{"stem": domain_id, ...}``
    (the layout ``configs/_base_/datasets/suodac_detection.py`` declares as
    ``annotations/domains.json``)."""

    def __init__(self, domain_file: str):
        self.domains: List[List[str]] = []
        if os.path.isdir(domain_file):
            for name in sorted(os.listdir(domain_file)):
                with open(os.path.join(domain_file, name)) as f:
                    self.domains.append(
                        [ln.strip() for ln in f if ln.strip()])
        else:
            import json

            with open(domain_file) as f:
                mapping = json.load(f)
            if mapping and all(
                isinstance(v, (list, tuple)) for v in mapping.values()
            ):  # {"domain": [stems]}
                for k in sorted(mapping):
                    self.domains.append([str(s) for s in mapping[k]])
            else:  # {"stem": domain_id}
                n = int(max(mapping.values())) + 1 if mapping else 0
                self.domains = [[] for _ in range(n)]
                for stem, d in mapping.items():
                    self.domains[int(d)].append(str(stem))
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
