"""TCGA survival dataset: quartile-binned discrete hazards, multi-WSI bags.

Mirrors reference Survival/datasets/TCGA_Survival.py:
  * `disc_label`: qcut the UNCENSORED event times into 4 quantile bins, then
    cut ALL rows by those bins widened to [min-eps, max+eps)
    (TCGA_Survival.py:52-63) -- implemented in numpy (pandas optional);
  * `get_split`: seeded (random.seed(1)) 80/20 split identical to the
    reference's random.sample ordering (TCGA_Survival.py:21-33);
  * multi-WSI cases concatenate ';'-separated feature files
    (TCGA_Survival.py:35-39).

CSV schema (same as the reference's): columns Study, ID, Event, Status, WSI.
"""
from __future__ import annotations

import csv
import os
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .datasets import load_feature_file


def quantile_bins(event: np.ndarray, status: np.ndarray, n_bins: int = 4,
                  eps: float = 1e-6) -> np.ndarray:
    """The reference's qcut-then-cut labels (TCGA_Survival.py:52-61).
    Returns integer bin in [0, n_bins); rows that fall outside -> -1."""
    event = np.asarray(event, dtype=np.float64)
    uncensored = event[np.asarray(status) == 1]
    # pandas qcut uses linear-interpolated quantiles of the uncensored times
    qs = np.quantile(uncensored, np.linspace(0, 1, n_bins + 1))
    qs[-1] = event.max() + eps
    qs[0] = event.min() - eps
    # pd.cut(..., right=False): bins[i] <= x < bins[i+1]
    labels = np.searchsorted(qs, event, side="right") - 1
    labels[(event < qs[0]) | (event >= qs[-1])] = -1
    labels = np.clip(labels, -1, n_bins - 1)
    bad = ~np.isfinite(event)
    labels[bad] = -1
    return labels.astype(np.int64)


class SurvivalDataset:
    """Bags with (ID, features, event_time, censorship, label)."""

    def __init__(self, csv_file: str, folder: str = "plip",
                 root: Optional[str] = None, n_bins: int = 4):
        self.folder = folder
        self.root = root
        rows = []
        with open(csv_file) as f:
            reader = csv.DictReader(f)
            for row in reader:
                rows.append(row)
        self.ids = [r["ID"] for r in rows]
        self.events = np.array([float(r["Event"]) for r in rows])
        self.status = np.array([int(float(r["Status"])) for r in rows])
        self.wsi_paths = [r["WSI"] for r in rows]
        self.labels = quantile_bins(self.events, self.status, n_bins)
        # censorship: 1 if no event observed (TCGA_Survival.py:45)
        self.censorship = (self.status == 0).astype(np.int64)

    def __len__(self):
        return len(self.ids)

    def get_split(self, fold: int = 0, ratio: float = 0.2):
        """Reference-exact seeded split (TCGA_Survival.py:21-33)."""
        assert 0 <= fold <= 4
        rng = random.Random(1)
        sample_index = rng.sample(range(len(self)), len(self))
        num_split = round((len(self) - 1) * ratio)
        if fold < 1 / ratio - 1:
            val_split = sample_index[fold * num_split:(fold + 1) * num_split]
        else:
            val_split = sample_index[fold * num_split:]
        val_set = set(val_split)
        train_split = [i for i in sample_index if i not in val_set]
        return train_split, val_split

    def _resolve(self, path: str) -> List[str]:
        """Post-substitution on-disk paths for one CSV WSI entry (the raw
        string is rewritten before loading, so only the resolved form is a
        stable cache identity -- see data/device_cache.py)."""
        path = path.replace("resnet50", self.folder)
        out = []
        for p in path.split(";"):
            if self.root is not None and not os.path.isabs(p):
                p = os.path.join(self.root, p)
            out.append(p)
        return out

    def resolved_path(self, idx: int) -> str:
        return ";".join(self._resolve(self.wsi_paths[idx]))

    def read_wsi(self, path: str) -> np.ndarray:
        return np.concatenate([load_feature_file(p)
                               for p in self._resolve(path)], axis=0)

    def __getitem__(self, idx: int):
        return (self.ids[idx], self.read_wsi(self.wsi_paths[idx]),
                float(self.events[idx]), int(self.censorship[idx]),
                int(self.labels[idx]))


class ArraySurvivalDataset(SurvivalDataset):
    """In-memory survival bags for tests/synthetic benchmarks."""

    def __init__(self, bags: Sequence[np.ndarray], events: Sequence[float],
                 status: Sequence[int], n_bins: int = 4):
        self._bags = [np.asarray(b, np.float32) for b in bags]
        self.ids = [f"case_{i}" for i in range(len(bags))]
        self.wsi_paths = [f"mem://{i}" for i in range(len(bags))]
        self.events = np.asarray(events, np.float64)
        self.status = np.asarray(status, np.int64)
        self.labels = quantile_bins(self.events, self.status, n_bins)
        self.censorship = (self.status == 0).astype(np.int64)

    def resolved_path(self, idx: int) -> str:
        return self.wsi_paths[idx]   # mem:// -> id-keyed in the cache

    def __getitem__(self, idx: int):
        return (self.ids[idx], self._bags[idx], float(self.events[idx]),
                int(self.censorship[idx]), int(self.labels[idx]))
