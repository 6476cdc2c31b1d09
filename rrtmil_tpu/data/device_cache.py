"""HBM-resident bag cache: pay host->device transfer once, then serve bags
from device memory at HBM bandwidth.

Why this exists: on this framework's target topology the device step is
~3-5 ms/slide while streaming a bf16 bag from host costs ~13 ms/slide of
pure host->device bandwidth (and 3-10x that through a remote-attached
tunnel), so a disk->device pipeline can never be device-bound no matter how
parallel the host side is.  WSI MIL datasets are small enough to live in
HBM: Camelyon16-R50 is ~400 bags x ~8k patches x 1024 bf16 features
~= 6.5 GB against 16 GB/chip -- so the TPU-native answer is to keep the
padded bags resident on device after their first epoch and rebuild batches
with device-side concatenation (~MS per step) instead of re-transferring
~150 MB per step.  The reference's --persistence flag (Datasets/dataset.py)
caches decoded bags in host RAM; this is that idea moved to the right side
of the interconnect.

Entries are keyed (dataset identity, bag index) and store the bag already
padded to its own bucket length in the transfer dtype, plus its mask row
and label -- exactly the per-slide slices a bucket-grouped batch
concatenates.  A byte budget caps HBM use; once full, later bags simply
stay uncached (hybrid streaming), so an over-budget dataset degrades to
the cold path rather than OOMing the chip.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

# (x (1, L, D) device, mask (1, L) device, label (1,) device, BucketSpec)
Entry = Tuple[Any, Any, Any, Any]


class DeviceBagCache:
    def __init__(self, budget_bytes: int):
        self.budget = int(budget_bytes)
        self.used = 0
        self.hits = 0
        self.misses = 0
        self._entries: Dict[Tuple[int, int], Entry] = {}
        # strong refs so a dataset's id() cannot be recycled by a new object
        # while its entries are alive
        self._datasets: Dict[int, Any] = {}

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def full(self) -> bool:
        return self.used >= self.budget

    def get(self, dataset, index: int) -> Optional[Entry]:
        e = self._entries.get((id(dataset), index))
        if e is None:
            self.misses += 1
            return None
        self.hits += 1
        return e

    def put(self, dataset, index: int, x, mask, label, spec) -> bool:
        nbytes = x.nbytes + mask.nbytes + label.nbytes
        if self.used + nbytes > self.budget:
            return False
        key = (id(dataset), index)
        if key not in self._entries:
            self._datasets[id(dataset)] = dataset
            self._entries[key] = (x, mask, label, spec)
            self.used += nbytes
        return True

    def drop_dataset(self, dataset) -> None:
        did = id(dataset)
        for key in [k for k in self._entries if k[0] == did]:
            x, mask, label, _ = self._entries.pop(key)
            self.used -= x.nbytes + mask.nbytes + label.nbytes
        self._datasets.pop(did, None)

    def clear(self) -> None:
        self._entries.clear()
        self._datasets.clear()
        self.used = 0
