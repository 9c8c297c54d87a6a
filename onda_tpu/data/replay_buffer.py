"""In-RAM source replay buffer.

The reference materializes the whole buffer as a deque of samples (~0.5 MB each,
reference framework/dataset/buffer_db.py:32-104) and mutates it online with
pseudo-labeled target frames. Same capabilities here, as a host-side ring:

* endless batch iterator with reshuffle-per-cycle (reference buffer_db.py:55-64)
* ``sequential()`` single-sample batches for prototype bootstrap (reference :75-77)
* eviction policies "queue" (FIFO) and "random" (reference :79-87)
* ``add_from_batch`` for online insertions; the stored label comes from the
  upsampled soft predictions' argmax (reference methods/prototypes.py:453-464).
  The reference stores that at input resolution where the training path expects
  the 1/8-grid `label_res` — a latent shape bug; we store BOTH resolutions so
  replayed samples train correctly (documented deviation).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .loader import collate


class ReplayBuffer:
    def __init__(self, dataset, batch_size: int, seed: int = 123, domain: str = "source"):
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.buffer: deque = deque()
        for i in range(len(dataset)):
            sample = dict(dataset[i])
            sample["domain"] = domain
            # every sample carries stored_predictions from the start (reference
            # buffer_db.py:43 keeps buffer keys uniform so batches collate after
            # online insertions mix domains). The reference initializes it to
            # the INPUT-res label its own loss cannot consume; we use the
            # 1/8-grid label_res the loss actually trains on (deviation #1).
            if "stored_predictions" not in sample and "label_res" in sample:
                sample["stored_predictions"] = np.asarray(sample["label_res"])
            self.buffer.append(sample)
        # insertion key schema (reference type_dict, buffer_db.py:46-49):
        # add_from_batch copies exactly these, keeping samples collate-uniform
        self.keys = tuple(self.buffer[0].keys()) if self.buffer else ()
        self.pos = 0
        self.permutation = self.rng.permutation(len(self.buffer))

    def __len__(self):
        return len(self.buffer)

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        items = []
        for _ in range(self.batch_size):
            items.append(self.buffer[self.permutation[self.pos]])
            self.pos += 1
            if self.pos >= len(self.buffer):
                self.pos = 0
                self.permutation = self.rng.permutation(len(self.buffer))
        return collate(items)

    def sequential(self):
        """One-sample batches in storage order (prototype bootstrap)."""
        for sample in list(self.buffer):
            yield collate([sample])

    def add(self, item: dict, policy: str = "queue") -> None:
        if policy == "queue":
            self.buffer.popleft()
            self.buffer.append(item)
        elif policy == "random":
            self.buffer[int(self.rng.integers(len(self.buffer)))] = item
        else:
            raise NotImplementedError(f"eviction policy {policy!r}")

    def add_from_batch(self, batch: dict, index: int, domain: str = "target") -> None:
        sample = {}
        for key in self.keys:  # the init-time schema: collate-uniform samples
            if key == "domain":
                continue
            entry = batch[key][index]
            sample[key] = np.asarray(entry) if not isinstance(entry, str) else entry
        sample["domain"] = domain
        self.add(sample)

    def nbytes(self) -> int:
        total = 0
        for sample in self.buffer:
            for v in sample.values():
                if isinstance(v, np.ndarray):
                    total += v.nbytes
        return total
