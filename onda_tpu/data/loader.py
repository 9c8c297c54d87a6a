"""Batched loading with background prefetch and async host→device transfer.

The reference leans on torch DataLoader worker *processes* (reference
train_ouda.py:129-135, NUM_WORKERS 7); here the host side is a small thread pool
(PIL decode and numpy release the GIL) feeding a bounded queue, and a
``DeviceFeeder`` keeps the next batch already transferred to the TPU while the
current step runs — double buffering so the jitted step never waits on the host
(SURVEY.md §7.3 item 6).

Static shapes: training loaders drop the final partial batch (shape changes would
force XLA recompiles); evaluation loaders pad it by repeating the last sample and
report ``valid`` counts so metrics ignore the padding.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

_STACK_KEYS = ("image", "label", "label_res", "label_raw", "soft_predictions", "stored_predictions")


def collate(samples: list[dict]) -> dict:
    """Stack array fields, keep everything else as lists (torch default_collate-ish)."""
    keys0 = set(samples[0])
    for i, s in enumerate(samples[1:], 1):
        ragged = keys0.symmetric_difference(s) & set(_STACK_KEYS)
        if ragged:
            # e.g. stored soft_predictions .npy present for only part of the
            # batch — the reference's default_collate dies on the same input
            # with a bare KeyError; say what actually went wrong
            raise ValueError(
                f"inconsistent batch: samples 0 and {i} disagree on array "
                f"field(s) {sorted(ragged)} (present for some samples only)"
            )
    batch = {}
    for key in samples[0].keys():
        vals = [s[key] for s in samples]
        if key in _STACK_KEYS:
            arr = np.stack(vals)
            if arr.dtype == np.uint8 and key != "image":
                arr = arr.astype(np.int32)
            batch[key] = arr
        else:
            batch[key] = vals
    return batch


class Loader:
    """Shuffling, prefetching batch iterator over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 123,
        drop_last: bool = False,
        pad_last: bool = False,
        num_threads: int = 2,
        prefetch: int = 3,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self.rng.permutation(order)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_last:
                    pad = np.full(self.batch_size - len(chunk), chunk[-1])
                    yield np.concatenate([chunk, pad]), len(chunk)
                    return
            yield chunk, len(chunk)

    def __iter__(self) -> Iterator[dict]:
        work: "queue.Queue" = queue.Queue()
        batches = list(self._index_batches())
        for i, item in enumerate(batches):
            work.put((i, item))
        results: dict[int, dict] = {}
        cond = threading.Condition()
        # bound how far workers run ahead of consumption — without this the
        # whole epoch materializes in RAM (GBs at full resolution)
        budget = threading.Semaphore(max(self.prefetch, self.num_threads))

        stop = threading.Event()

        def worker():
            while not stop.is_set():
                # acquire BEFORE pulling: every pulled-but-unconsumed batch then
                # holds a permit, so the lowest outstanding index is always in
                # production or stored — no permit-starvation deadlock
                budget.acquire()
                if stop.is_set():
                    return
                try:
                    i, (idxs, valid) = work.get_nowait()
                except queue.Empty:
                    budget.release()
                    return
                try:
                    batch = None
                    if hasattr(self.dataset, "prepare_batch"):
                        # native pipelined executor: whole-batch prep in C++,
                        # GIL released while this thread waits on the job
                        batch = self.dataset.prepare_batch(idxs)
                    if batch is None:
                        batch = collate([self.dataset[int(j)] for j in idxs])
                    batch["valid"] = valid
                except BaseException as exc:  # noqa: BLE001 — propagate to consumer
                    # a silently-dead worker would leave the consumer parked in
                    # cond.wait() forever (and leak this permit); hand the
                    # exception over instead so the epoch fails loudly
                    batch = exc
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_threads)]
        for t in threads:
            t.start()

        try:
            for next_i in range(len(batches)):
                with cond:
                    while next_i not in results:
                        cond.wait()
                    batch = results.pop(next_i)
                budget.release()
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            # consumer may abandon mid-epoch (cycle() + fixed step count):
            # unblock any worker parked on budget.acquire so threads exit
            stop.set()
            for _ in threads:
                budget.release()


def cycle(loader) -> Iterator[dict]:
    """Endless iterator, re-iterating (and re-shuffling) each epoch —
    the reference's try/except StopIteration recycle (reference prototypes.py:491-505)."""
    while True:
        yield from loader


class DeviceFeeder:
    """Keep the next batch already on device while the current step runs.

    `put` overrides the transfer (e.g. sharded placement over a mesh,
    onda_tpu/parallel/mesh.py::place_batch); default is a plain device_put."""

    def __init__(self, iterator: Iterator[dict], device_keys=("image", "label", "label_res"),
                 put=None):
        import jax

        self._put_one = put if put is not None else jax.device_put
        self.iterator = iter(iterator)
        self.device_keys = device_keys
        self._next = None
        self._advance()

    def _put(self, batch):
        out = dict(batch)
        for key in self.device_keys:
            if key in out and isinstance(out[key], np.ndarray):
                out[key] = self._put_one(out[key])
        return out

    def _advance(self):
        try:
            self._next = self._put(next(self.iterator))
        except StopIteration:
            self._next = None

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        if self._next is None:
            raise StopIteration
        current = self._next
        self._advance()  # start next H2D while caller computes
        return current
