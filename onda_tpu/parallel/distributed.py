"""Multi-host (DCN) scaling: standard JAX distributed runtime + per-host data feed.

The reference is strictly single-process/single-GPU (SURVEY.md §2.16); the
TPU-native scale-out story is the standard JAX recipe:

* every host runs the same program and calls :func:`initialize` once —
  on Cloud TPU the coordinator/process ids are discovered automatically, on
  anything else they come from the usual env vars or explicit arguments;
* the mesh is built over ``jax.devices()`` (all chips of all hosts); the
  data-parallel axis therefore spans ICI within a slice and DCN across slices;
* each host loads only its own shard of every global batch
  (:func:`host_local_batch_indices` partitions the dataset the way torch's
  DistributedSampler would), and :func:`global_batch` assembles the host-local
  arrays into one globally-sharded ``jax.Array``
  (``jax.make_array_from_process_local_data``) — no host ever materializes the
  full global batch;
* the AdaptState stays replicated; GSPMD inserts gradient / prototype-moment
  all-reduces exactly as in the single-host case (onda_tpu/parallel/mesh.py).
  Prototype moments are order-independent per-class sums, so every replica
  holds identical prototypes with no extra synchronization protocol.

Checkpointing: orbax writes from process 0 only by default; restore is
collective. Host-side state that is NOT part of the jitted step (replay-buffer
contents, prediction dumps) is per-host by design — the replay buffer samples
per-host source data, matching the per-host loader split.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime (idempotent, single-host no-op).

    Multi-host is entered when (a) explicit arguments are passed, (b) the
    JAX_NUM_PROCESSES / JAX_COORDINATOR_ADDRESS env vars announce a cluster, or
    (c) ONDA_DISTRIBUTED=1 requests JAX's own cluster auto-detection (Cloud
    TPU pod metadata, SLURM, ...). Otherwise this is a no-op — calling
    jax.distributed.initialize unconditionally on a plain single host would
    fail or hang waiting for a coordinator. Call before any other JAX API, on
    every host.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        announced = os.environ.get("JAX_NUM_PROCESSES")
        has_cluster_env = (
            (announced is not None and int(announced) > 1)
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
        )
        if not has_cluster_env:
            if os.environ.get("ONDA_DISTRIBUTED", "0") == "1":
                jax.distributed.initialize()  # full auto-detection
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_batch_indices(n_samples: int, global_batch: int,
                             process_index: int | None = None,
                             process_count: int | None = None,
                             seed: int = 0, shuffle: bool = True):
    """Per-epoch sample indices for THIS host's slice of every global batch.

    All hosts use the same seed, so the permutation agrees everywhere; host p
    takes the p-th contiguous block of each global batch. Yields arrays of
    length ``global_batch // process_count`` (global_batch must divide evenly;
    the final partial global batch is dropped, matching the training loaders'
    drop_last)."""
    import jax

    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    local = global_batch // n
    order = np.random.default_rng(seed).permutation(n_samples) if shuffle else np.arange(n_samples)
    for start in range(0, n_samples - global_batch + 1, global_batch):
        block = order[start + p * local : start + (p + 1) * local]
        yield block


def global_batch(mesh, host_local_tree):
    """Assemble host-local batch arrays into global jax.Arrays sharded over the
    mesh's ``data`` axis (each host contributes only its local shard).

    Thin alias for the adapters' own sharded placement (mesh.place_batch) so
    the two paths cannot diverge — including its divisibility guard."""
    from .mesh import place_batch

    return place_batch(mesh, host_local_tree)


def is_primary() -> bool:
    """True on the process that should write host-side artifacts (pickles,
    prediction dumps, sample PNGs, metrics) — every logged quantity is global/
    replicated, so exactly one host persists it."""
    import jax

    return jax.process_index() == 0


def host_local_rows(arr):
    """This host's rows of a (possibly cross-process) batch-sharded array.

    Single host / fully-addressable input: plain np.asarray (bit-identical to
    the old behavior). Multi-host: concatenate the addressable shards along
    the leading (batch) axis in global order — the per-host slice of a global
    batch, for host-side consumers like the replay buffer whose inserts are
    per-host by design (see module docstring)."""
    import jax
    import numpy as np

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return _rows_from_shards(
            [(s.index, s.data) for s in arr.addressable_shards], arr.shape)
    return np.asarray(arr)


def _rows_from_shards(shards, shape):
    """Assemble (index, data) shards into this host's batch rows.

    Keyed by batch-axis start only, keeping the first shard per start — valid
    ONLY if no other axis is sharded, else the kept shard is a spatial/channel
    crop. Fails loudly on that unsupported combination instead of silently
    corrupting the replay buffer / sample renders."""
    by_start = {}
    for index, data in shards:
        for dim, sl in enumerate(index[1:], start=1):
            if (sl.start or 0) != 0 or (sl.stop is not None
                                        and sl.stop != shape[dim]):
                raise NotImplementedError(
                    "host_local_rows: array is sharded along non-batch "
                    f"axis {dim} across processes; multi-host combined "
                    "with spatial/model sharding of host-consumed batches "
                    "is not supported")
        by_start.setdefault(index[0].start or 0, data)
    return np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)], axis=0)


def fetch_global(arr):
    """Materialize a (possibly cross-process sharded) array as the FULL global
    numpy value on every host. Multi-host collective (all hosts must call);
    single host: plain np.asarray."""
    import jax
    import numpy as np

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)
