"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.16); scaling here is
TPU-native SPMD: a 1-D ``data`` mesh shards every batch axis, the whole
AdaptState is replicated, and GSPMD inserts the collectives —

* gradients: the loss is a mean over the sharded batch → psum over ICI;
* prototype moments: `class_moments` reduces the sharded pixel axis into a
  replicated (C, F) tensor → all-reduce, so every replica applies the identical
  `ma`/`append` update (order-independent sums, SURVEY.md §5.8);
* monitor confidences: batch means → pmean.

No hand-written collectives are needed or justified for a 45 M-param CNN; an
optional ``spatial`` mesh axis shards H for >1024² inputs (XLA handles conv halo
exchange).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes: Sequence[str] = ("data",),
              shape: Sequence[int] | None = None) -> Mesh:
    """Build a device mesh. Default: 1-D over `data` (extra axes size 1).

    Pass `shape` for a real multi-axis mesh, e.g. shape=(2, 4),
    axes=("data", "spatial") — batch sharded 2-way, image H sharded 4-way."""
    devices = jax.devices()
    if shape is not None:
        n = int(np.prod(shape))
        return Mesh(np.asarray(devices[:n]).reshape(tuple(shape)), axes)
    if n_devices is not None:
        devices = devices[:n_devices]
    mesh_shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(np.asarray(devices).reshape(mesh_shape), axes)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree over every device of the mesh.

    Single-process: plain device_put. Multi-host: device_put rejects
    non-addressable shardings, so each process contributes its (identical)
    host copy via jax.make_array_from_process_local_data — every host must
    hold the same values (true for seeded init + imported checkpoints).
    PRNG key arrays round-trip through key_data/wrap_key_data (numpy can't
    hold typed keys)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() <= 1:
        return jax.device_put(tree, sharding)
    import jax.numpy as jnp
    import numpy as _np

    def rep(x):
        if not hasattr(x, "ndim"):
            return x
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = _np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_process_local_data(sharding, data)
            return jax.random.wrap_key_data(g, impl=impl)
        return jax.make_array_from_process_local_data(sharding, _np.asarray(x))

    return jax.tree.map(rep, tree)


def data_parallel_mesh(option=None, batch_size: int | None = None) -> Mesh | None:
    """Resolve the driver's data-parallel setting into a mesh (or None).

    option semantics (cfg.OTHERS.DATA_PARALLEL): unset/None → auto: use all
    local devices when there is more than one; False → off; True → all
    devices; int n → first n devices. In auto mode the mesh is capped to the
    largest device count that divides the batch size (sharding needs even
    splits); an explicit request that doesn't divide raises."""
    if option is False:
        return None
    n = len(jax.devices())
    if option is None or option is True:
        want = n
        if batch_size:
            while want > 1 and batch_size % want:
                want -= 1
        if option is True and want != n:
            # an explicit all-devices request must not silently idle chips the
            # way auto's divisor capping may; demand a clean fit like the
            # int option does
            raise ValueError(
                f"DATA_PARALLEL=True: BATCH_SIZE={batch_size} does not divide "
                f"the {n} visible devices"
            )
        if want != n and jax.process_count() > 1:
            # a device-subset mesh would exclude some hosts' chips entirely —
            # their processes could not contribute shards; demand a clean fit
            raise ValueError(
                f"BATCH_SIZE={batch_size} does not divide the {n} global "
                "devices of this multi-host run"
            )
    else:
        want = int(option)
        if batch_size and want > 1 and batch_size % want:
            raise ValueError(
                f"DATA_PARALLEL={want} does not divide BATCH_SIZE={batch_size}"
            )
        if jax.process_count() > 1 and want != n:
            raise ValueError(
                f"DATA_PARALLEL={want} must equal the {n} global devices in a "
                "multi-host run (subset meshes exclude some hosts' chips)"
            )
    if want <= 1 or n <= 1:
        return None
    return make_mesh(min(want, n))


def tensor_parallel_shardings(mesh: Mesh, tree, axis: str = "model",
                              min_dim: int = 128):
    """Channelwise tensor-parallel sharding rule (SURVEY.md §2.16: model dims
    exposed via pjit sharding rules).

    Shards the LAST (channel) dimension of every leaf whose channel count is
    ≥ `min_dim` and divisible by the `axis` size — conv kernels on C_out, the
    matching BN scale/bias/stat vectors on C, prototypes on F — and replicates
    everything else (class-sized heads, scalars, monitor windows, PRNG keys).
    GSPMD then propagates: activations shard on channels, contractions over a
    sharded C_in become psums over the `model` axis. Not *needed* for a 45 M
    CNN (the reference is single-GPU), but the annotation makes TP a real,
    tested capability rather than a documentation claim."""
    size = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def one(x):
        shape = getattr(x, "shape", ())
        if (
            shape
            and shape[-1] >= min_dim
            and shape[-1] % size == 0
            and not jax.dtypes.issubdtype(getattr(x, "dtype", np.float32),
                                          jax.dtypes.prng_key)
        ):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
        return rep

    return jax.tree.map(one, tree)


def data_parallel_setup(option, batch_size: int, *trees, tensor_parallel=None):
    """One-stop adapter wiring: resolve cfg.OTHERS.DATA_PARALLEL into a mesh,
    replicate the given state trees over it, and return a `place(arr, axis)`
    callable for batch inputs. Shared by every adapter (proto_online, advent,
    proto_advent's discriminator state, segmentation).

    `tensor_parallel` (cfg.OTHERS.TENSOR_PARALLEL, int ≥ 2): build a 2-D
    (data × model) mesh instead — batch axes shard over `data`, model channel
    dims over `model` (see :func:`tensor_parallel_shardings`). Single-process
    only (multi-host TP would need per-host channel shards in every loader)."""
    if tensor_parallel is True:
        raise ValueError("TENSOR_PARALLEL must be an integer ≥ 2 (the number "
                         "of model-axis shards), not a boolean")
    tp = 0 if tensor_parallel in (None, False) else int(tensor_parallel)
    if tp > 1:
        if jax.process_count() > 1:
            raise ValueError("TENSOR_PARALLEL is single-process only; combine "
                             "multi-host with DATA_PARALLEL instead")
        n = len(jax.devices())
        if n % tp:
            raise ValueError(f"TENSOR_PARALLEL={tp} does not divide the {n} "
                             "visible devices")
        dp = n // tp
        while dp > 1 and batch_size % dp:  # data axis needs even batch splits
            dp -= 1
        mesh = make_mesh(shape=(dp, tp), axes=("data", "model"))
        placed = tuple(
            jax.device_put(t, tensor_parallel_shardings(mesh, t)) for t in trees
        )
        place = lambda arr, axis=0: place_batch(mesh, arr, batch_axis=axis)
        return (mesh, place) + placed
    mesh = data_parallel_mesh(option, batch_size=batch_size)
    placed = tuple(
        replicate_tree(mesh, t) if mesh is not None else t for t in trees
    )
    place = lambda arr, axis=0: place_batch(mesh, arr, batch_axis=axis)
    return (mesh, place) + placed


def place_batch(mesh: Mesh | None, tree, batch_axis: int = 0):
    """Put host batch arrays on device: single-device `jnp.asarray` when mesh is
    None; batch axis sharded over `data` otherwise. Across hosts each process
    contributes only its local shard (jax.make_array_from_process_local_data)."""
    import jax.numpy as jnp

    if mesh is None:
        return jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "ndim") else x, tree
        )
    multihost = jax.process_count() > 1
    # only the "data" axis shards the batch; a 2-D (data × model) mesh must
    # not demand divisibility by the model-axis size too
    data_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", mesh.size)

    def place(x):
        if not hasattr(x, "ndim") or x.ndim <= batch_axis:
            return x
        spec = [None] * x.ndim
        # x is host-local: the implied global batch is local × process_count
        global_dim = x.shape[batch_axis] * (jax.process_count() if multihost else 1)
        if global_dim % data_size == 0:
            spec[batch_axis] = "data"
        elif multihost:
            # replicating host-LOCAL shards would hand every process a
            # different "global" value (silent corruption) — refuse loudly;
            # the CLI's per-host loader equalization prevents this upstream
            raise ValueError(
                f"global batch dim {global_dim} not divisible by the data-axis "
                f"size {data_size} in a multi-host run"
            )
        # else single host: replicate (odd-sized batch, e.g. a final partial one)
        sharding = NamedSharding(mesh, P(*spec))
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(place, tree)
