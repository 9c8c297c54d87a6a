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


def make_mesh(n_devices: int | None = None, axes: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axes)


def shard_batch(mesh: Mesh, tree, spatial: bool = False):
    """Place batch arrays with the leading axis sharded over `data`.

    With `spatial=True` and a 2-D mesh, image H is additionally sharded over
    the `spatial` axis (for very large inputs)."""

    def place(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        spec = [None] * x.ndim
        spec[0] = "data"
        if spatial and x.ndim >= 3 and "spatial" in mesh.axis_names:
            spec[1] = "spatial"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, tree)


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_step(mesh: Mesh, step_fn, donate_state: bool = True):
    """jit a `(state, *batches) -> (state, logs)` step for the mesh: replicated
    state in/out, batch-sharded inputs; GSPMD does the rest."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))

    def spec_for_args(state, *batches):
        return (replicated,) + tuple(
            jax.tree.map(lambda _: batch_sharded, b) for b in batches
        )

    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate_state else (),
    )
