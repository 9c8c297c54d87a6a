"""Mesh / sharding helpers (data-parallel first; spatial sharding optional)
plus the multi-host (DCN) runtime wiring."""

from .distributed import global_batch, host_local_batch_indices, initialize  # noqa: F401
from .mesh import make_mesh, replicate_tree, shard_batch, shard_step  # noqa: F401
