"""Mesh / sharding helpers (data-parallel first; spatial sharding optional)."""

from .mesh import make_mesh, replicate_tree, shard_batch, shard_step  # noqa: F401
