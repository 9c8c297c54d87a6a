"""Mesh / sharding helpers (data-parallel first; spatial sharding optional)
plus the multi-host (DCN) runtime wiring."""

from .distributed import (global_batch, host_local_batch_indices,  # noqa: F401
                          fetch_global, host_local_rows,
                          initialize, is_primary)
from .mesh import data_parallel_setup, make_mesh, place_batch, replicate_tree  # noqa: F401
