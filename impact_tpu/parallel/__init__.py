"""Multi-chip scale-out: device meshes, state sharding, halo exchange.

No reference analog (SURVEY.md §2.6 — the reference is single-process);
this is the TPU-native scale-out layer: `jax.sharding.Mesh` over ICI/DCN,
pool-axis sharding for objects/bodies (the DP slot), spatial grid sharding
with halo exchange (the SP/CP slot), and XLA collectives for reductions.
"""

from .mesh import make_device_mesh, shard_sim_state, replicate
from .halo import exchange_halo_x, sharded_grid_spec

__all__ = [
    "make_device_mesh",
    "shard_sim_state",
    "replicate",
    "exchange_halo_x",
    "sharded_grid_spec",
]
