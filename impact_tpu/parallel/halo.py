"""Explicit halo exchange for spatially sharded voxel grids.

SURVEY.md §5: the reference scales its long dimension (voxel count) by chunk
decomposition with cross-chunk adjacency passes; the TPU analog is grids
sharded along a spatial axis with 1-voxel halo exchange via collective
permutes inside ``shard_map`` — the CP/ring slot of this framework. XLA
inserts these automatically for sliced stencils, but the explicit form here
is the building block for Pallas kernels that overlap the exchange with
interior compute (pallas_guide.md ring patterns).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def exchange_halo_x(local, axis_name: str = "space"):
    """Given a local grid block [..., Gx_local, :, :], return (left, right)
    1-plane halos received from the neighbors along ``axis_name`` (closed
    boundary: edge shards receive a +inf plane, matching empty space)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    send_right = local[..., -1:, :, :]
    send_left = local[..., :1, :, :]
    # receive from left neighbor (their rightmost plane)
    from_left = jax.lax.ppermute(
        send_right, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = jax.lax.ppermute(
        send_left, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    empty = jnp.full_like(send_left, jnp.inf)
    from_left = jnp.where(idx == 0, empty, from_left)
    from_right = jnp.where(idx == n - 1, empty, from_right)
    return from_left, from_right


def sharded_grid_spec(mesh: Mesh):
    """PartitionSpec for [O, Gx, Gy, Gz] voxel grids on the standard mesh."""
    return P("objects", "space")


def make_sharded_min_filter_x(mesh: Mesh):
    """A demonstration sharded stencil: 3-point min filter along x over a
    spatially sharded grid, with explicit halo exchange. This is the
    communication pattern of the sharded CCL label propagation
    (SURVEY.md §5 split detection at pod scale)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("objects", "space"),),
        out_specs=P("objects", "space"),
    )
    def min_filter(grid):  # local block [O_l, Gx_l, Gy, Gz]
        left, right = exchange_halo_x(grid, "space")
        padded = jnp.concatenate([left, grid, right], axis=-3)
        return jnp.minimum(
            jnp.minimum(padded[..., :-2, :, :], padded[..., 1:-1, :, :]),
            padded[..., 2:, :, :],
        )

    return min_filter
