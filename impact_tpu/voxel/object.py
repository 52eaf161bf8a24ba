"""Voxel object pool: dense per-object SDF + type grids.

Ref: impact_voxel/src/object.rs — the reference stores chunked (16³) grids
with Void/Uniform/NonUniform compression and per-face adjacency bookkeeping.
TPU redesign (SURVEY.md §5 long-context analog): each object is a dense padded
``[G,G,G]`` grid in one pooled array ``[O,G,G,G]``; chunk compression becomes a
derived per-chunk occupancy code used to skip work inside kernels, and the
cross-chunk adjacency passes become plain array shifts (XLA fuses them).

Grid conventions:
  * voxel (i,j,k) center sits at ``(ijk + 0.5) * voxel_extent + origin`` in
    the object's body frame (origin chosen so the body origin is the COM).
  * ``sdf`` is in world length units, clamped to ±2 voxel extents during
    generation like the reference's i8 encoding cap (lib.rs:154-161).
  * ``vtype`` ≥ 0 is a material index into the voxel type registry; a voxel is
    part of the object iff sdf < 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import sdf as sdflib

CHUNK_SIZE = 16  # ref: object.rs:199-207

# chunk occupancy codes (ref: object.rs:75-101 Void/Uniform/NonUniform)
CHUNK_VOID = 0
CHUNK_UNIFORM = 1
CHUNK_NON_UNIFORM = 2


class VoxelObjectPool(NamedTuple):
    """[O]-pooled voxel objects with dense [G,G,G] grids."""

    alive: jnp.ndarray  # bool[O]
    body_index: jnp.ndarray  # i32[O] rigid body slot
    voxel_extent: jnp.ndarray  # f32[O]
    origin: jnp.ndarray  # f32[O,3] grid-origin offset in body frame
    sdf: jnp.ndarray  # f32[O,G,G,G] signed distance (world units)
    vtype: jnp.ndarray  # i32[O,G,G,G] material index
    mesh_dirty: jnp.ndarray  # bool[O] re-mesh needed
    split_pending: jnp.ndarray  # bool[O] connectivity re-check needed
    casts_shadows: jnp.ndarray  # bool[O] shadow-caster flag (scene flags +
    # distance-triggered rules, ref: impact_scene ModelInstanceFlags)
    # (mesh_dirty clears after remesh each step; split_pending persists until
    # CCL confirms the object is connected — the reference's incremental
    # split-detection bookkeeping, split_detection.rs)

    @property
    def n_objects(self) -> int:
        return self.alive.shape[0]

    @property
    def grid_size(self) -> int:
        return self.sdf.shape[-1]


def empty_voxel_object_pool(
    n_objects: int, grid_size: int, sdf_dtype=jnp.float32
) -> VoxelObjectPool:
    g = grid_size
    if sdf_dtype == jnp.int8:
        sdf0 = jnp.full((n_objects, g, g, g), 127, jnp.int8)
    else:
        sdf0 = jnp.full((n_objects, g, g, g), 1e3, jnp.float32)
    return VoxelObjectPool(
        alive=jnp.zeros(n_objects, bool),
        body_index=jnp.zeros(n_objects, jnp.int32),
        voxel_extent=jnp.ones(n_objects, jnp.float32),
        origin=jnp.zeros((n_objects, 3), jnp.float32),
        sdf=sdf0,
        vtype=jnp.zeros((n_objects, g, g, g), jnp.int32),
        mesh_dirty=jnp.zeros(n_objects, bool),
        split_pending=jnp.zeros(n_objects, bool),
        casts_shadows=jnp.ones(n_objects, bool),
    )


def grid_coords(grid_size: int):
    """Voxel center coordinates in grid units: [G,G,G,3] of (i+0.5, j+0.5, k+0.5)."""
    r = jnp.arange(grid_size, dtype=jnp.float32) + 0.5
    i, j, k = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([i, j, k], axis=-1)


def generate_sdf_grid(graph, grid_size: int, voxel_extent: float, center=True):
    """Evaluate an SDF graph over a grid. Returns (sdf [G,G,G], origin [3]).

    The grid is placed so its center coincides with the graph's origin when
    ``center`` (the usual case for generated objects, ref: generation.rs:40-66
    ChunkedVoxelGenerator evaluates the graph over each chunk's positions).
    SDF values are clamped to ±2 voxel extents, mirroring the reference's
    compact encoding saturation (lib.rs:154-161 VOID_LIMIT).
    """
    coords = grid_coords(grid_size) * voxel_extent
    origin = (
        -jnp.full(3, 0.5 * grid_size * voxel_extent)
        if center
        else jnp.zeros(3)
    )
    pts = coords + origin
    d = sdflib.evaluate(graph, pts)
    clamp = 2.0 * voxel_extent
    return jnp.clip(d, -clamp, clamp), origin


def occupancy(pool: VoxelObjectPool):
    """bool[O,G,G,G]: voxel belongs to the object."""
    return (pool.sdf < 0.0) & pool.alive[:, None, None, None]


def nonempty_counts(pool: VoxelObjectPool):
    return jnp.sum(occupancy(pool), axis=(1, 2, 3))


def chunk_codes(pool: VoxelObjectPool):
    """Per-chunk occupancy codes [O, G/16, G/16, G/16] — the derived analog of
    the reference's Void/Uniform/NonUniform chunk kinds (object.rs:75-101)."""
    g = pool.grid_size
    c = g // CHUNK_SIZE
    occ = occupancy(pool).reshape(
        pool.n_objects, c, CHUNK_SIZE, c, CHUNK_SIZE, c, CHUNK_SIZE
    )
    filled = jnp.sum(occ, axis=(2, 4, 6))
    total = CHUNK_SIZE**3
    return jnp.where(
        filled == 0, CHUNK_VOID, jnp.where(filled == total, CHUNK_UNIFORM, CHUNK_NON_UNIFORM)
    )


def occupied_chunk_counts(pool: VoxelObjectPool):
    """Per-object count of non-void 16³ chunks i32[O] — the occupancy the
    reference's chunked objects store explicitly (object.rs:75-101
    occupied_chunk_ranges); here derived for work accounting: per-step cost
    should track these counts (surface meshes, probes), not O·G³."""
    return jnp.sum(chunk_codes(pool) != CHUNK_VOID, axis=(1, 2, 3))


def surface_chunk_counts(pool: VoxelObjectPool):
    """Per-object count of NON-UNIFORM (surface-crossing) chunks i32[O] —
    the chunks the reference's incremental mesher visits (mesh.rs:360)."""
    return jnp.sum(chunk_codes(pool) == CHUNK_NON_UNIFORM, axis=(1, 2, 3))


def adjacency_masks(occ):
    """Per-voxel face adjacency (ref: lib.rs VoxelFlags HAS_ADJACENT_*):
    returns dict of 6 bool arrays, each [O,G,G,G], True where a non-empty
    neighbor exists in that direction."""
    out = {}
    for axis, name in ((1, "x"), (2, "y"), (3, "z")):
        # neighbor at -1 along axis (zero-padded at the boundary)
        dn = jnp.pad(occ, [(0, 0) if a != axis else (1, 0) for a in range(4)])
        dn = jnp.take(dn, jnp.arange(occ.shape[axis]), axis=axis)
        up = jnp.pad(occ, [(0, 0) if a != axis else (0, 1) for a in range(4)])
        up = jnp.take(up, jnp.arange(1, occ.shape[axis] + 1), axis=axis)
        out[f"{name}_dn"] = dn
        out[f"{name}_up"] = up
    return out


def surface_mask(occ):
    """Occupied voxels with at least one empty face neighbor — the probe-point
    candidates for voxel collision (ref: collidable.rs surface voxels)."""
    adj = adjacency_masks(occ)
    all_covered = (
        adj["x_dn"] & adj["x_up"] & adj["y_dn"] & adj["y_up"] & adj["z_dn"] & adj["z_up"]
    )
    return occ & ~all_covered


def voxel_positions_local(pool: VoxelObjectPool):
    """[O,G,G,G,3] voxel centers in each object's body frame."""
    coords = grid_coords(pool.grid_size)
    return (
        coords[None] * pool.voxel_extent[:, None, None, None, None]
        + pool.origin[:, None, None, None, :]
    )
