"""Inertial properties of voxel objects from their grids.

Ref: impact_voxel/src/object/inertia.rs — the reference maintains running
mass/moment/product sums per voxel with incremental updates on voxel
add/remove/transfer. On TPU the full reduction over the dense grid is a single
fused pass, cheap enough to recompute whenever the grid changes (absorption,
fracture), which replaces the incremental bookkeeping entirely.
"""

from __future__ import annotations

import jax.numpy as jnp

from .object import VoxelObjectPool, occupancy, voxel_positions_local


def voxel_masses(pool: VoxelObjectPool, type_densities):
    """[O,G,G,G] per-voxel masses. ``type_densities`` f32[T] indexed by vtype."""
    occ = occupancy(pool)
    density = type_densities[jnp.clip(pool.vtype, 0, type_densities.shape[0] - 1)]
    vol = (pool.voxel_extent**3)[:, None, None, None]
    return jnp.where(occ, density * vol, 0.0)


def inertial_properties(pool: VoxelObjectPool, type_densities):
    """(mass [O], com [O,3] body frame, inertia [O,3,3] about COM).

    Point-mass-per-voxel sums, matching the reference's running-sum scheme
    (inertia.rs:20-25) plus the voxel self-inertia term (m·h²/6 per cube).
    """
    m = voxel_masses(pool, type_densities)
    pos = voxel_positions_local(pool)
    mass = jnp.sum(m, axis=(1, 2, 3))
    safe_mass = jnp.maximum(mass, 1e-12)
    com = jnp.einsum("oijk,oijkc->oc", m, pos) / safe_mass[:, None]

    rel = pos - com[:, None, None, None, :]
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    ixx = jnp.sum(m * (y * y + z * z), axis=(1, 2, 3))
    iyy = jnp.sum(m * (x * x + z * z), axis=(1, 2, 3))
    izz = jnp.sum(m * (x * x + y * y), axis=(1, 2, 3))
    ixy = -jnp.sum(m * x * y, axis=(1, 2, 3))
    ixz = -jnp.sum(m * x * z, axis=(1, 2, 3))
    iyz = -jnp.sum(m * y * z, axis=(1, 2, 3))
    # each voxel's own cube inertia: (1/6) m h² per diagonal entry
    h2 = pool.voxel_extent**2
    self_term = jnp.sum(m, axis=(1, 2, 3)) * h2 / 6.0
    inertia = jnp.stack(
        [
            jnp.stack([ixx + self_term, ixy, ixz], -1),
            jnp.stack([ixy, iyy + self_term, iyz], -1),
            jnp.stack([ixz, iyz, izz + self_term], -1),
        ],
        axis=-2,
    )
    return mass, com, inertia
