"""Voxel objects: SDF generation, meshing, deformation, collision
(ref: engine/crates/impact_voxel — the reference's core domain component)."""

from . import collision, inertia, interaction, mesh, object, sdf
from .object import VoxelObjectPool, empty_voxel_object_pool, generate_sdf_grid
from .mesh import SurfaceNetsMesh, surface_nets, surface_nets_batched

__all__ = [
    "sdf",
    "object",
    "mesh",
    "inertia",
    "collision",
    "interaction",
    "VoxelObjectPool",
    "empty_voxel_object_pool",
    "generate_sdf_grid",
    "SurfaceNetsMesh",
    "surface_nets",
    "surface_nets_batched",
]
