"""Scene layer: materials registry + render-scene assembly
(ref: impact_scene, impact_material, impact_voxel voxel_types)."""

from . import assembly, controller, graph, materials, mesh
from .assembly import StaticGeometry, build_render_scene, ground_plane_geometry
from .materials import VoxelTypeRegistry, default_registry, make_voxel_type_registry

__all__ = [
    "assembly",
    "materials",
    "mesh",
    "graph",
    "controller",
    "StaticGeometry",
    "build_render_scene",
    "ground_plane_geometry",
    "VoxelTypeRegistry",
    "default_registry",
    "make_voxel_type_registry",
]
