"""Voxel-type registry and material parameter mapping.

Ref: impact_voxel/src/voxel_types.rs:32-51 — ``VoxelTypeRegistry`` built from
RON ``VoxelTypeSpecification``s (name, mass_density, color,
specular_reflectance, roughness, metalness, emissive_luminance, texture set)
— and impact_material's microfacet parameter model (setup/physical.rs:36-214).

The registry is arrays indexed by voxel type; the fixed property uniform the
reference uploads (gpu_resource.rs VoxelMaterialGPUResources) corresponds to
these arrays living in HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from ..utils import ron


class VoxelTypeRegistry(NamedTuple):
    n_types: int
    mass_density: jnp.ndarray  # f32[T]
    color: jnp.ndarray  # f32[T,3] linear RGB
    specular_reflectance: jnp.ndarray  # f32[T]
    roughness: jnp.ndarray  # f32[T]
    metalness: jnp.ndarray  # f32[T]
    emissive_luminance: jnp.ndarray  # f32[T]
    names: tuple


def make_voxel_type_registry(specs: Sequence[dict]) -> VoxelTypeRegistry:
    """specs: list of dicts with the reference's VoxelTypeSpecification keys."""
    def col(key, default):
        return jnp.asarray(
            [s.get(key, default) for s in specs], jnp.float32
        )

    colors = jnp.asarray(
        [tuple(s.get("color", (0.5, 0.5, 0.5))) for s in specs], jnp.float32
    )
    return VoxelTypeRegistry(
        n_types=len(specs),
        mass_density=col("mass_density", 1000.0),
        color=colors,
        specular_reflectance=col("specular_reflectance", 0.04),
        roughness=col("roughness", 0.8),
        metalness=col("metalness", 0.0),
        emissive_luminance=col("emissive_luminance", 0.0),
        names=tuple(s.get("name", f"type{i}") for i, s in enumerate(specs)),
    )


def registry_from_ron_file(path) -> VoxelTypeRegistry:
    """Load the reference's voxel-types RON format
    (ref: voxel_types.rs VoxelTypeSpecification list)."""
    data = ron.load(path)
    if isinstance(data, dict) and "voxel_types" in data:
        data = data["voxel_types"]
    specs = []
    for entry in data:
        if isinstance(entry, ron.Variant):
            entry = entry.fields or {}
        specs.append(dict(entry))
    return make_voxel_type_registry(specs)


def default_registry() -> VoxelTypeRegistry:
    return make_voxel_type_registry(
        [
            {"name": "Rock", "mass_density": 2500.0, "color": (0.45, 0.38, 0.32),
             "roughness": 0.85},
            {"name": "Metal", "mass_density": 7800.0, "color": (0.7, 0.7, 0.72),
             "metalness": 1.0, "roughness": 0.4},
            {"name": "Ice", "mass_density": 900.0, "color": (0.7, 0.85, 0.95),
             "roughness": 0.2, "specular_reflectance": 0.08},
        ]
    )


def material_corner_table(registry: VoxelTypeRegistry) -> jnp.ndarray:
    """Packed per-type material rows f32[T,10] = (albedo 3, f0 3, roughness 1,
    emissive 3) — the lookup table ``bake_mesh_materials`` blends at REMESH
    time so the per-frame scene assembly does zero material gathers (six
    [O·Tc]-row table gathers measured ~70 ms/frame at bench scale,
    devtools/probe_image_ops.py)."""
    metal = registry.metalness[:, None]
    spec = registry.specular_reflectance[:, None]
    albedo = registry.color * (1.0 - metal)
    f0 = spec * (1.0 - metal) + registry.color * metal
    emissive = registry.color * registry.emissive_luminance[:, None]
    return jnp.concatenate(
        [albedo, f0, registry.roughness[:, None], emissive], axis=-1
    )


def material_params_for_types(registry: VoxelTypeRegistry, vtypes):
    """vtypes i32[...] → (albedo [...,3], f0 [...,3], roughness [...],
    emissive [...,3]) following the standard metalness workflow the
    reference's shading templates use."""
    t = jnp.clip(vtypes, 0, registry.n_types - 1)
    color = registry.color[t]
    metal = registry.metalness[t][..., None]
    spec = registry.specular_reflectance[t][..., None]
    albedo = color * (1.0 - metal)
    f0 = spec * (1.0 - metal) + color * metal
    roughness = registry.roughness[t]
    emissive = color * registry.emissive_luminance[t][..., None]
    return albedo, f0, roughness, emissive
