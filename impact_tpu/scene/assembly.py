"""Per-frame render-scene assembly.

Ref: impact_scene/src/lib.rs:160 ``buffer_model_instances_and_bound_lights`` —
the reference walks the scene graph, frustum-culls instances, and buffers
model-view transforms + instance features for the renderer. Here assembly
transforms each voxel object's compacted mesh by its rigid body's current
(and previous) pose, attaches material parameters from the voxel-type
registry, appends static geometry, and emits one flat RenderScene — a single
fused gather/transform program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..math import quaternion as quat
from ..render.pipeline import RenderScene
from ..voxel.mesh import CompactMesh
from ..voxel.object import VoxelObjectPool
from .materials import VoxelTypeRegistry, material_params_for_types


class StaticGeometry(NamedTuple):
    """Non-voxel geometry (ground planes, primitive meshes)."""

    vert_pos: jnp.ndarray  # f32[Vs,3] world
    vert_normal: jnp.ndarray  # f32[Vs,3]
    vert_albedo: jnp.ndarray  # f32[Vs,3]
    vert_f0: jnp.ndarray  # f32[Vs,3]
    vert_roughness: jnp.ndarray  # f32[Vs]
    vert_emissive: jnp.ndarray  # f32[Vs,3]
    vert_material: jnp.ndarray  # i32[Vs] voxel-type/texture layer, -1 untextured
    tri_indices: jnp.ndarray  # i32[Ts,3]
    tri_active: jnp.ndarray  # bool[Ts]


def empty_static_geometry() -> StaticGeometry:
    return StaticGeometry(
        vert_pos=jnp.zeros((0, 3), jnp.float32),
        vert_normal=jnp.zeros((0, 3), jnp.float32),
        vert_albedo=jnp.zeros((0, 3), jnp.float32),
        vert_f0=jnp.zeros((0, 3), jnp.float32),
        vert_roughness=jnp.zeros((0,), jnp.float32),
        vert_emissive=jnp.zeros((0, 3), jnp.float32),
        vert_material=jnp.zeros((0,), jnp.int32),
        tri_indices=jnp.zeros((0, 3), jnp.int32),
        tri_active=jnp.zeros((0,), bool),
    )


def ground_plane_geometry(
    y: float = 0.0, half_size: float = 100.0, albedo=(0.35, 0.35, 0.38),
    roughness: float = 0.9,
) -> StaticGeometry:
    v = jnp.asarray(
        [
            [-half_size, y, -half_size],
            [half_size, y, -half_size],
            [half_size, y, half_size],
            [-half_size, y, half_size],
        ],
        jnp.float32,
    )
    # winding chosen so the +y face survives the rasterizer's backface cull
    # (verified empirically: [0,2,1]/[0,3,2] covers from above)
    tris = jnp.asarray([[0, 2, 1], [0, 3, 2]], jnp.int32)
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (4, 1))
    alb = jnp.tile(jnp.asarray([albedo], jnp.float32), (4, 1))
    return StaticGeometry(
        vert_pos=v,
        vert_normal=n,
        vert_albedo=alb,
        vert_f0=jnp.full((4, 3), 0.04, jnp.float32),
        vert_roughness=jnp.full(4, roughness, jnp.float32),
        vert_emissive=jnp.zeros((4, 3), jnp.float32),
        vert_material=jnp.full((4,), -1, jnp.int32),
        tri_indices=tris,
        tri_active=jnp.ones(2, bool),
    )


def build_render_scene(
    pool: VoxelObjectPool,
    meshes: CompactMesh,  # batched over objects [O, ...]
    registry: VoxelTypeRegistry,
    body_position,  # f32[N,3] current
    body_orientation,  # f32[N,4]
    body_position_prev,  # f32[N,3] previous frame (motion vectors)
    body_orientation_prev,  # f32[N,4]
    static_geometry: StaticGeometry,
) -> RenderScene:
    """Flatten voxel meshes + static geometry into one RenderScene."""
    o, vc, _ = meshes.vert_pos.shape
    tc = meshes.tri_active.shape[1]

    # grid units → body frame
    local = (
        meshes.vert_pos * pool.voxel_extent[:, None, None]
        + pool.origin[:, None, :]
    )
    q = body_orientation[pool.body_index][:, None, :]
    x = body_position[pool.body_index][:, None, :]
    qp = body_orientation_prev[pool.body_index][:, None, :]
    xp = body_position_prev[pool.body_index][:, None, :]
    world = quat.rotate(q, local) + x
    world_prev = quat.rotate(qp, local) + xp
    normal_world = quat.rotate(q, meshes.vert_normal)

    # two-material vertex blend (ref: surface_nets.rs ≤7-material weights —
    # a boundary cell carries its top-2 types; interpolation across the
    # triangle smooths the transition per pixel)
    a1, f1, r1, e1 = material_params_for_types(registry, meshes.vert_type)
    a2, f2, r2, e2 = material_params_for_types(registry, meshes.vert_type2)
    b = meshes.vert_blend[..., None]
    albedo = a1 * (1 - b) + a2 * b
    f0 = f1 * (1 - b) + f2 * b
    roughness = r1 * (1 - b[..., 0]) + r2 * b[..., 0]
    emissive = e1 * (1 - b) + e2 * b

    vert_ok = meshes.vert_active & pool.alive[:, None]
    tri_ok = meshes.tri_active & pool.alive[:, None]

    # flatten with per-object vertex offsets
    offs = (jnp.arange(o, dtype=jnp.int32) * vc)[:, None, None]
    tri_idx_flat = (meshes.tri_indices + offs).reshape(o * tc, 3)

    vs = static_geometry.vert_pos.shape[0]
    base = o * vc
    return RenderScene(
        vert_pos=jnp.concatenate([world.reshape(-1, 3), static_geometry.vert_pos]),
        vert_pos_prev=jnp.concatenate(
            [world_prev.reshape(-1, 3), static_geometry.vert_pos]
        ),
        vert_normal=jnp.concatenate(
            [normal_world.reshape(-1, 3), static_geometry.vert_normal]
        ),
        vert_albedo=jnp.concatenate(
            [albedo.reshape(-1, 3), static_geometry.vert_albedo]
        ),
        vert_f0=jnp.concatenate([f0.reshape(-1, 3), static_geometry.vert_f0]),
        vert_roughness=jnp.concatenate(
            [roughness.reshape(-1), static_geometry.vert_roughness]
        ),
        vert_emissive=jnp.concatenate(
            [emissive.reshape(-1, 3), static_geometry.vert_emissive]
        ),
        vert_material=jnp.concatenate(
            [
                jnp.where(
                    (meshes.vert_active & pool.alive[:, None]).reshape(-1),
                    meshes.vert_type.reshape(-1),
                    -1,
                ),
                static_geometry.vert_material,
            ]
        ),
        tri_indices=jnp.concatenate(
            [tri_idx_flat, static_geometry.tri_indices + base]
        ),
        tri_active=jnp.concatenate(
            [tri_ok.reshape(-1), static_geometry.tri_active]
        ),
        tri_shadow=jnp.concatenate(
            [
                (tri_ok & pool.casts_shadows[:, None]).reshape(-1),
                jnp.ones_like(static_geometry.tri_active),
            ]
        ),
    )
