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


class MeshInstancePool(NamedTuple):
    """Renderable mesh-model entities with per-entity materials.

    Ref: impact_model/src/lib.rs:25-50 (per-model instance buffers with
    model-view transforms incl. previous frame) + impact_material
    setup/physical.rs:36-214 (UniformColor/SpecularReflectance/Roughness/
    Metalness/EmissiveLuminance components). TPU shape: fixed-capacity slot
    pool of local-space meshes (ModelTransform scale+offset folded in) posed
    per frame by either a rigid body (``body_index`` >= 0 — a moving mesh
    entity) or a static reference frame.
    """

    vert_pos: jnp.ndarray  # f32[M,Vm,3] local (model transform folded)
    vert_normal: jnp.ndarray  # f32[M,Vm,3]
    vert_active: jnp.ndarray  # bool[M,Vm]
    tri_indices: jnp.ndarray  # i32[M,Tm,3]
    tri_active: jnp.ndarray  # bool[M,Tm]
    albedo: jnp.ndarray  # f32[M,3]
    f0: jnp.ndarray  # f32[M,3]
    roughness: jnp.ndarray  # f32[M]
    emissive: jnp.ndarray  # f32[M,3]
    body_index: jnp.ndarray  # i32[M] rigid body slot, -1 = static pose
    position: jnp.ndarray  # f32[M,3] static pose fallback
    orientation: jnp.ndarray  # f32[M,4]
    alive: jnp.ndarray  # bool[M]
    casts_shadows: jnp.ndarray  # bool[M]


def empty_mesh_instances(m: int, vm: int, tm: int) -> MeshInstancePool:
    return MeshInstancePool(
        vert_pos=jnp.zeros((m, vm, 3), jnp.float32),
        vert_normal=jnp.zeros((m, vm, 3), jnp.float32),
        vert_active=jnp.zeros((m, vm), bool),
        tri_indices=jnp.zeros((m, tm, 3), jnp.int32),
        tri_active=jnp.zeros((m, tm), bool),
        albedo=jnp.zeros((m, 3), jnp.float32),
        f0=jnp.zeros((m, 3), jnp.float32),
        roughness=jnp.ones((m,), jnp.float32),
        emissive=jnp.zeros((m, 3), jnp.float32),
        body_index=jnp.full((m,), -1, jnp.int32),
        position=jnp.zeros((m, 3), jnp.float32),
        orientation=jnp.tile(
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (m, 1)
        ),
        alive=jnp.zeros((m,), bool),
        casts_shadows=jnp.ones((m,), bool),
    )


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
    mesh_instances: MeshInstancePool | None = None,
) -> RenderScene:
    """Flatten voxel meshes + static geometry + mesh models into one
    RenderScene."""
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
    scene = RenderScene(
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
    if mesh_instances is not None and mesh_instances.alive.shape[0] > 0:
        scene = _append_mesh_instances(
            scene, mesh_instances,
            body_position, body_orientation,
            body_position_prev, body_orientation_prev,
        )
    return scene


def _append_mesh_instances(
    scene: RenderScene,
    mi: MeshInstancePool,
    body_position, body_orientation,
    body_position_prev, body_orientation_prev,
) -> RenderScene:
    """Pose mesh-model instances and append them to the flat RenderScene
    (ref: impact_model/src/transform.rs InstanceModelViewTransformWithPrevious
    — current + previous pose for motion vectors)."""
    m, vm, _ = mi.vert_pos.shape
    tm = mi.tri_active.shape[1]
    use_body = (mi.body_index >= 0)[:, None]
    bi = jnp.maximum(mi.body_index, 0)
    q = jnp.where(use_body, body_orientation[bi], mi.orientation)[:, None, :]
    x = jnp.where(use_body, body_position[bi], mi.position)[:, None, :]
    qp = jnp.where(use_body, body_orientation_prev[bi], mi.orientation)[:, None, :]
    xp = jnp.where(use_body, body_position_prev[bi], mi.position)[:, None, :]
    world = quat.rotate(q, mi.vert_pos) + x
    world_prev = quat.rotate(qp, mi.vert_pos) + xp
    normal_world = quat.rotate(q, mi.vert_normal)

    vert_ok = mi.vert_active & mi.alive[:, None]
    tri_ok = mi.tri_active & mi.alive[:, None]
    base = scene.vert_pos.shape[0]
    offs = base + (jnp.arange(m, dtype=jnp.int32) * vm)[:, None, None]
    tri_idx_flat = (mi.tri_indices + offs).reshape(m * tm, 3)

    def per_vert(a):  # [M,3] or [M] -> flat per-vertex
        if a.ndim == 1:
            return jnp.broadcast_to(a[:, None], (m, vm)).reshape(-1)
        return jnp.broadcast_to(a[:, None, :], (m, vm, a.shape[1])).reshape(-1, a.shape[1])

    return RenderScene(
        vert_pos=jnp.concatenate([scene.vert_pos, world.reshape(-1, 3)]),
        vert_pos_prev=jnp.concatenate(
            [scene.vert_pos_prev, world_prev.reshape(-1, 3)]
        ),
        vert_normal=jnp.concatenate(
            [scene.vert_normal, normal_world.reshape(-1, 3)]
        ),
        vert_albedo=jnp.concatenate([scene.vert_albedo, per_vert(mi.albedo)]),
        vert_f0=jnp.concatenate([scene.vert_f0, per_vert(mi.f0)]),
        vert_roughness=jnp.concatenate(
            [scene.vert_roughness, per_vert(mi.roughness)]
        ),
        vert_emissive=jnp.concatenate(
            [scene.vert_emissive, per_vert(mi.emissive)]
        ),
        vert_material=jnp.concatenate(
            [scene.vert_material, jnp.full((m * vm,), -1, jnp.int32)]
        ),
        tri_indices=jnp.concatenate([scene.tri_indices, tri_idx_flat]),
        tri_active=jnp.concatenate([scene.tri_active, tri_ok.reshape(-1)]),
        tri_shadow=jnp.concatenate(
            [
                scene.tri_shadow,
                (tri_ok & mi.casts_shadows[:, None]).reshape(-1),
            ]
        ),
    )
