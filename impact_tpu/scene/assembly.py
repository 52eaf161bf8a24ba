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

import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from ..render.pipeline import RenderScene
from ..voxel.mesh import CompactMesh
from ..voxel.object import VoxelObjectPool
from .materials import VoxelTypeRegistry  # noqa: F401 (re-export for callers)


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
    # corner-major fields baked at setup (bake_static_geometry_corners):
    # dict of tri_pos/tri_normal/… [Ts,9|3] arrays. Same rationale as
    # MeshInstancePool.corner_pos — static data, so hoist the per-frame
    # vertex gather out of the frame program.
    corners: dict = None


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
    # texture-array layer for textured-material entities (-1 = uniform only;
    # ref: Textured*/NormalMap/ParallaxMap setup components lower into one
    # layer per entity, setup/physical.rs:36-214)
    material: jnp.ndarray = None  # i32[M]
    # corner-major local geometry baked at pool-build time
    # (bake_mesh_instance_corners). The per-frame vertex gather this replaces
    # both wastes a gather per frame AND miscompiles on the tunneled-TPU
    # platform when fused into the full scene-assembly program (corners
    # collapse → zero screen area → empty frame); geometry is static after
    # setup, so bake it once.
    corner_pos: jnp.ndarray = None  # f32[M,Tm,9]
    corner_normal: jnp.ndarray = None  # f32[M,Tm,9]


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
        material=jnp.full((m,), -1, jnp.int32),
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


def _corner3(arr_v, tris):
    """Indexed [V,{3|1}] per-vertex data + [T,3] indices → corner-major
    [T,9]/[T,3] (gather; used only for SMALL static/instance geometry —
    voxel meshes carry corner-major data from remesh time)."""
    parts = [arr_v[tris[:, c]] for c in range(3)]
    if arr_v.ndim == 1:
        return jnp.stack(parts, axis=-1)
    return jnp.concatenate(parts, axis=-1)


def bake_mesh_instance_corners(mi: MeshInstancePool) -> MeshInstancePool:
    """Precompute corner-major local geometry for a finalized pool.

    Call once after the last vert/index mutation (runtime setup does); the
    per-frame scene assembly then reads ``corner_pos``/``corner_normal``
    instead of gathering vertices every frame. Gathers on host (numpy) —
    setup-time work, and immune to device relayout."""
    import numpy as np

    vp = np.asarray(mi.vert_pos)  # [M,Vm,3]
    vn = np.asarray(mi.vert_normal)
    ti = np.asarray(mi.tri_indices)  # [M,Tm,3]
    m = vp.shape[0]
    rows = np.arange(m)[:, None, None]
    local9 = vp[rows, ti].reshape(m, ti.shape[1], 9)
    nrm9 = vn[rows, ti].reshape(m, ti.shape[1], 9)
    return mi._replace(
        corner_pos=jnp.asarray(local9), corner_normal=jnp.asarray(nrm9)
    )


def static_geometry_corners(sg: StaticGeometry):
    """StaticGeometry → corner-major field dict (positions world-space)."""
    if sg.corners is not None:
        return dict(
            **sg.corners,
            tri_active=sg.tri_active,
            tri_shadow=jnp.ones_like(sg.tri_active),
        )
    t = sg.tri_indices
    pos = _corner3(sg.vert_pos, t)
    return dict(
        tri_pos=pos,
        tri_pos_prev=pos,
        tri_normal=_corner3(sg.vert_normal, t),
        tri_albedo=_corner3(sg.vert_albedo, t),
        tri_f0=_corner3(sg.vert_f0, t),
        tri_roughness=_corner3(sg.vert_roughness, t),
        tri_emissive=_corner3(sg.vert_emissive, t),
        tri_material=_corner3(sg.vert_material, t),
        tri_active=sg.tri_active,
        tri_shadow=jnp.ones_like(sg.tri_active),
    )


def bake_static_geometry_corners(sg: StaticGeometry) -> StaticGeometry:
    """Precompute the corner-major field dict on host (numpy) for a
    finalized StaticGeometry. See bake_mesh_instance_corners."""
    import numpy as np

    ti = np.asarray(sg.tri_indices)

    def g(a):
        a = np.asarray(a)
        parts = [a[ti[:, c]] for c in range(3)]
        if a.ndim == 1:
            return jnp.asarray(np.stack(parts, axis=-1))
        return jnp.asarray(np.concatenate(parts, axis=-1))

    pos = g(sg.vert_pos)
    corners = dict(
        tri_pos=pos,
        tri_pos_prev=pos,
        tri_normal=g(sg.vert_normal),
        tri_albedo=g(sg.vert_albedo),
        tri_f0=g(sg.vert_f0),
        tri_roughness=g(sg.vert_roughness),
        tri_emissive=g(sg.vert_emissive),
        tri_material=g(sg.vert_material),
    )
    return sg._replace(corners=corners)


def _rotate9(q, pos9):
    """Rotate corner-major positions [...,9] by quaternions q [...,4]."""
    return jnp.concatenate(
        [quat.rotate(q, pos9[..., 3 * c : 3 * c + 3]) for c in range(3)],
        axis=-1,
    )


def build_render_scene(
    pool: VoxelObjectPool,
    meshes: CompactMesh,  # batched over objects [O, ...] (materials baked)
    body_position,  # f32[N,3] current
    body_orientation,  # f32[N,4]
    body_position_prev,  # f32[N,3] previous frame (motion vectors)
    body_orientation_prev,  # f32[N,4]
    static_geometry: StaticGeometry,
    mesh_instances: MeshInstancePool | None = None,
    tris_per_object: int = 0,
    voxel_texture_layers: bool = True,
) -> RenderScene:
    """Flatten voxel meshes + static geometry + mesh models into one
    corner-major RenderScene — elementwise transforms only, no per-frame
    triangle-index gathers (the corner layout is built at remesh time).

    ``tris_per_object`` > 0 takes only the LEADING slots of each object's
    mesh — compact_mesh packs actives to the front, so this is a free
    (slice-only) render compaction; callers account overflow via the active
    counts (HeadlessRuntime.dropped_mesh_elements).

    ``meshes`` may also be a ChunkMeshPool (chunk-gated meshing): slots are
    surface chunks already, so per-object slicing does not apply."""
    from ..voxel.chunk_mesh import ChunkMeshPool, chunk_mesh_scene_fields

    if isinstance(meshes, ChunkMeshPool):
        parts = [chunk_mesh_scene_fields(
            meshes, pool,
            body_position, body_orientation,
            body_position_prev, body_orientation_prev,
        )]
        if not voxel_texture_layers:
            parts[0]["tri_material"] = jnp.full_like(
                parts[0]["tri_material"], -1
            )
        if static_geometry.tri_active.shape[0] > 0:
            parts.append(static_geometry_corners(static_geometry))
        if mesh_instances is not None and mesh_instances.alive.shape[0] > 0:
            parts.append(_mesh_instance_corners(
                mesh_instances,
                body_position, body_orientation,
                body_position_prev, body_orientation_prev,
            ))
        fields = {
            k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]
        }
        return RenderScene(**fields)

    if 0 < tris_per_object < meshes.tri_pos.shape[1]:
        k = tris_per_object
        meshes = meshes._replace(
            tri_active=meshes.tri_active[:, :k],
            tri_pos=meshes.tri_pos[:, :k],
            tri_normal=meshes.tri_normal[:, :k],
            tri_type=meshes.tri_type[:, :k],
            tri_type2=meshes.tri_type2[:, :k],
            tri_blend=meshes.tri_blend[:, :k],
            tri_albedo=meshes.tri_albedo[:, :k],
            tri_f0=meshes.tri_f0[:, :k],
            tri_rough=meshes.tri_rough[:, :k],
            tri_emissive=meshes.tri_emissive[:, :k],
        )
    o, tc, _ = meshes.tri_pos.shape

    # grid units → body frame (corner-major [O,Tc,9])
    local9 = (
        meshes.tri_pos * pool.voxel_extent[:, None, None]
        + jnp.tile(pool.origin, (1, 3))[:, None, :]
    )
    q = body_orientation[pool.body_index][:, None, :]
    x = jnp.tile(body_position[pool.body_index], (1, 3))[:, None, :]
    qp = body_orientation_prev[pool.body_index][:, None, :]
    xp = jnp.tile(body_position_prev[pool.body_index], (1, 3))[:, None, :]
    world9 = _rotate9(q, local9) + x
    world9_prev = _rotate9(qp, local9) + xp
    normal9 = _rotate9(q, meshes.tri_normal)

    # corner materials are baked at remesh time (bake_mesh_materials — the
    # two-material blend + table lookups measured ~70 ms/frame when done
    # per frame at bench scale; ref: surface_nets.rs ≤7-material weights)
    albedo9 = meshes.tri_albedo
    f09 = meshes.tri_f0
    rough3 = meshes.tri_rough
    emis9 = meshes.tri_emissive

    tri_ok = meshes.tri_active & pool.alive[:, None]
    # voxel_texture_layers=False drops voxel surfaces to the untextured path
    # (their type layers are not in the scene texture array — e.g. textured
    # entities present but tpu.textured_voxels off)
    if voxel_texture_layers:
        mat3 = jnp.where(tri_ok[..., None], meshes.tri_type, -1)
    else:
        mat3 = jnp.full(meshes.tri_type.shape, -1, jnp.int32)

    parts = [dict(
        tri_pos=world9.reshape(-1, 9),
        tri_pos_prev=world9_prev.reshape(-1, 9),
        tri_normal=normal9.reshape(-1, 9),
        tri_albedo=albedo9.reshape(-1, 9),
        tri_f0=f09.reshape(-1, 9),
        tri_roughness=rough3.reshape(-1, 3),
        tri_emissive=emis9.reshape(-1, 9),
        tri_material=mat3.reshape(-1, 3),
        tri_active=tri_ok.reshape(-1),
        tri_shadow=(tri_ok & pool.casts_shadows[:, None]).reshape(-1),
    )]
    if static_geometry.tri_active.shape[0] > 0:
        parts.append(static_geometry_corners(static_geometry))
    if mesh_instances is not None and mesh_instances.alive.shape[0] > 0:
        parts.append(_mesh_instance_corners(
            mesh_instances,
            body_position, body_orientation,
            body_position_prev, body_orientation_prev,
        ))
    fields = {
        k: jnp.concatenate([p[k] for p in parts])
        for k in parts[0]
    }
    return RenderScene(**fields)


def _mesh_instance_corners(
    mi: MeshInstancePool,
    body_position, body_orientation,
    body_position_prev, body_orientation_prev,
):
    """Pose mesh-model instances and emit corner-major fields
    (ref: impact_model/src/transform.rs InstanceModelViewTransformWithPrevious
    — current + previous pose for motion vectors). Pools are small, so the
    corner gather here is cheap."""
    m, vm, _ = mi.vert_pos.shape
    tm = mi.tri_active.shape[1]
    use_body = (mi.body_index >= 0)[:, None]
    bi = jnp.maximum(mi.body_index, 0)
    q = jnp.where(use_body, body_orientation[bi], mi.orientation)[:, None, :]
    x = jnp.where(use_body, body_position[bi], mi.position)
    qp = jnp.where(use_body, body_orientation_prev[bi], mi.orientation)[:, None, :]
    xp = jnp.where(use_body, body_position_prev[bi], mi.position)

    if mi.corner_pos is not None:
        local9, nrm9 = mi.corner_pos, mi.corner_normal  # [M,Tm,9] baked
    else:
        local9 = jax.vmap(_corner3)(mi.vert_pos, mi.tri_indices)  # [M,Tm,9]
        nrm9 = jax.vmap(_corner3)(mi.vert_normal, mi.tri_indices)
    world9 = _rotate9(q, local9) + jnp.tile(x, (1, 3))[:, None, :]
    world9_prev = _rotate9(qp, local9) + jnp.tile(xp, (1, 3))[:, None, :]
    normal9 = _rotate9(q, nrm9)

    tri_ok = mi.tri_active & mi.alive[:, None]

    def per_tri9(a):  # [M,3] uniform → [M*Tm, 9]
        return jnp.broadcast_to(
            jnp.tile(a, (1, 3))[:, None, :], (m, tm, 9)
        ).reshape(-1, 9)

    return dict(
        tri_pos=world9.reshape(-1, 9),
        tri_pos_prev=world9_prev.reshape(-1, 9),
        tri_normal=normal9.reshape(-1, 9),
        tri_albedo=per_tri9(mi.albedo),
        tri_f0=per_tri9(mi.f0),
        tri_roughness=jnp.broadcast_to(
            mi.roughness[:, None, None], (m, tm, 3)
        ).reshape(-1, 3),
        tri_emissive=per_tri9(mi.emissive),
        tri_material=jnp.broadcast_to(
            mi.material[:, None, None], (m, tm, 3)
        ).reshape(-1, 3),
        tri_active=tri_ok.reshape(-1),
        tri_shadow=(tri_ok & mi.casts_shadows[:, None]).reshape(-1),
    )


def render_scene_from_indexed(
    vert_pos, vert_normal, vert_albedo, vert_f0, vert_roughness,
    vert_emissive, vert_material, tri_indices, tri_active, tri_shadow=None,
) -> RenderScene:
    """Build a corner-major RenderScene from classic indexed geometry
    (one-off/offline paths like the voxel_generator preview)."""
    t = tri_indices
    pos = _corner3(vert_pos, t)
    return RenderScene(
        tri_pos=pos,
        tri_pos_prev=pos,
        tri_normal=_corner3(vert_normal, t),
        tri_albedo=_corner3(vert_albedo, t),
        tri_f0=_corner3(vert_f0, t),
        tri_roughness=_corner3(vert_roughness, t),
        tri_emissive=_corner3(vert_emissive, t),
        tri_material=_corner3(vert_material, t),
        tri_active=tri_active,
        tri_shadow=tri_active if tri_shadow is None else tri_shadow,
    )
