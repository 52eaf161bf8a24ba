"""Scene compilation: ECS world → device pools.

Ref: engine/src/setup.rs:18-69 — the reference's entity-setup pipeline
converts "setup components" into runtime resources (rigid bodies, collidables,
force generators, voxel objects, lights, cameras) and strips them. Here the
pipeline runs once on the host at scene build (and again after staging), and
emits the SimState/EngineParams pytrees the jitted step consumes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ecs import World
from ..ecs import components as C
from ..math import quaternion as quatlib
from ..physics import (
    KIND_DYNAMIC,
    KIND_KINEMATIC,
    PhysicsParams,
    init_physics_state,
)
from ..physics import inertia as analytic_inertia
from ..physics.collision import empty_collidable_pools
from ..physics.driven_motion import empty_motion_driver_pools
from ..physics.forces import apply_forces_and_torques, empty_force_pools
from ..physics.solver import empty_joint_pools
from ..render import Camera, empty_light_pools, look_at
from ..scene.assembly import empty_static_geometry
from ..scene.materials import (
    VoxelTypeRegistry,
    default_registry,
    material_corner_table,
)
from ..utils.config import EngineConfig
from ..voxel import sdf as sdflib
from ..voxel.interaction import empty_absorber_pools
from ..voxel.mesh import compact_mesh_batched, make_surface_nets_batched
from ..voxel.object import empty_voxel_object_pool, generate_sdf_grid
from .engine import EngineParams, SimState


class SceneBuildResult:
    def __init__(self, sim: SimState, params: EngineParams, info: dict):
        self.sim = sim
        self.params = params
        self.info = info


# OBJ/PLY files referenced by TriangleMeshFile components, keyed by the FNV-1a
# hash of their path (ref: impact_mesh path-hash mesh IDs, io/{obj,ply}.rs)
MESH_FILE_PATHS: dict[int, str] = {}


def register_mesh_file(path: str) -> int:
    """Register a mesh file for TriangleMeshFile setup; returns the path hash."""
    from ..utils.hashing import hash_str_to_u64

    h = int(hash_str_to_u64(str(path)))
    MESH_FILE_PATHS[h] = str(path)
    return h


# Texture sources referenced by Textured*/NormalMap/ParallaxMap setup
# components, keyed by FNV-1a hash of their name (ref: impact_texture
# TextureID = hash of texture name, lib.rs; asset files are fetched by
# tools/asset_fetcher — here sources are paths or in-memory arrays)
TEXTURE_SOURCES: dict[int, object] = {}


def register_texture(name: str, source) -> int:
    """Register a texture for textured-material setup components; returns
    the FNV-1a id. ``source``: an image file path (PNG/JPEG) or a float
    ndarray [H,W,C] in [0,1]."""
    from ..utils.hashing import hash_str_to_u64

    h = int(hash_str_to_u64(str(name)))
    TEXTURE_SOURCES[h] = source
    return h


def _resolve_texture(tid: int, resolution: int, srgb: bool):
    """texture_id → [S,S,C] float array (None when unregistered/zero)."""
    if not tid:
        return None
    src = TEXTURE_SOURCES.get(int(tid))
    if src is None:
        raise KeyError(
            f"texture id {tid:#x} not registered (register_texture)"
        )
    if isinstance(src, str):
        from ..render.textures import load_image_layer

        return load_image_layer(src, resolution=resolution, srgb=srgb)
    from ..render.textures import _resize_nearest

    arr = np.asarray(src, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[:2] != (resolution, resolution):
        arr = _resize_nearest(arr, resolution)
    return arr


# --- numpy staging shim --------------------------------------------------------
# Scene compilation performs thousands of tiny slot writes; doing them as
# jnp ``.at[].set`` would dispatch one XLA op each (minutes of host time).
# These wrappers keep the jnp-style syntax but mutate numpy buffers in place;
# the pools convert to device arrays once at the end.


class _MutArray(np.ndarray):
    @property
    def at(self):
        return _AtIndexer(self)


class _AtIndexer:
    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, idx):
        return _AtRef(self._arr, idx)


class _AtRef:
    def __init__(self, arr, idx):
        self._arr = arr
        self._idx = idx

    def set(self, value, **_):
        self._arr[self._idx] = np.asarray(value)
        return self._arr

    def add(self, value, **_):
        self._arr[self._idx] += np.asarray(value)
        return self._arr


def _staged(tree):
    """Pytree of jnp arrays → mutable numpy views with .at support."""
    return jax.tree.map(
        lambda x: np.array(x).view(_MutArray), tree
    )


def _committed(tree):
    """Mutable numpy staging → device arrays."""
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tree)


def compile_scene(
    world: World,
    config: EngineConfig,
    registry: VoxelTypeRegistry | None = None,
    sdf_generators: dict | None = None,
    static_geometry=None,
    rng_seed: int = 0,
) -> SceneBuildResult:
    """Lower the ECS world into device state (the setup pipeline).

    The one-time array work (SDF generation, initial meshing, inertia) runs on
    CPU — compiling those programs for the accelerator costs minutes and buys
    nothing for a single execution — then the finished state is transferred to
    the default device for the hot loop."""
    if config.tpu.chunked_remesh is None:
        # AUTO: chunk-gated meshing/absorption/invalidation for 64³+ grids
        # (resolved on the config in place so the runtime, counters, and
        # benches all see the decision)
        config.tpu.chunked_remesh = config.tpu.voxel_grid_size >= 64
    target = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    if target.platform == "cpu":
        return _compile_scene_impl(
            world, config, registry, sdf_generators, static_geometry, rng_seed
        )
    with jax.default_device(cpu):
        build = _compile_scene_impl(
            world, config, registry, sdf_generators, static_geometry, rng_seed
        )
    build.sim = jax.device_put(build.sim, target)
    build.params = jax.device_put(build.params, target)
    return build


def _compile_scene_impl(
    world: World,
    config: EngineConfig,
    registry: VoxelTypeRegistry | None = None,
    sdf_generators: dict | None = None,
    static_geometry=None,
    rng_seed: int = 0,
) -> SceneBuildResult:
    registry = registry or default_registry()
    sdf_generators = sdf_generators or {}
    tc = config.tpu
    o_max = tc.max_voxel_objects
    g = tc.voxel_grid_size

    n_regular = tc.max_bodies - o_max
    assert n_regular > 0, "max_bodies must exceed max_voxel_objects"
    voxel_body_offset = n_regular

    phys = init_physics_state(tc.max_bodies, tc.max_contacts)
    bodies = _staged(phys.bodies)
    coll = _staged(
        empty_collidable_pools(n_spheres=min(64, tc.max_bodies), n_planes=8, n_capsules=16)
    )
    # cap_accel must scale with the body pool: almost every dynamic body
    # carries a ConstantAcceleration (gravity) entry
    forces = _staged(
        empty_force_pools(tc.max_bodies, cap_accel=max(64, tc.max_bodies))
    )
    drivers = _staged(empty_motion_driver_pools())
    lights = _staged(empty_light_pools(4, 2))
    absorbers = _staged(empty_absorber_pools())
    joints = _staged(empty_joint_pools())
    import jax.numpy as _jnp

    sdf_dtype = _jnp.int8 if tc.sdf_encoding == "i8" else _jnp.float32
    pool = _staged(empty_voxel_object_pool(o_max, g, sdf_dtype))
    pool = pool._replace(
        body_index=(np.arange(o_max, dtype=np.int32) + voxel_body_offset).view(_MutArray)
    )

    voxel_response = np.zeros((o_max, 3), np.float32)
    drag_tables: list = []
    drag_map_index = np.full(tc.max_bodies, -1, np.int32)
    from .engine import empty_distance_rule_pools

    dist_rules = _staged(empty_distance_rule_pools())
    casts_shadows_base = np.ones(o_max, bool)
    entity_obj_slot: dict[int, int] = {}
    fracturable = np.zeros(o_max, bool)
    fracture_threshold = np.full(o_max, np.inf, np.float32)
    fracture_radius = np.ones(o_max, np.float32)

    camera = Camera(
        jnp.array([0.0, 5.0, 20.0]),
        look_at([0.0, 5.0, 20.0], [0.0, 0.0, 0.0]),
        jnp.asarray(np.pi / 3, jnp.float32),
        jnp.asarray(0.05, jnp.float32),
        jnp.asarray(500.0, jnp.float32),
    )

    ground_planes: list[float] = []
    cursor = {"body": 0, "sphere": 0, "plane": 0, "capsule": 0, "accel": 0,
              "local": 0, "spring": 0, "omni": 0, "uni": 0, "absorb": 0,
              "voxel": 0, "circ": 0, "lin": 0, "rot": 0, "osc": 0, "orb": 0,
              "align": 0, "absorb_cap": 0, "joint": 0, "dist_rule": 0}
    entity_body: dict[int, int] = {}
    info = {"voxel_objects": [], "bodies": {}}

    def frame_of(eid):
        if world.has_component(eid, C.ReferenceFrame):
            rf = world.get_component(eid, C.ReferenceFrame)
            return np.asarray(rf.position, np.float32), np.asarray(
                rf.orientation, np.float32
            )
        return np.zeros(3, np.float32), np.array([0, 0, 0, 1], np.float32)

    def alloc_body(eid, kind):
        nonlocal bodies
        i = cursor["body"]
        assert i < n_regular, "regular body pool exhausted"
        cursor["body"] += 1
        pos, ori = frame_of(eid)
        vel = np.zeros(3, np.float32)
        ang = np.zeros(3, np.float32)
        if world.has_component(eid, C.Motion):
            mo = world.get_component(eid, C.Motion)
            vel = np.asarray(mo.linear_velocity, np.float32)
            ang = np.asarray(mo.angular_velocity, np.float32)
        bodies = bodies._replace(
            kind=bodies.kind.at[i].set(kind),
            position=bodies.position.at[i].set(pos),
            orientation=bodies.orientation.at[i].set(ori),
            velocity=bodies.velocity.at[i].set(vel),
            angular_velocity=bodies.angular_velocity.at[i].set(ang),
        )
        if kind == KIND_DYNAMIC:
            bodies = bodies._replace(
                momentum=bodies.momentum.at[i].set(bodies.mass[i] * vel)
            )
        entity_body[eid] = i
        return i

    def body_for(eid, default_kind=KIND_KINEMATIC):
        if eid not in entity_body:
            alloc_body(eid, default_kind)
        return entity_body[eid]

    def set_dynamic_properties(bi, mass, com, inertia):
        nonlocal bodies
        inertia = np.asarray(inertia, np.float32)
        bodies = bodies._replace(
            mass=bodies.mass.at[bi].set(float(mass)),
            inv_mass=bodies.inv_mass.at[bi].set(1.0 / float(mass)),
            inertia_body=bodies.inertia_body.at[bi].set(inertia),
            inv_inertia_body=bodies.inv_inertia_body.at[bi].set(
                np.linalg.inv(inertia)
            ),
            momentum=bodies.momentum.at[bi].set(
                float(mass) * bodies.velocity[bi]
            ),
        )

    # --- pass 1: voxel objects -------------------------------------------------
    voxel_kinds = (C.VoxelSphere, C.VoxelBox, C.VoxelCapsule, C.VoxelSphereUnion,
                   C.GeneratedVoxelObject)
    # identical-shape dedupe: scenes routinely instance one shape many times
    # (the bench tumbler is 62 identical boxes); SDF generation and — below —
    # the initial surface-nets meshing run once per DISTINCT
    # (shape, noise, voxel-type) signature instead of once per object
    # (VERDICT r4 item 1: compile_scene was the bench's largest cost)
    import dataclasses as _dc

    def _sig_of(*comps):
        parts = []
        for c in comps:
            if c is None:
                parts.append(None)
                continue
            vals = tuple(
                tuple(np.asarray(getattr(c, f.name)).reshape(-1).tolist())
                for f in _dc.fields(c)
            )
            parts.append((type(c).__name__, vals))
        return tuple(parts)

    shape_cache: dict = {}
    uniq_sdf: list = []
    uniq_vt: list = []
    uniq_extent: list = []
    uidx_of_obj = np.full(o_max, -1, np.int32)
    for eid in world.entities_with():
        shape = None
        for ck in voxel_kinds:
            if world.has_component(eid, ck):
                shape = world.get_component(eid, ck)
                break
        if shape is None:
            continue
        oi = cursor["voxel"]
        assert oi < o_max, "voxel object pool exhausted"
        cursor["voxel"] += 1

        extent = float(shape.voxel_extent)
        if isinstance(shape, C.VoxelSphere):
            graph = sdflib.sphere(shape.radius * extent)
        elif isinstance(shape, C.VoxelBox):
            graph = sdflib.box(
                (shape.extent_x * extent, shape.extent_y * extent, shape.extent_z * extent)
            )
        elif isinstance(shape, C.VoxelCapsule):
            graph = sdflib.capsule(shape.radius * extent, shape.segment_length * extent)
        elif isinstance(shape, C.VoxelSphereUnion):
            off = np.asarray(shape.center_offsets) * extent
            graph = sdflib.union(
                sdflib.translation(sdflib.sphere(shape.radius_1 * extent), -off / 2),
                sdflib.translation(sdflib.sphere(shape.radius_2 * extent), off / 2),
                smoothness=shape.smoothness * extent,
            )
        else:  # GeneratedVoxelObject
            graph = sdf_generators[int(shape.generator_id)]
        nm = (
            world.get_component(eid, C.MultifractalNoiseSDFModification)
            if world.has_component(eid, C.MultifractalNoiseSDFModification)
            else None
        )
        vt = (
            world.get_component(eid, C.SameVoxelType)
            if world.has_component(eid, C.SameVoxelType)
            else None
        )
        gn = (
            world.get_component(eid, C.GradientNoiseVoxelTypes)
            if world.has_component(eid, C.GradientNoiseVoxelTypes)
            else None
        )
        sig = (_sig_of(shape, nm, vt, gn), g)

        if sig in shape_cache:
            ui = shape_cache[sig]
            sdf_grid = uniq_sdf[ui]
            vtype_grid = uniq_vt[ui]
            origin = shape_cache[sig, "origin"]
        else:
            if nm is not None:
                graph = sdflib.noise_modifier(
                    graph, nm.octaves, nm.frequency, nm.lacunarity,
                    nm.persistence, nm.amplitude, int(nm.seed),
                )
            sdf_grid, origin = generate_sdf_grid(graph, g, extent)
            if sdf_dtype == _jnp.int8:
                from ..voxel.encoding import encode_sdf_i8

                sdf_grid = encode_sdf_i8(sdf_grid, extent)
            vtype_grid = jnp.zeros((g, g, g), jnp.int32)
            if vt is not None:
                vtype_grid = jnp.full((g, g, g), int(vt.voxel_type), jnp.int32)
            elif gn is not None:
                coords = (
                    jnp.stack(
                        jnp.meshgrid(*([jnp.arange(g, dtype=jnp.float32)] * 3), indexing="ij"),
                        axis=-1,
                    )
                    * extent
                )
                noise = sdflib.gradient_noise(
                    coords * gn.noise_frequency, seed=int(gn.seed)
                )
                sel = jnp.clip(
                    ((noise * 0.5 + 0.5) * gn.n_voxel_types).astype(jnp.int32),
                    0, gn.n_voxel_types - 1,
                )
                vtype_grid = jnp.asarray(gn.voxel_types, jnp.int32)[sel]
            ui = len(uniq_sdf)
            shape_cache[sig] = ui
            shape_cache[sig, "origin"] = origin
            uniq_sdf.append(sdf_grid)
            uniq_vt.append(vtype_grid)
            uniq_extent.append(extent)
        uidx_of_obj[oi] = ui

        pool = pool._replace(
            alive=pool.alive.at[oi].set(True),
            voxel_extent=pool.voxel_extent.at[oi].set(extent),
            origin=pool.origin.at[oi].set(origin),
            sdf=pool.sdf.at[oi].set(sdf_grid),
            vtype=pool.vtype.at[oi].set(vtype_grid),
            mesh_dirty=pool.mesh_dirty.at[oi].set(True),
        )

        # body binding: static slot voxel_body_offset + oi
        bi = voxel_body_offset + oi
        pos, ori = frame_of(eid)
        dynamic = world.has_component(eid, C.DynamicVoxels)
        vel = np.zeros(3, np.float32)
        ang = np.zeros(3, np.float32)
        if world.has_component(eid, C.Motion):
            mo = world.get_component(eid, C.Motion)
            vel = np.asarray(mo.linear_velocity, np.float32)
            ang = np.asarray(mo.angular_velocity, np.float32)
        bodies = bodies._replace(
            kind=bodies.kind.at[bi].set(KIND_DYNAMIC if dynamic else KIND_KINEMATIC),
            position=bodies.position.at[bi].set(pos),
            orientation=bodies.orientation.at[bi].set(ori),
            velocity=bodies.velocity.at[bi].set(vel),
            angular_velocity=bodies.angular_velocity.at[bi].set(ang),
        )
        entity_body[eid] = bi

        if world.has_component(eid, C.VoxelCollidable):
            vc = world.get_component(eid, C.VoxelCollidable)
            voxel_response[oi] = (vc.restitution, vc.static_friction, vc.dynamic_friction)
        if world.has_component(eid, C.FracturingProperties):
            fp = world.get_component(eid, C.FracturingProperties)
            fracturable[oi] = True
            fracture_threshold[oi] = fp.impulse_threshold
            fracture_radius[oi] = fp.fracture_radius
        if world.has_component(eid, C.ConstantAcceleration):
            ca = world.get_component(eid, C.ConstantAcceleration)
            j = cursor["accel"]; cursor["accel"] += 1
            forces = forces._replace(
                const_accel_body=forces.const_accel_body.at[j].set(bi),
                const_accel=forces.const_accel.at[j].set(
                    jnp.asarray(ca.acceleration)
                ),
                const_accel_mask=forces.const_accel_mask.at[j].set(True),
            )
        entity_obj_slot[eid] = oi
        if world.has_component(eid, C.SceneEntityFlags):
            fl = int(world.get_component(eid, C.SceneEntityFlags).flags)
            if fl & 2:  # CASTS_NO_SHADOWS
                casts_shadows_base[oi] = False
                pool = pool._replace(
                    casts_shadows=pool.casts_shadows.at[oi].set(False)
                )
        info["voxel_objects"].append({"entity": eid, "slot": oi, "body": bi})
        world.strip_setup_components(eid)

    # --- pass 1.9: record renderable mesh-model entities BEFORE body passes
    # strip their setup components (ref: impact_mesh setup.rs + impact_material
    # setup/physical.rs:36-214). Meshes are generated here; slots are filled in
    # pass 2.7 once entity->body mapping is known.
    from ..scene import mesh as meshlib

    def _mesh_for_entity(eid):
        if world.has_component(eid, C.BoxMesh):
            c = world.get_component(eid, C.BoxMesh)
            return meshlib.box_mesh((c.extent_x, c.extent_y, c.extent_z))
        if world.has_component(eid, C.SphereMesh):
            c = world.get_component(eid, C.SphereMesh)
            n = int(c.n_rings)
            return meshlib.sphere_mesh(1.0, n, 2 * n + 2)
        if world.has_component(eid, C.HemisphereMesh):
            c = world.get_component(eid, C.HemisphereMesh)
            n = int(c.n_rings)
            return meshlib.hemisphere_mesh(1.0, n, 2 * n + 2)
        if world.has_component(eid, C.CylinderMesh):
            c = world.get_component(eid, C.CylinderMesh)
            m = meshlib.cylinder_mesh(
                0.5 * c.diameter, c.length, int(c.n_circumference_vertices)
            )
            # reference convention: bottom centered at the origin
            return m._replace(positions=m.positions + np.array(
                [0.0, 0.5 * c.length, 0.0], np.float32))
        if world.has_component(eid, C.ConeMesh):
            c = world.get_component(eid, C.ConeMesh)
            m = meshlib.cone_mesh(
                0.5 * c.max_diameter, c.length, int(c.n_circumference_vertices)
            )
            return m._replace(positions=m.positions + np.array(
                [0.0, 0.5 * c.length, 0.0], np.float32))
        if world.has_component(eid, C.CapsuleMesh):
            c = world.get_component(eid, C.CapsuleMesh)
            return meshlib.capsule_mesh(
                0.5 * c.diameter, c.segment_length,
                max(4, int(c.n_circumference_vertices) // 2),
                int(c.n_circumference_vertices),
            )
        if world.has_component(eid, C.RectangleMesh):
            c = world.get_component(eid, C.RectangleMesh)
            return meshlib.rectangle_mesh(c.extent_x, c.extent_z)
        if world.has_component(eid, C.TriangleMeshFile):
            c = world.get_component(eid, C.TriangleMeshFile)
            path = MESH_FILE_PATHS.get(int(c.path_hash))
            if path is None:
                return None
            pth = str(path)
            return (meshlib.load_ply(pth) if pth.endswith(".ply")
                    else meshlib.load_obj(pth))
        return None

    _mesh_comps = (
        C.BoxMesh, C.SphereMesh, C.HemisphereMesh, C.CylinderMesh, C.ConeMesh,
        C.CapsuleMesh, C.RectangleMesh, C.TriangleMeshFile,
    )
    mesh_pending = []
    for eid in world.entities_with():
        if not any(world.has_component(eid, mc) for mc in _mesh_comps):
            continue
        tri_mesh = _mesh_for_entity(eid)
        if tri_mesh is None:
            continue
        pos_l = np.asarray(tri_mesh.positions, np.float32)
        nrm_l = np.asarray(tri_mesh.normals, np.float32)
        idx_l = np.asarray(tri_mesh.indices, np.int32)
        if world.has_component(eid, C.ModelTransform):
            mt = world.get_component(eid, C.ModelTransform)
            pos_l = pos_l * np.float32(mt.scale) + np.asarray(
                mt.offset, np.float32
            )
        color = np.ones(3, np.float32)
        if world.has_component(eid, C.UniformColor):
            color = np.asarray(
                world.get_component(eid, C.UniformColor).color, np.float32
            )
        spec = 0.0
        if world.has_component(eid, C.UniformSpecularReflectance):
            spec = float(world.get_component(
                eid, C.UniformSpecularReflectance).reflectance)
        rough = 1.0
        if world.has_component(eid, C.UniformRoughness):
            rough = float(world.get_component(eid, C.UniformRoughness).roughness)
        metal = 0.0
        if world.has_component(eid, C.UniformMetalness):
            metal = float(world.get_component(eid, C.UniformMetalness).metalness)
        emis = 0.0
        if world.has_component(eid, C.UniformEmissiveLuminance):
            emis = float(world.get_component(
                eid, C.UniformEmissiveLuminance).luminance)
        casts = True
        if world.has_component(eid, C.SceneEntityFlags):
            casts = not (
                int(world.get_component(eid, C.SceneEntityFlags).flags) & 2
            )
        # textured-material components (ref: setup/physical.rs:36-214) —
        # each property is independently uniform or textured
        tex = {}
        if world.has_component(eid, C.TexturedColor):
            tex["color"] = int(
                world.get_component(eid, C.TexturedColor).texture_id
            )
        for comp, k in (
            (C.TexturedSpecularReflectance, "spec"),
            (C.TexturedRoughness, "rough"),
            (C.TexturedMetalness, "metal"),
            (C.TexturedEmissiveLuminance, "emis"),
        ):
            if world.has_component(eid, comp):
                c = world.get_component(eid, comp)
                tex[k] = (int(c.texture_id), float(c.scale_factor))
        if world.has_component(eid, C.NormalMap):
            tex["normal"] = int(
                world.get_component(eid, C.NormalMap).texture_id
            )
        if world.has_component(eid, C.ParallaxMap):
            c = world.get_component(eid, C.ParallaxMap)
            tex["parallax"] = (
                int(c.height_map_texture_id),
                float(c.displacement_scale),
            )
        pos, ori = frame_of(eid)
        mesh_pending.append(dict(
            eid=eid, pos_l=pos_l, nrm_l=nrm_l, idx_l=idx_l, color=color,
            spec=spec, rough=rough, metal=metal, emis=emis, casts=casts,
            pos=pos, ori=ori, tex=tex,
        ))

    # --- pass 2: regular bodies + collidables + forces + drivers ----------------
    for eid in world.entities_with():
        if eid in entity_body:
            continue  # voxel entities handled
        is_dynamic = world.has_component(eid, C.DynamicRigidBodySubstance) or \
            world.has_component(eid, C.DynamicRigidBodyInertialProperties)
        is_kinematic = (
            world.has_component(eid, C.KinematicRigidBodyMarker)
            or world.has_component(eid, C.CircularTrajectory)
            or world.has_component(eid, C.ConstantAccelerationTrajectory)
            or world.has_component(eid, C.ConstantRotation)
            or world.has_component(eid, C.HarmonicOscillation)
            or world.has_component(eid, C.OrbitalTrajectory)
        )
        needs_body = (
            is_dynamic or is_kinematic
            or world.has_component(eid, C.SphericalCollidable)
            or world.has_component(eid, C.PlanarCollidable)
            or world.has_component(eid, C.CapsularCollidable)
            or world.has_component(eid, C.VoxelAbsorbingSphere)
            or world.has_component(eid, C.VoxelAbsorbingCapsule)
            or world.has_component(eid, C.FixedDirectionAlignmentTorque)
        )
        if not needs_body:
            continue
        bi = alloc_body(eid, KIND_DYNAMIC if is_dynamic else KIND_KINEMATIC)

        # inertial properties
        if world.has_component(eid, C.DynamicRigidBodyInertialProperties):
            ip = world.get_component(eid, C.DynamicRigidBodyInertialProperties)
            set_dynamic_properties(bi, ip.mass, ip.center_of_mass, ip.inertia_tensor)
        elif world.has_component(eid, C.DynamicRigidBodySubstance):
            sub = world.get_component(eid, C.DynamicRigidBodySubstance)
            rho = sub.mass_density
            if world.has_component(eid, C.SphericalCollidable):
                sc = world.get_component(eid, C.SphericalCollidable)
                m = float(analytic_inertia.sphere_mass(rho, sc.radius))
                inertia = np.asarray(
                    analytic_inertia.sphere_inertia(jnp.asarray(m), jnp.asarray(sc.radius))
                )
            elif world.has_component(eid, C.CapsularCollidable):
                cc = world.get_component(eid, C.CapsularCollidable)
                seg = float(np.linalg.norm(np.asarray(cc.segment_end) - np.asarray(cc.segment_start)))
                m = float(analytic_inertia.capsule_mass(rho, cc.radius, seg))
                inertia = np.asarray(
                    analytic_inertia.capsule_inertia(jnp.asarray(m), jnp.asarray(cc.radius), jnp.asarray(seg))
                )
            else:
                m, inertia = rho, np.eye(3, dtype=np.float32) * rho
            set_dynamic_properties(bi, m, np.zeros(3), inertia)

        # collidables
        if world.has_component(eid, C.SphericalCollidable):
            sc = world.get_component(eid, C.SphericalCollidable)
            j = cursor["sphere"]; cursor["sphere"] += 1
            coll = coll._replace(
                sph_body=coll.sph_body.at[j].set(bi),
                sph_center=coll.sph_center.at[j].set(jnp.asarray(sc.center)),
                sph_radius=coll.sph_radius.at[j].set(sc.radius),
                sph_kind=coll.sph_kind.at[j].set(sc.kind),
                sph_response=coll.sph_response.at[j].set(
                    jnp.array([sc.restitution, sc.static_friction, sc.dynamic_friction])
                ),
                sph_mask=coll.sph_mask.at[j].set(True),
            )
        if world.has_component(eid, C.PlanarCollidable):
            pc = world.get_component(eid, C.PlanarCollidable)
            if tuple(np.round(pc.normal, 3)) == (0.0, 1.0, 0.0):
                ground_planes.append(float(pc.displacement))
            j = cursor["plane"]; cursor["plane"] += 1
            coll = coll._replace(
                pln_body=coll.pln_body.at[j].set(bi),
                pln_normal=coll.pln_normal.at[j].set(jnp.asarray(pc.normal)),
                pln_disp=coll.pln_disp.at[j].set(pc.displacement),
                pln_kind=coll.pln_kind.at[j].set(pc.kind),
                pln_response=coll.pln_response.at[j].set(
                    jnp.array([pc.restitution, pc.static_friction, pc.dynamic_friction])
                ),
                pln_mask=coll.pln_mask.at[j].set(True),
            )
        if world.has_component(eid, C.CapsularCollidable):
            cc = world.get_component(eid, C.CapsularCollidable)
            j = cursor["capsule"]; cursor["capsule"] += 1
            coll = coll._replace(
                cap_body=coll.cap_body.at[j].set(bi),
                cap_start=coll.cap_start.at[j].set(jnp.asarray(cc.segment_start)),
                cap_end=coll.cap_end.at[j].set(jnp.asarray(cc.segment_end)),
                cap_radius=coll.cap_radius.at[j].set(cc.radius),
                cap_kind=coll.cap_kind.at[j].set(cc.kind),
                cap_response=coll.cap_response.at[j].set(
                    jnp.array([cc.restitution, cc.static_friction, cc.dynamic_friction])
                ),
                cap_mask=coll.cap_mask.at[j].set(True),
            )

        # forces
        if world.has_component(eid, C.ConstantAcceleration):
            ca = world.get_component(eid, C.ConstantAcceleration)
            j = cursor["accel"]; cursor["accel"] += 1
            forces = forces._replace(
                const_accel_body=forces.const_accel_body.at[j].set(bi),
                const_accel=forces.const_accel.at[j].set(jnp.asarray(ca.acceleration)),
                const_accel_mask=forces.const_accel_mask.at[j].set(True),
            )
        if world.has_component(eid, C.LocalForce):
            lf = world.get_component(eid, C.LocalForce)
            j = cursor["local"]; cursor["local"] += 1
            forces = forces._replace(
                local_force_body=forces.local_force_body.at[j].set(bi),
                local_force=forces.local_force.at[j].set(jnp.asarray(lf.force)),
                local_point=forces.local_point.at[j].set(jnp.asarray(lf.point)),
                local_force_mask=forces.local_force_mask.at[j].set(True),
            )
        if world.has_component(eid, C.DynamicGravity):
            forces = forces._replace(
                gravity_participant=forces.gravity_participant.at[bi].set(True)
            )
        if world.has_component(eid, C.DetailedDrag):
            dd = world.get_component(eid, C.DetailedDrag)
            # analytic fallback area + a precomputed DragLoadMap from the
            # collidable shape's mesh (ref: force/detailed_drag.rs tables,
            # cached per drag_load_map_config)
            area = 1.0
            shape_mesh = None
            if world.has_component(eid, C.SphericalCollidable):
                r = world.get_component(eid, C.SphericalCollidable).radius
                area = float(np.pi * r * r)
                from ..scene.mesh import sphere_mesh

                shape_mesh = sphere_mesh(radius=float(r), n_rings=12, n_segments=24)
            elif world.has_component(eid, C.CapsularCollidable):
                cc2 = world.get_component(eid, C.CapsularCollidable)
                seg = float(np.linalg.norm(
                    np.asarray(cc2.segment_end) - np.asarray(cc2.segment_start)
                ))
                area = float(2 * cc2.radius * seg + np.pi * cc2.radius**2)
                from ..scene.mesh import capsule_mesh

                shape_mesh = capsule_mesh(
                    radius=float(cc2.radius), segment_length=seg,
                    n_rings=8, n_segments=24,
                )
            forces = forces._replace(
                drag_coef=forces.drag_coef.at[bi].set(dd.drag_coefficient),
                drag_area=forces.drag_area.at[bi].set(area),
            )
            if shape_mesh is not None:
                from ..physics.drag_map import get_or_build_drag_load_map

                dm_cfg = config.physics.rigid_body_force.drag_load_map_config
                n_theta = max(8, dm_cfg.n_theta_coords // 2)
                m = get_or_build_drag_load_map(
                    shape_mesh.positions, shape_mesh.indices,
                    n_theta=n_theta, n_phi=2 * n_theta,
                    directory=dm_cfg.directory,
                    use_saved=dm_cfg.use_saved_maps,
                    save_generated=dm_cfg.save_generated_maps,
                    overwrite=dm_cfg.overwrite_existing_map_files,
                )
                drag_tables.append(np.asarray(m.table))
                drag_map_index[bi] = len(drag_tables) - 1

        # motion drivers
        if world.has_component(eid, C.CircularTrajectory):
            d = world.get_component(eid, C.CircularTrajectory)
            j = cursor["circ"]; cursor["circ"] += 1
            dr = drivers
            drivers = dr._replace(
                circ_body=dr.circ_body.at[j].set(bi),
                circ_center=dr.circ_center.at[j].set(jnp.asarray(d.center)),
                circ_radius=dr.circ_radius.at[j].set(d.radius),
                circ_speed=dr.circ_speed.at[j].set(d.angular_speed),
                circ_axis=dr.circ_axis.at[j].set(jnp.asarray(d.axis)),
                circ_phase=dr.circ_phase.at[j].set(d.phase),
                circ_mask=dr.circ_mask.at[j].set(True),
            )
        if world.has_component(eid, C.HarmonicOscillation):
            d = world.get_component(eid, C.HarmonicOscillation)
            j = cursor["osc"]; cursor["osc"] += 1
            dr = drivers
            drivers = dr._replace(
                osc_body=dr.osc_body.at[j].set(bi),
                osc_center=dr.osc_center.at[j].set(jnp.asarray(d.center)),
                osc_dir=dr.osc_dir.at[j].set(jnp.asarray(d.direction)),
                osc_amplitude=dr.osc_amplitude.at[j].set(d.amplitude),
                osc_period=dr.osc_period.at[j].set(d.period),
                osc_phase=dr.osc_phase.at[j].set(d.phase),
                osc_mask=dr.osc_mask.at[j].set(True),
            )
        if world.has_component(eid, C.ConstantRotation):
            d = world.get_component(eid, C.ConstantRotation)
            j = cursor["rot"]; cursor["rot"] += 1
            dr = drivers
            drivers = dr._replace(
                rot_body=dr.rot_body.at[j].set(bi),
                rot_q0=dr.rot_q0.at[j].set(jnp.asarray(d.initial_orientation)),
                rot_omega=dr.rot_omega.at[j].set(jnp.asarray(d.angular_velocity)),
                rot_mask=dr.rot_mask.at[j].set(True),
            )
        if world.has_component(eid, C.OrbitalTrajectory):
            d = world.get_component(eid, C.OrbitalTrajectory)
            j = cursor["orb"]; cursor["orb"] += 1
            dr = drivers
            drivers = dr._replace(
                orb_body=dr.orb_body.at[j].set(bi),
                orb_focus=dr.orb_focus.at[j].set(jnp.asarray(d.focal_position)),
                orb_a=dr.orb_a.at[j].set(d.semi_major_axis),
                orb_e=dr.orb_e.at[j].set(d.eccentricity),
                orb_period=dr.orb_period.at[j].set(d.orbital_period),
                orb_orient=dr.orb_orient.at[j].set(jnp.asarray(d.orientation)),
                orb_phase=dr.orb_phase.at[j].set(d.phase),
                orb_mask=dr.orb_mask.at[j].set(True),
            )

        if world.has_component(eid, C.FixedDirectionAlignmentTorque):
            at = world.get_component(eid, C.FixedDirectionAlignmentTorque)
            j = cursor["align"]; cursor["align"] += 1
            forces = forces._replace(
                align_body=forces.align_body.at[j].set(bi),
                align_axis=forces.align_axis.at[j].set(jnp.asarray(at.axis)),
                align_target=forces.align_target.at[j].set(jnp.asarray(at.direction)),
                align_strength=forces.align_strength.at[j].set(at.strength),
                align_damping=forces.align_damping.at[j].set(at.damping),
                align_mask=forces.align_mask.at[j].set(True),
            )

        # absorbers
        if world.has_component(eid, C.VoxelAbsorbingSphere):
            ab = world.get_component(eid, C.VoxelAbsorbingSphere)
            j = cursor["absorb"]; cursor["absorb"] += 1
            absorbers = absorbers._replace(
                sph_body=absorbers.sph_body.at[j].set(bi),
                sph_offset=absorbers.sph_offset.at[j].set(jnp.asarray(ab.offset)),
                sph_radius=absorbers.sph_radius.at[j].set(ab.radius),
                sph_rate=absorbers.sph_rate.at[j].set(ab.rate),
                sph_mask=absorbers.sph_mask.at[j].set(True),
            )
        if world.has_component(eid, C.VoxelAbsorbingCapsule):
            ab = world.get_component(eid, C.VoxelAbsorbingCapsule)
            j = cursor["absorb_cap"]; cursor["absorb_cap"] += 1
            absorbers = absorbers._replace(
                cap_body=absorbers.cap_body.at[j].set(bi),
                cap_start=absorbers.cap_start.at[j].set(jnp.asarray(ab.segment_start)),
                cap_end=absorbers.cap_end.at[j].set(jnp.asarray(ab.segment_end)),
                cap_radius=absorbers.cap_radius.at[j].set(ab.radius),
                cap_rate=absorbers.cap_rate.at[j].set(ab.rate),
                cap_mask=absorbers.cap_mask.at[j].set(True),
            )
        world.strip_setup_components(eid)

    # --- pass 2.5: joints (need both bodies resolved) ---------------------------
    for eid in world.entities_with(C.SphericalJoint):
        sj = world.get_component(eid, C.SphericalJoint)
        ea, eb = int(sj.entity_a), int(sj.entity_b)
        if ea in entity_body and eb in entity_body:
            j = cursor["joint"]; cursor["joint"] += 1
            joints = joints._replace(
                body_a=joints.body_a.at[j].set(entity_body[ea]),
                body_b=joints.body_b.at[j].set(entity_body[eb]),
                anchor_a=joints.anchor_a.at[j].set(jnp.asarray(sj.anchor_a)),
                anchor_b=joints.anchor_b.at[j].set(jnp.asarray(sj.anchor_b)),
                mask=joints.mask.at[j].set(True),
            )
        world.strip_setup_components(eid)

    # --- pass 2.6: distance-triggered rules (need bodies resolved) --------------
    for eid in world.entities_with(C.DistanceTriggeredRules):
        dr = world.get_component(eid, C.DistanceTriggeredRules)
        anchor = int(dr.anchor_id)
        if eid in entity_body and anchor in entity_body:
            j = cursor["dist_rule"]; cursor["dist_rule"] += 1
            dist_rules = dist_rules._replace(
                body=dist_rules.body.at[j].set(entity_body[eid]),
                anchor_body=dist_rules.anchor_body.at[j].set(entity_body[anchor]),
                obj_slot=dist_rules.obj_slot.at[j].set(
                    entity_obj_slot.get(eid, -1)
                ),
                no_shadow_d2=dist_rules.no_shadow_d2.at[j].set(
                    dr.no_shadowing_dist_squared
                ),
                removal_d2=dist_rules.removal_d2.at[j].set(
                    dr.removal_dist_squared
                ),
                mask=dist_rules.mask.at[j].set(True),
            )

    # --- pass 2.7: renderable mesh-model entities -------------------------------
    # (recorded in pass 1.9 before the body passes stripped their setup
    # components; ref: impact_mesh/src/setup.rs + impact_material
    # setup/physical.rs:36-214. Entities become posed MeshInstancePool slots —
    # body-driven when they have a rigid body.)
    from ..scene.assembly import empty_mesh_instances

    m_cap = config.tpu.max_mesh_entities
    vm_cap = config.tpu.max_mesh_entity_verts
    tm_cap = config.tpu.max_mesh_entity_tris
    mesh_instances = _staged(empty_mesh_instances(m_cap, vm_cap, tm_cap))
    mesh_cursor = 0
    entity_texture_layers = []  # (albedo, normal, props) per textured entity

    for rec in mesh_pending:
        mi = mesh_cursor
        assert mi < m_cap, "mesh-entity pool exhausted (tpu.max_mesh_entities)"
        mesh_cursor += 1
        pos_l, nrm_l, idx_l = rec["pos_l"], rec["nrm_l"], rec["idx_l"]
        nv, nt = pos_l.shape[0], idx_l.shape[0]
        assert nv <= vm_cap and nt <= tm_cap, (
            f"mesh entity exceeds caps: {nv} verts/{nt} tris "
            f"(tpu.max_mesh_entity_verts/_tris)"
        )
        color, metal = rec["color"], rec["metal"]
        albedo = color * (1.0 - metal)
        f0 = np.full(3, rec["spec"], np.float32) * (1.0 - metal) + color * metal
        if rec["tex"]:
            # lower Textured*/NormalMap/ParallaxMap into one texture-array
            # layer; scale factors bake into the channels. Uniform fallbacks
            # fill untextured properties so shading can recompute the whole
            # material from the sampled stack (full-PBR layer).
            from ..render.textures import build_entity_material_layer

            tex = rec["tex"]
            size = config.tpu.texture_resolution

            def _prop(k, uniform):
                if k not in tex:
                    return uniform
                tid, scale = tex[k]
                t = _resolve_texture(tid, size, srgb=False)
                return t[..., 0] * scale if t is not None else uniform

            height = None
            if "parallax" in tex:
                tid, disp = tex["parallax"]
                hm = _resolve_texture(tid, size, srgb=False)
                if hm is not None:
                    height = hm[..., 0] * disp
            color_tex = (
                _resolve_texture(tex["color"], size, srgb=True)
                if "color" in tex else rec["color"]
            )
            normal_tex = (
                _resolve_texture(tex["normal"], size, srgb=False)
                if "normal" in tex else None
            )
            entity_texture_layers.append(build_entity_material_layer(
                size,
                color=color_tex,
                normal=normal_tex,
                roughness=_prop("rough", rec["rough"]),
                metalness=_prop("metal", rec["metal"]),
                specular=_prop("spec", rec["spec"]),
                emissive=_prop("emis", rec["emis"]),
                height=height,
            ))
            mesh_instances = mesh_instances._replace(
                material=mesh_instances.material.at[mi].set(
                    len(entity_texture_layers) - 1
                )
            )
        mesh_instances = mesh_instances._replace(
            vert_pos=mesh_instances.vert_pos.at[mi, :nv].set(pos_l),
            vert_normal=mesh_instances.vert_normal.at[mi, :nv].set(nrm_l),
            vert_active=mesh_instances.vert_active.at[mi, :nv].set(True),
            tri_indices=mesh_instances.tri_indices.at[mi, :nt].set(idx_l),
            tri_active=mesh_instances.tri_active.at[mi, :nt].set(True),
            albedo=mesh_instances.albedo.at[mi].set(albedo),
            f0=mesh_instances.f0.at[mi].set(f0),
            roughness=mesh_instances.roughness.at[mi].set(rec["rough"]),
            emissive=mesh_instances.emissive.at[mi].set(color * rec["emis"]),
            body_index=mesh_instances.body_index.at[mi].set(
                entity_body.get(rec["eid"], -1)
            ),
            position=mesh_instances.position.at[mi].set(rec["pos"]),
            orientation=mesh_instances.orientation.at[mi].set(rec["ori"]),
            alive=mesh_instances.alive.at[mi].set(True),
            casts_shadows=mesh_instances.casts_shadows.at[mi].set(rec["casts"]),
        )

    # --- pass 3: lights + camera ------------------------------------------------
    ambient = np.zeros(3, np.float32)
    for eid in world.entities_with(C.AmbientEmission):
        ambient += np.asarray(
            world.get_component(eid, C.AmbientEmission).illuminance
        )
    # uniform ambient luminance = illuminance / pi (ref: impact_light
    # lib.rs:1676 compute_luminance_for_uniform_illuminance)
    lights = lights._replace(ambient_luminance=jnp.asarray(ambient / np.pi))
    for comp, shadowable in ((C.OmnidirectionalEmission, False),
                             (C.ShadowableOmnidirectionalEmission, True)):
        for eid in world.entities_with(comp):
            e = world.get_component(eid, comp)
            pos, _ = frame_of(eid)
            j = cursor["omni"]; cursor["omni"] += 1
            lights = lights._replace(
                omni_position=lights.omni_position.at[j].set(pos),
                omni_intensity=lights.omni_intensity.at[j].set(
                    jnp.asarray(e.luminous_intensity)
                ),
                omni_extent=lights.omni_extent.at[j].set(e.source_extent),
                omni_shadowable=lights.omni_shadowable.at[j].set(shadowable),
                omni_mask=lights.omni_mask.at[j].set(True),
            )
    for comp, shadowable in ((C.UnidirectionalEmission, False),
                             (C.ShadowableUnidirectionalEmission, True)):
        for eid in world.entities_with(comp):
            e = world.get_component(eid, comp)
            j = cursor["uni"]; cursor["uni"] += 1
            d = np.asarray(e.direction, np.float32)
            d = d / max(np.linalg.norm(d), 1e-9)
            lights = lights._replace(
                uni_direction=lights.uni_direction.at[j].set(d),
                uni_illuminance=lights.uni_illuminance.at[j].set(
                    jnp.asarray(e.perpendicular_illuminance)
                ),
                uni_extent=lights.uni_extent.at[j].set(e.angular_source_extent),
                uni_shadowable=lights.uni_shadowable.at[j].set(shadowable),
                uni_mask=lights.uni_mask.at[j].set(True),
            )
    for eid in world.entities_with(C.PerspectiveCamera):
        pc = world.get_component(eid, C.PerspectiveCamera)
        pos, ori = frame_of(eid)
        camera = Camera(
            jnp.asarray(pos), jnp.asarray(ori),
            jnp.asarray(pc.vertical_field_of_view, jnp.float32),
            jnp.asarray(pc.near_distance, jnp.float32),
            jnp.asarray(pc.far_distance, jnp.float32),
        )
        world.strip_setup_components(eid)
    for eid in world.entities_with(C.OrthographicCamera):
        # true orthographic projection: the render pipeline switches on
        # config.tpu.orthographic_camera (ref: OrthographicCameraProjection,
        # projection.rs:196-236 — half-height = far·tan(fov/2))
        oc = world.get_component(eid, C.OrthographicCamera)
        pos, ori = frame_of(eid)
        camera = Camera(
            jnp.asarray(pos), jnp.asarray(ori),
            jnp.asarray(oc.vertical_field_of_view, jnp.float32),
            jnp.asarray(oc.near_distance, jnp.float32),
            jnp.asarray(oc.far_distance, jnp.float32),
        )
        config.tpu.orthographic_camera = True
        world.strip_setup_components(eid)

    # medium
    forces = forces._replace(
        medium_density=np.asarray(config.physics.medium.mass_density, np.float32),
        medium_velocity=np.asarray(config.physics.medium.velocity, np.float32),
    )

    # trim light pools to the scene's actual counts (static per scene) so
    # shadow passes and shading never process masked-off light slots
    n_omni = max(1, cursor["omni"])
    n_uni = max(1, cursor["uni"])
    lights = lights._replace(
        **{
            k: getattr(lights, k)[:n_omni]
            for k in lights._fields
            if k.startswith("omni_")
        },
        **{
            k: getattr(lights, k)[:n_uni]
            for k in lights._fields
            if k.startswith("uni_")
        },
    )

    # trim the mesh-instance pool to the scene's actual count
    n_mesh = mesh_cursor
    mesh_instances = jax.tree.map(lambda a: a[:n_mesh], mesh_instances)

    # trim collidable pools to the scene's actual counts (static per scene,
    # like the light pools): voxel_contacts builds [O,P,n_pool] candidate
    # sets per family, so unused pool slots multiply directly into the
    # per-step contact cost (the bench scene has 1 plane and 0 spheres;
    # untrimmed pools cost ~3 ms/step of dead candidates)
    n_sph = max(1, cursor["sphere"])
    n_pln = max(1, cursor["plane"])
    n_cap = max(1, cursor["capsule"])
    coll = coll._replace(
        **{k: getattr(coll, k)[:n_sph] for k in coll._fields
           if k.startswith("sph_")},
        **{k: getattr(coll, k)[:n_pln] for k in coll._fields
           if k.startswith("pln_")},
        **{k: getattr(coll, k)[:n_cap] for k in coll._fields
           if k.startswith("cap_")},
    )

    # commit numpy staging to device arrays
    bodies = _committed(bodies)
    coll = _committed(coll)
    forces = _committed(forces)
    drivers = _committed(drivers)
    lights = _committed(lights)
    absorbers = _committed(absorbers)
    joints = _committed(joints)
    pool = _committed(pool)
    dist_rules = _committed(dist_rules)
    mesh_instances = _committed(mesh_instances)
    from ..scene.assembly import bake_mesh_instance_corners

    mesh_instances = bake_mesh_instance_corners(mesh_instances)

    if drag_tables:
        forces = forces._replace(
            drag_map_table=jnp.asarray(np.stack(drag_tables)),
            drag_map_index=jnp.asarray(drag_map_index),
        )
    phys = phys._replace(bodies=apply_forces_and_torques(bodies, forces))

    params = EngineParams(
        phys_params=PhysicsParams(
            collidables=coll, forces=forces, drivers=drivers, joints=joints
        ),
        lights=lights,
        absorbers=absorbers,
        type_density=registry.mass_density,
        voxel_response=jnp.asarray(voxel_response),
        fracturable=jnp.asarray(fracturable),
        fracture_threshold=jnp.asarray(fracture_threshold),
        fracture_radius=jnp.asarray(fracture_radius),
        camera=camera,
        static_geometry=_build_static_geometry(static_geometry, ground_planes),
        dist_rules=dist_rules,
        casts_shadows_base=jnp.asarray(casts_shadows_base),
        mesh_instances=mesh_instances,
        material_table=material_corner_table(registry),
    )

    # initial meshes + voxel body sync (reuse the engine's sync helper)
    from .engine import _sync_voxel_bodies

    phys, pool = _sync_voxel_bodies(
        phys, pool, registry.mass_density, pool.mesh_dirty
    )
    from ..voxel.encoding import sdf_world as _sdf_world
    # Convert initial Motion velocities into momenta now that every dynamic
    # body (regular + voxel) has its final mass/inertia: p = m·v, L = I_w·ω
    # (ref: rigid_body.rs:423-437 sets momenta at creation). Without this,
    # dynamic bodies start with L = 0 and voxel bodies with p = L = 0
    # regardless of their Motion component.
    from ..physics.state import synchronize_momenta

    phys = phys._replace(
        bodies=synchronize_momenta(
            phys.bodies, phys.bodies.velocity, phys.bodies.angular_velocity
        )
    )
    mesh_vert_cap = config.tpu.mesh_vert_cap or min(4096, (g - 1) ** 3)
    mesh_tri_cap = config.tpu.mesh_tri_cap or min(8192, 6 * (g - 1) ** 3)
    if config.tpu.chunked_remesh:
        # chunk-gated meshing: shared chunk-submesh slot pool, meshed to
        # completion here (host loop; the engine step re-meshes
        # incrementally per budget)
        from ..voxel.chunk_mesh import (
            empty_chunk_mesh_pool,
            mark_objects_dirty,
            n_chunks_per_object,
            remesh_chunks,
        )

        s_max = config.tpu.chunk_submesh_slots or min(
            o_max * n_chunks_per_object(g), 1024
        )
        meshes = empty_chunk_mesh_pool(
            s_max, config.tpu.chunk_tri_cap, o_max, g
        )
        meshes = mark_objects_dirty(meshes, pool.alive)
        setup_budget = 64
        for _ in range(-(-o_max * n_chunks_per_object(g) // setup_budget)):
            if not bool(jnp.any(meshes.chunk_dirty & pool.alive[:, None])):
                break
            meshes = remesh_chunks(
                meshes, pool, params.material_table, setup_budget,
                config.tpu.chunk_vert_cap,
                merge_levels=config.tpu.mesh_merge_levels,
            )
        if int(meshes.n_dropped_chunks) > 0:
            raise ValueError(
                "chunk-submesh pool exhausted at setup: "
                f"{int(meshes.n_dropped_chunks)} surface chunks blocked "
                "(raise tpu.chunk_submesh_slots)"
            )
    else:
        # mesh each DISTINCT shape signature once, then gather to object
        # slots (62 identical bench boxes = 1 surface-nets run, not 62).
        # The unique count is padded to a power-of-two bucket so scenes with
        # similar shape diversity share ONE compiled meshing program (the
        # in-process jit cache keys on shapes; the compile costs ~20 s/CPU)
        n_uniq = len(uniq_sdf)
        bucket = max(2, 1 << (n_uniq - 1).bit_length()) if n_uniq else 2
        while len(uniq_sdf) < min(bucket, o_max + 1):
            if sdf_dtype == _jnp.int8:
                uniq_sdf.append(jnp.full((g, g, g), 127, jnp.int8))
            else:
                uniq_sdf.append(jnp.full((g, g, g), 1e3, jnp.float32))
            uniq_vt.append(jnp.zeros((g, g, g), jnp.int32))
            uniq_extent.append(1.0)
        if np.any(uidx_of_obj < 0):  # dead slots → the shared empty entry
            if n_uniq == len(uniq_sdf):  # bucket full of real shapes
                if sdf_dtype == _jnp.int8:
                    uniq_sdf.append(jnp.full((g, g, g), 127, jnp.int8))
                else:
                    uniq_sdf.append(jnp.full((g, g, g), 1e3, jnp.float32))
                uniq_vt.append(jnp.zeros((g, g, g), jnp.int32))
                uniq_extent.append(1.0)
            uidx_of_obj = np.where(uidx_of_obj < 0, n_uniq, uidx_of_obj)
        full = make_surface_nets_batched(config.tpu.mesh_merge_levels)(
            _sdf_world(jnp.stack(uniq_sdf), jnp.asarray(uniq_extent, jnp.float32)),
            jnp.stack(uniq_vt),
        )
        meshes_u = compact_mesh_batched(full, mesh_vert_cap, mesh_tri_cap)
        from ..voxel.mesh import bake_mesh_materials

        meshes_u = bake_mesh_materials(meshes_u, params.material_table)
        u_idx = jnp.asarray(uidx_of_obj)
        meshes = jax.tree.map(lambda a: a[u_idx], meshes_u)
    pool = pool._replace(mesh_dirty=jnp.zeros_like(pool.mesh_dirty))

    from ..render.pipeline import RenderConfig, init_render_state
    from ..voxel.collision import extract_probes

    render_cfg = render_config_from_engine_config(config)
    sim = SimState(
        phys=phys,
        voxels=pool,
        meshes=meshes,
        probes=extract_probes(pool, jnp.asarray(voxel_response)),
        render=init_render_state(render_cfg),
        prev_position=phys.bodies.position,
        prev_orientation=phys.bodies.orientation,
        rng=jax.random.PRNGKey(rng_seed),
    )
    info.update(mesh_vert_cap=mesh_vert_cap, mesh_tri_cap=mesh_tri_cap,
                n_regular_bodies=cursor["body"], n_voxel_objects=cursor["voxel"],
                entity_texture_layers=entity_texture_layers)
    return SceneBuildResult(sim, params, info)


def _build_static_geometry(user_geometry, ground_planes):
    """Combine user-supplied static geometry with auto-generated render quads
    for y-up planar collidables (the reference renders floors as meshed
    entities; planes here get an implicit quad so scenes look right)."""
    from ..scene.assembly import ground_plane_geometry

    parts = []
    if user_geometry is not None:
        parts.append(user_geometry)
    for y in ground_planes:
        parts.append(ground_plane_geometry(y=y))
    from ..scene.assembly import bake_static_geometry_corners

    if not parts:
        return empty_static_geometry()
    if len(parts) == 1:
        return bake_static_geometry_corners(parts[0])
    # concatenate with vertex offsets
    out = parts[0]
    for p in parts[1:]:
        base = out.vert_pos.shape[0]
        out = type(out)(
            vert_pos=jnp.concatenate([out.vert_pos, p.vert_pos]),
            vert_normal=jnp.concatenate([out.vert_normal, p.vert_normal]),
            vert_albedo=jnp.concatenate([out.vert_albedo, p.vert_albedo]),
            vert_f0=jnp.concatenate([out.vert_f0, p.vert_f0]),
            vert_roughness=jnp.concatenate([out.vert_roughness, p.vert_roughness]),
            vert_emissive=jnp.concatenate([out.vert_emissive, p.vert_emissive]),
            vert_material=jnp.concatenate([out.vert_material, p.vert_material]),
            tri_indices=jnp.concatenate([out.tri_indices, p.tri_indices + base]),
            tri_active=jnp.concatenate([out.tri_active, p.tri_active]),
        )
    return bake_static_geometry_corners(out)


def render_config_from_engine_config(config: EngineConfig):
    from ..render.pipeline import RenderConfig

    r = config.rendering
    tone = r.capturing_camera.dynamic_range_compression.tone_mapping_method
    # RON `None` parses to Python None = the explicit ToneMappingMethod::None
    # variant (dynamic_range_compression.rs:37-41); absence keeps the "ACES"
    # dataclass default
    tone = "None" if tone is None else getattr(tone, "name", tone)
    cam = r.capturing_camera.settings
    ev = 0.0
    iso = None
    sens = cam.sensitivity
    if sens is not None and getattr(sens, "fields", None):
        ev = sens.fields.get("ev_compensation", 0.0)
        # Manual { iso } (ref: capturing.rs SensorSensitivity) fixes exposure
        if getattr(sens, "name", "") == "Manual" or "iso" in sens.fields:
            iso = sens.fields.get("iso")
    backend = config.tpu.raster_backend
    if backend == "auto":
        # Pallas kernels are TPU-only; CPU (tests, parity suite, virtual
        # meshes) uses the XLA tile raster, which the kernel is tested against
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    return RenderConfig(
        raster_backend=backend,
        view_culling=config.tpu.view_culling,
        exposure_iso=iso,
        relative_aperture=cam.relative_aperture,
        shutter_duration=cam.shutter_duration,
        width=config.tpu.render_width,
        height=config.tpu.render_height,
        shadow_map_resolution=r.shadow_mapping.omnidirectional_light_shadow_map_resolution,
        ao_enabled=r.ambient_occlusion.enabled,
        ao_sample_count=r.ambient_occlusion.sample_count,
        ao_sample_radius=r.ambient_occlusion.sample_radius,
        ao_intensity=r.ambient_occlusion.intensity,
        ao_contrast=r.ambient_occlusion.contrast,
        taa_enabled=r.temporal_anti_aliasing.enabled,
        taa_current_frame_weight=r.temporal_anti_aliasing.current_frame_weight,
        taa_variance_clipping_threshold=r.temporal_anti_aliasing.variance_clipping_threshold,
        bloom_enabled=r.capturing_camera.bloom.enabled,
        bloom_n_downsamplings=r.capturing_camera.bloom.n_downsamplings,
        bloom_blurred_luminance_weight=r.capturing_camera.bloom.blurred_luminance_weight,
        exposure_ev_compensation=ev,
        exposure_lower=cam.exposure_bounds.lower,
        exposure_upper=cam.exposure_bounds.upper,
        luminance_lower=r.capturing_camera.average_luminance_computation.luminance_bounds.lower,
        luminance_upper=r.capturing_camera.average_luminance_computation.luminance_bounds.upper,
        exposure_current_frame_weight=r.capturing_camera.average_luminance_computation.current_frame_weight,
        tone_mapping=tone,
        shadows_enabled=r.shadow_mapping.enabled,
        csm_cascades=config.tpu.csm_cascades,
        max_triangles=config.tpu.max_render_triangles,
        textured=config.tpu.textured_voxels,
        shadow_pcf_downsample=2 if config.tpu.render_height >= 720 else 1,
        ao_downsample=2 if config.tpu.render_height >= 720 else 1,
        soft_shadows=config.tpu.soft_shadows,
        procedural_sky=config.tpu.procedural_sky,
        orthographic=config.tpu.orthographic_camera,
        bf16_shading=config.tpu.bf16_shading,
        sky_luminance=tuple(config.tpu.sky_luminance),
    )
