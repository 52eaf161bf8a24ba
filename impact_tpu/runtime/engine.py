"""Engine orchestration: scene compilation + the jitted frame step.

Ref: engine/src/engine.rs (Engine owning every subsystem), engine/src/tasks.rs
(the 38-task frame DAG), engine/src/setup.rs:18-69 (setup-component pipeline).

TPU redesign (SURVEY.md §7.0): the frame DAG collapses into one jitted
``engine_step`` (physics + voxel deformation + remeshing) and one jitted
``render_frame``. Host-side remains scene compilation (ECS world → device
pools), screenshot IO, and metric logging.

Static slot mapping: voxel object slot ``i`` always binds to rigid-body slot
``voxel_body_offset + i`` — fragment creation activates a precomputed slot
instead of allocating, which keeps split/fracture entirely on-device
(§7.3.2 dynamic topology under static shapes).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ecs import World, components as C
from ..math import quaternion as quat
from ..physics import (
    KIND_DYNAMIC,
    KIND_KINEMATIC,
    PhysicsParams,
    PhysicsState,
    init_physics_state,
)
from ..physics import inertia as analytic_inertia
from ..physics.collision import empty_collidable_pools
from ..physics.driven_motion import empty_motion_driver_pools
from ..physics.forces import apply_forces_and_torques, empty_force_pools
from ..physics.step import physics_step
from ..render import Camera, LightPools, RenderConfig, empty_light_pools
from ..render.pipeline import RenderState, init_render_state, render_frame
from ..scene.assembly import (
    MeshInstancePool,
    StaticGeometry,
    build_render_scene,
    empty_static_geometry,
    ground_plane_geometry,
)
from ..scene.materials import VoxelTypeRegistry, default_registry
from ..utils.config import EngineConfig
from ..voxel import sdf as sdflib
from ..voxel.collision import extract_probes, merge_contact_buffers, voxel_contacts
from ..voxel.inertia import inertial_properties
from ..voxel.interaction import (
    AbsorberPools,
    apply_absorption,
    empty_absorber_pools,
    fracture_object,
    split_off_disconnected_regions,
)
from ..voxel.mesh import (
    CompactMesh,
    bake_mesh_materials,
    compact_mesh_batched,
    make_surface_nets_batched,
)
from ..voxel.object import VoxelObjectPool, empty_voxel_object_pool, generate_sdf_grid


class SimState(NamedTuple):
    """Full device-resident simulation state."""

    phys: PhysicsState
    voxels: VoxelObjectPool
    meshes: CompactMesh  # [O, ...] compacted surface meshes
    probes: "VoxelProbes"  # [O,P] cached collision probes (refresh on remesh)
    render: RenderState
    prev_position: jnp.ndarray  # f32[N,3] body poses at previous frame
    prev_orientation: jnp.ndarray  # f32[N,4]
    rng: jnp.ndarray  # PRNG key


class DistanceRulePools(NamedTuple):
    """Distance-triggered rules (ref: impact_scene DistanceTriggeredRules —
    disable shadow casting / remove the entity beyond distances from an
    anchor entity, systems.rs:80)."""

    body: jnp.ndarray  # i32[Dr] ruled entity's body slot
    anchor_body: jnp.ndarray  # i32[Dr] anchor entity's body slot
    obj_slot: jnp.ndarray  # i32[Dr] voxel-object slot (−1 = not voxel-bound)
    no_shadow_d2: jnp.ndarray  # f32[Dr]
    removal_d2: jnp.ndarray  # f32[Dr]
    mask: jnp.ndarray  # bool[Dr]


def empty_distance_rule_pools(cap: int = 16) -> DistanceRulePools:
    return DistanceRulePools(
        body=jnp.zeros(cap, jnp.int32),
        anchor_body=jnp.zeros(cap, jnp.int32),
        obj_slot=jnp.full(cap, -1, jnp.int32),
        no_shadow_d2=jnp.full(cap, 1e30, jnp.float32),
        removal_d2=jnp.full(cap, 1e30, jnp.float32),
        mask=jnp.zeros(cap, bool),
    )


class EngineParams(NamedTuple):
    """Scene-constant device parameters."""

    phys_params: PhysicsParams
    lights: LightPools
    absorbers: AbsorberPools
    type_density: jnp.ndarray  # f32[T]
    voxel_response: jnp.ndarray  # f32[O,3] contact response per voxel object
    fracturable: jnp.ndarray  # bool[O]
    fracture_threshold: jnp.ndarray  # f32[O]
    fracture_radius: jnp.ndarray  # f32[O]
    camera: Camera
    static_geometry: StaticGeometry
    dist_rules: DistanceRulePools
    casts_shadows_base: jnp.ndarray  # bool[O] scene-flag shadow casting
    mesh_instances: MeshInstancePool  # renderable mesh-model entities
    material_table: jnp.ndarray  # f32[T,10] packed voxel-type materials


def gather_objects(pool: VoxelObjectPool, idx) -> VoxelObjectPool:
    """Subset view of the pool at object slots ``idx`` (i32[R])."""
    return jax.tree.map(lambda a: a[idx], pool)


def _sync_voxel_bodies(phys: PhysicsState, pool: VoxelObjectPool, type_density, sync_mask):
    """Refresh body mass/inertia (and COM alignment) for masked voxel objects.

    The body origin is kept at the object's COM: position shifts by R·Δcom and
    the grid origin compensates (ref: object/inertia.rs property transfer)."""
    mass, com, inertia = inertial_properties(pool, type_density)
    bodies = phys.bodies
    bidx = pool.body_index
    sm = sync_mask & pool.alive & (mass > 1e-9)

    r_q = bodies.orientation[bidx]
    shift_world = quat.rotate(r_q, com)
    new_pos = bodies.position[bidx] + shift_world
    new_origin = pool.origin - com

    inv_inertia = jnp.linalg.inv(
        inertia + jnp.eye(3) * 1e-12
    )
    kind = jnp.where(sm, KIND_DYNAMIC, bodies.kind[bidx])
    bodies = bodies._replace(
        kind=bodies.kind.at[bidx].set(kind),
        mass=bodies.mass.at[bidx].set(jnp.where(sm, mass, bodies.mass[bidx])),
        inv_mass=bodies.inv_mass.at[bidx].set(
            jnp.where(sm, 1.0 / jnp.maximum(mass, 1e-9), bodies.inv_mass[bidx])
        ),
        inertia_body=bodies.inertia_body.at[bidx].set(
            jnp.where(sm[:, None, None], inertia, bodies.inertia_body[bidx])
        ),
        inv_inertia_body=bodies.inv_inertia_body.at[bidx].set(
            jnp.where(sm[:, None, None], inv_inertia, bodies.inv_inertia_body[bidx])
        ),
        position=bodies.position.at[bidx].set(
            jnp.where(sm[:, None], new_pos, bodies.position[bidx])
        ),
    )
    pool = pool._replace(
        origin=jnp.where(sm[:, None], new_origin, pool.origin)
    )
    return phys._replace(bodies=bodies), pool


def _inherit_fragment_motion(phys: PhysicsState, pool: VoxelObjectPool, src_body, new_mask):
    """Give newly activated fragment bodies the source body's pose and the
    source's point velocity at their COM (momentum conservation per fragment)."""
    bodies = phys.bodies
    bidx = pool.body_index
    from ..physics.state import compute_velocities, synchronize_momenta

    v, w = compute_velocities(bodies)
    src_pos = bodies.position[src_body]
    src_ori = bodies.orientation[src_body]
    bodies = bodies._replace(
        position=bodies.position.at[bidx].set(
            jnp.where(new_mask[:, None], src_pos[None, :], bodies.position[bidx])
        ),
        orientation=bodies.orientation.at[bidx].set(
            jnp.where(new_mask[:, None], src_ori[None, :], bodies.orientation[bidx])
        ),
    )
    # after COM sync the fragment position differs from src; velocity of that
    # point on the source: v + ω×r
    frag_pos = bodies.position[bidx]
    r = frag_pos - src_pos[None, :]
    v_point = v[src_body][None, :] + jnp.cross(
        jnp.broadcast_to(w[src_body][None, :], r.shape), r
    )
    new_v = jnp.where(new_mask[:, None], v_point, v[bidx])
    new_w = jnp.where(new_mask[:, None], w[src_body][None, :], w[bidx])
    vv = v.at[bidx].set(new_v)
    ww = w.at[bidx].set(new_w)
    sel = jnp.zeros(bodies.n, bool).at[bidx].set(new_mask, mode="drop")
    synced = synchronize_momenta(bodies, vv, ww)
    bodies = bodies._replace(
        momentum=jnp.where(sel[:, None], synced.momentum, bodies.momentum),
        angular_momentum=jnp.where(
            sel[:, None], synced.angular_momentum, bodies.angular_momentum
        ),
        velocity=jnp.where(sel[:, None], vv, bodies.velocity),
        angular_velocity=jnp.where(sel[:, None], ww, bodies.angular_velocity),
    )
    return phys._replace(bodies=bodies)


def make_engine_step(
    params: EngineParams,
    config: EngineConfig,
    mesh_vert_cap: int,
    mesh_tri_cap: int,
    enable_voxel_contacts: bool = True,
    enable_absorption: bool = True,
    enable_splitting: bool = True,
    enable_fracturing: bool = True,
    remesh_budget: int | None = None,
):
    """Build the jitted engine step closure (static features baked in).

    ``remesh_budget``: max voxel objects re-synced/re-meshed per step (the
    incremental analog of the reference's invalidated-chunk remeshing,
    mesh.rs:360 — objects beyond the budget stay dirty and are processed on
    following steps). Default min(O, 4).
    """
    dt = config.physics.simulator.initial_time_step_duration
    n_substeps = config.physics.simulator.n_substeps
    solver_cfg = config.physics.constraint_solver
    max_contacts = config.tpu.max_contacts
    solver_mode = config.tpu.solver_mode
    o_max = config.tpu.max_voxel_objects
    if remesh_budget is None:
        # a fracture event dirties up to max_fracture_fragments ×
        # max_fracture_events objects in one step; meshing them the step they
        # appear keeps their cached collision probes fresh (VERDICT-r2 item 5
        # — fragments colliding with stale probes). Without fracturing only
        # splits/absorption dirty objects, a trickle.
        if enable_fracturing:
            remesh_budget = min(
                o_max,
                max(
                    4,
                    config.tpu.max_fracture_fragments
                    * config.tpu.max_fracture_events,
                ),
            )
        else:
            remesh_budget = min(o_max, 4)

    chunked = bool(config.tpu.chunked_remesh)
    if chunked:
        from ..voxel.chunk_mesh import (
            mark_chunks_dirty as _cm_mark_chunks,
            mark_objects_dirty as _cm_mark,
            remesh_chunks as _cm_remesh,
            reset_objects as _cm_reset,
        )
        from ..voxel.interaction import apply_absorption_chunk_gated

        chunk_budget = config.tpu.chunk_remesh_budget
        chunk_vert_cap = config.tpu.chunk_vert_cap
        absorb_chunk_budget = config.tpu.absorption_chunk_budget

    # scenes without absorbers skip the O(O·G³) absorption pass entirely
    # (static decision — the absorber pools are scene constants)
    has_absorbers = bool(
        np.any(np.asarray(params.absorbers.sph_mask))
        or np.any(np.asarray(params.absorbers.cap_mask))
    )
    has_dist_rules = bool(np.any(np.asarray(params.dist_rules.mask)))

    def _apply_distance_rules(phys, pool, params):
        """Ref: impact_scene/src/systems.rs:80 — beyond no_shadow distance the
        entity stops casting shadows; beyond removal distance it is removed
        (body deactivated, voxel slot freed)."""
        r = params.dist_rules
        bodies = phys.bodies
        d2 = jnp.sum(
            (bodies.position[r.body] - bodies.position[r.anchor_body]) ** 2,
            axis=-1,
        )
        remove = r.mask & (d2 > r.removal_d2)
        no_shadow = r.mask & (d2 > r.no_shadow_d2)

        kind = jnp.where(remove, 0, bodies.kind[r.body])
        bodies = bodies._replace(kind=bodies.kind.at[r.body].set(kind))

        slot = jnp.where(r.obj_slot >= 0, r.obj_slot, pool.n_objects)
        alive = pool.alive.at[slot].set(
            jnp.where(remove, False, pool.alive[jnp.clip(slot, 0, pool.n_objects - 1)]),
            mode="drop",
        )
        casts = pool.casts_shadows.at[slot].set(
            params.casts_shadows_base[jnp.clip(slot, 0, pool.n_objects - 1)]
            & ~no_shadow,
            mode="drop",
        )
        return phys._replace(bodies=bodies), pool._replace(
            alive=alive, casts_shadows=casts
        )

    def extra_contacts(pool, probes, params):
        def fn(bodies, contacts):
            vc = voxel_contacts(
                pool, probes, params.phys_params.collidables,
                bodies.position, bodies.orientation, max_contacts,
            )
            return merge_contact_buffers(contacts, vc, max_contacts)

        return fn

    def step(sim: SimState, params: EngineParams) -> SimState:
        phys, pool = sim.phys, sim.voxels
        prev_pos = phys.bodies.position
        prev_ori = phys.bodies.orientation

        # 0. distance-triggered rules (ref task HandleDistanceTriggeredEntityRules)
        if has_dist_rules:
            phys, pool = _apply_distance_rules(phys, pool, params)

        # 1. physics (with cached voxel probe contacts merged in)
        phys = physics_step(
            phys, params.phys_params, dt, n_substeps, solver_cfg,
            max_contacts, solver_mode,
            extra_contacts_fn=(
                extra_contacts(pool, sim.probes, params)
                if enable_voxel_contacts
                else None
            ),
        )

        # 2. absorption (ref task ApplyVoxelAbsorption). In chunked mode the
        #    carve is chunk-gated — O(B·16³·A) on absorber-overlapped chunk
        #    windows, independent of grid volume (ref: absorption.rs:434) —
        #    and reports chunk-granular dirt so only the touched chunks'
        #    submeshes re-mesh; the dense/object-gated path invalidates
        #    whole objects.
        absorb_changed = None
        absorb_chunks = None
        if enable_absorption and has_absorbers:
            if chunked:
                step_no = jnp.round(phys.time / dt).astype(jnp.int32)
                pool, absorb_changed, absorb_chunks, _ = (
                    apply_absorption_chunk_gated(
                        pool, params.absorbers, phys.bodies.position,
                        phys.bodies.orientation, absorb_chunk_budget,
                        rotation=step_no * absorb_chunk_budget,
                    )
                )
            else:
                pool = apply_absorption(
                    pool, params.absorbers, phys.bodies.position,
                    phys.bodies.orientation,
                    gate_cap=min(config.tpu.absorption_gate_cap, o_max),
                )

        # 3. fracturing on impact impulse (ref task ExecuteVoxelObjectFracturing)
        rng = sim.rng
        if enable_fracturing:
            phys, pool, rng = _maybe_fracture(phys, pool, rng, params)

        # 4. split detection for one dirty object (ref: incremental split
        #    handling — one extraction per frame)
        if enable_splitting:
            phys, pool = _maybe_split(phys, pool)

        # 5. inertia/COM sync + remesh + probe refresh for up to
        #    ``remesh_budget`` dirty objects (gathered — cost is O(R·G³), not
        #    O(O·G³); the rest stay dirty for following steps). In chunked
        #    mode the expensive surface meshing moves to the per-CHUNK pass
        #    below; this sync keeps the cheap elementwise work (inertia,
        #    probes) object-granular.
        meshes = sim.meshes
        if chunked:
            # object slots reused for new fragments must detach from the
            # submesh pool before their chunks re-mesh (stale slot_of
            # entries would alias recycled slots)
            new_objs = pool.alive & ~sim.voxels.alive
            meshes = _cm_reset(meshes, new_objs)
            # whole-object invalidation only for topology events (fracture/
            # split) and pre-existing dirt — pool.mesh_dirty here, since the
            # chunk-gated absorber pass above deliberately did not set it.
            # Absorption contributes chunk-granular dirt, then joins
            # mesh_dirty so the object-level inertia/COM/probe sync below
            # still runs for carved objects.
            meshes = _cm_mark(meshes, pool.mesh_dirty)
            if absorb_chunks is not None:
                meshes = _cm_mark_chunks(meshes, absorb_chunks)
                pool = pool._replace(
                    mesh_dirty=pool.mesh_dirty | absorb_changed
                )
        dirty = pool.mesh_dirty
        any_dirty = jnp.any(dirty)

        def do_sync(args):
            phys, pool, meshes, probes = args
            order = jnp.argsort(~dirty, stable=True)[:remesh_budget].astype(
                jnp.int32
            )
            sel = dirty[order]  # [R]
            sub = gather_objects(pool, order)
            phys2, sub2 = _sync_voxel_bodies(
                phys, sub, params.type_density, sel
            )
            pool2 = pool._replace(
                origin=pool.origin.at[order].set(
                    jnp.where(sel[:, None], sub2.origin, pool.origin[order])
                ),
                mesh_dirty=pool.mesh_dirty.at[order].set(
                    jnp.where(sel, False, pool.mesh_dirty[order])
                ),
            )
            sub2 = sub2._replace(origin=pool2.origin[order])
            if not chunked:
                from ..voxel.encoding import sdf_world

                full = make_surface_nets_batched(
                    config.tpu.mesh_merge_levels
                )(sdf_world(sub2.sdf, sub2.voxel_extent), sub2.vtype)
                sub_mesh = compact_mesh_batched(
                    full, mesh_vert_cap, mesh_tri_cap
                )
                sub_mesh = bake_mesh_materials(
                    sub_mesh, params.material_table
                )
                meshes2 = jax.tree.map(
                    lambda old, new: old.at[order].set(
                        jnp.where(
                            sel.reshape((-1,) + (1,) * (new.ndim - 1)),
                            new, old[order]
                        )
                    ),
                    meshes,
                    sub_mesh,
                )
            else:
                meshes2 = meshes
            sub_probes = extract_probes(sub2, params.voxel_response[order])
            probes2 = jax.tree.map(
                lambda old, new: old.at[order].set(
                    jnp.where(
                        sel.reshape((-1,) + (1,) * (new.ndim - 1)), new, old[order]
                    )
                ),
                probes,
                sub_probes,
            )
            return phys2, pool2, meshes2, probes2

        phys, pool, meshes, probes = jax.lax.cond(
            any_dirty, do_sync, lambda a: a, (phys, pool, meshes, sim.probes)
        )

        # 5b. chunk-gated surface remesh: up to ``chunk_budget`` dirty
        #     surface chunks per step — cost tracks the surface-chunk count,
        #     never O·G³ (ref: mesh.rs:360 incremental invalidated-chunk
        #     remeshing)
        if chunked:
            meshes = jax.lax.cond(
                jnp.any(meshes.chunk_dirty & pool.alive[:, None]),
                lambda m: _cm_remesh(
                    m, pool, params.material_table, chunk_budget,
                    chunk_vert_cap,
                    merge_levels=config.tpu.mesh_merge_levels,
                ),
                lambda m: m,
                meshes,
            )

        return SimState(
            phys=phys,
            voxels=pool,
            meshes=meshes,
            probes=probes,
            render=sim.render,
            prev_position=prev_pos,
            prev_orientation=prev_ori,
            rng=rng,
        )

    impact_cfg = config.voxel.interaction.fracturing.impact
    n_seeds = max(
        2,
        min(
            impact_cfg.max_fragment_count,
            config.tpu.max_fracture_fragments,
            o_max,
        ),
    )
    n_events = min(config.tpu.max_fracture_events, o_max)

    def _maybe_fracture(phys: PhysicsState, pool: VoxelObjectPool, rng, params: EngineParams):
        """Fracture the voxel objects with over-threshold contact impulses —
        up to ``n_events`` concurrent events per step, ``n_seeds`` fragments
        each (ref: fracturing.rs:508 handle_fracturing_impacts consuming
        cached collision impulses; :338-371 fans all fragments out)."""
        cache = phys.solver_cache
        imp_n = jnp.where(cache.active, cache.impulses[:, 0], 0.0)  # [C]
        body_of_obj = pool.body_index  # [O]
        involved = (cache.body_a[None, :] == body_of_obj[:, None]) | (
            cache.body_b[None, :] == body_of_obj[:, None]
        )  # [O,C]
        imp_per_obj = jnp.max(jnp.where(involved, imp_n[None, :], 0.0), axis=1)
        best_contact = jnp.argmax(jnp.where(involved, imp_n[None, :], -1.0), axis=1)

        exceed = (
            params.fracturable
            & pool.alive
            & (imp_per_obj > params.fracture_threshold)
        )
        top_imp, top_obj = jax.lax.top_k(
            jnp.where(exceed, imp_per_obj, -jnp.inf), n_events
        )

        # disjoint free-slot ranges per event, computed up front (events mark
        # slots alive as they run, but their ranges never collide)
        free_order = jnp.argsort(pool.alive, stable=True)  # free slots first
        free_all = jnp.where(
            ~pool.alive[free_order], free_order, -1
        ).astype(jnp.int32)

        state = (phys, pool, rng)
        for e in range(n_events):
            target = top_obj[e]
            valid_e = jnp.isfinite(top_imp[e])
            lo = e * (n_seeds - 1)
            if lo + n_seeds - 1 <= o_max:
                free_slots = free_all[lo : lo + n_seeds - 1]
            else:
                free_slots = jnp.full(n_seeds - 1, -1, jnp.int32)

            def do(args, target=target, free_slots=free_slots):
                phys, pool, rng = args
                rng, sub = jax.random.split(rng)
                tb = pool.body_index[target]
                impact_world = cache.position[best_contact[target]]
                impact_local = quat.inverse_rotate(
                    phys.bodies.orientation[tb],
                    impact_world - phys.bodies.position[tb],
                )
                pool2 = fracture_object(
                    pool, target, impact_local, sub, free_slots,
                    params.fracture_radius[target], n_seeds, impact_cfg,
                )
                new_mask = pool2.alive & ~pool.alive
                phys2 = _inherit_fragment_motion(phys, pool2, tb, new_mask)
                return phys2, pool2, rng

            state = jax.lax.cond(valid_e, do, lambda a: a, state)
        return state

    n_split_objs = max(1, min(config.tpu.max_split_objects, o_max))
    n_split_regions = max(1, min(config.tpu.max_split_regions, o_max))

    def _maybe_split(phys: PhysicsState, pool: VoxelObjectPool):
        # up to ``max_split_objects`` pending objects checked per step, each
        # extracting up to ``max_split_regions`` disconnected regions from
        # one CCL labeling — a multi-way shatter that also disconnects
        # settles in ~1 step instead of one region per step (ref:
        # extraction.rs:78 extracts all regions as found). Pending flags
        # persist across steps until CCL confirms connectivity.
        candidates = pool.split_pending & pool.alive
        _, cand_objs = jax.lax.top_k(
            candidates.astype(jnp.int32), n_split_objs
        )
        cand_valid = candidates[cand_objs]

        # disjoint free-slot ranges per event (events mark slots alive as
        # they run, but their ranges never collide — same pattern as
        # _maybe_fracture)
        free_order = jnp.argsort(pool.alive, stable=True)
        free_all = jnp.where(
            ~pool.alive[free_order], free_order, -1
        ).astype(jnp.int32)

        state = (phys, pool)
        for e in range(n_split_objs):
            obj = cand_objs[e]
            lo = e * n_split_regions
            if lo + n_split_regions <= o_max:
                slots = free_all[lo : lo + n_split_regions]
            else:
                slots = jnp.full(n_split_regions, -1, jnp.int32)

            def do(args, obj=obj, slots=slots):
                phys, pool = args
                # the extraction clears/keeps the source's pending flag
                # itself (components remaining — e.g. blocked on slots —
                # stay pending; confirmed-connected clears)
                pool2, n_new, _ = split_off_disconnected_regions(
                    pool, obj, slots
                )
                # new fragments get body pose/velocity from the source
                new_mask = pool2.alive & ~pool.alive
                phys2 = _inherit_fragment_motion(
                    phys, pool2, pool.body_index[obj], new_mask
                )
                return phys2, pool2

            state = jax.lax.cond(cand_valid[e], do, lambda a: a, state)
        return state

    return step
