"""Debug-visualization gizmos drawn over the rendered frame.

Ref: impact_gizmo — 21 gizmo types (lib.rs:39-61): reference-frame axes,
bounding volumes, light spheres, center of mass, linear/angular velocity,
force/torque, colliders, contacts, voxel chunks, … rendered by dedicated
passes over the scene.

TPU design: gizmos are a masked pool of colored line segments [L,2,3] built
from the sim state by :func:`build_gizmo_lines`; :func:`overlay_lines`
projects and splats them into the frame (S samples per segment, scatter-add)
— one fused op, no extra raster pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..math import quaternion as quat

# gizmo kinds (ref: impact_gizmo/src/lib.rs:39-61 — the 21 GizmoTypes; the
# line-pool design covers each as a set of colored segments)
GIZMO_AXES = "reference_frame_axes"
GIZMO_LINEAR_VELOCITY = "linear_velocity"
GIZMO_ANGULAR_VELOCITY = "angular_velocity"
GIZMO_ANGULAR_MOMENTUM = "angular_momentum"
GIZMO_FORCE = "force"
GIZMO_TORQUE = "torque"
GIZMO_CENTER_OF_MASS = "center_of_mass"
GIZMO_CONTACTS = "contacts"
GIZMO_COLLIDERS = "colliders"  # all collider kinds at once
GIZMO_BOUNDING_SPHERES = "bounding_spheres"
GIZMO_VOXEL_CHUNKS = "voxel_chunks"
GIZMO_LIGHT_SPHERES = "light_spheres"
GIZMO_BVH = "bounding_volume_hierarchy"
GIZMO_SHADOW_CUBEMAP_FACES = "shadow_cubemap_faces"
GIZMO_SHADOW_CASCADES = "shadow_map_cascades"
GIZMO_ANCHORS = "anchors"
GIZMO_DYNAMIC_COLLIDERS = "dynamic_colliders"
GIZMO_STATIC_COLLIDERS = "static_colliders"
GIZMO_PHANTOM_COLLIDERS = "phantom_colliders"
GIZMO_COLLISION_PROBES = "collision_probes"
GIZMO_VOXEL_SDS = "voxel_signed_distances"
GIZMO_VOXEL_INTERSECTIONS = "voxel_intersections"

#: every gizmo type, mirroring the reference's 21-member GizmoType enum
#: (impact_gizmo/src/lib.rs:39-61); GIZMO_COLLIDERS is the dynamic+static
#: union for convenience and not counted.
ALL_GIZMO_TYPES = (
    GIZMO_AXES, GIZMO_BOUNDING_SPHERES, GIZMO_BVH, GIZMO_LIGHT_SPHERES,
    GIZMO_SHADOW_CUBEMAP_FACES, GIZMO_SHADOW_CASCADES, GIZMO_CENTER_OF_MASS,
    GIZMO_LINEAR_VELOCITY, GIZMO_ANGULAR_VELOCITY, GIZMO_ANGULAR_MOMENTUM,
    GIZMO_FORCE, GIZMO_TORQUE, GIZMO_ANCHORS, GIZMO_DYNAMIC_COLLIDERS,
    GIZMO_STATIC_COLLIDERS, GIZMO_PHANTOM_COLLIDERS, GIZMO_COLLISION_PROBES,
    GIZMO_CONTACTS, GIZMO_VOXEL_CHUNKS, GIZMO_VOXEL_SDS,
    GIZMO_VOXEL_INTERSECTIONS,
)

AXIS_COLORS = np.asarray(
    [[0.9, 0.15, 0.15], [0.15, 0.9, 0.15], [0.2, 0.35, 0.95]], np.float32
)


class GizmoLines(NamedTuple):
    start: jnp.ndarray  # f32[L,3]
    end: jnp.ndarray  # f32[L,3]
    color: jnp.ndarray  # f32[L,3]
    active: jnp.ndarray  # bool[L]


def _concat(parts):
    return GizmoLines(
        jnp.concatenate([p.start for p in parts]),
        jnp.concatenate([p.end for p in parts]),
        jnp.concatenate([p.color for p in parts]),
        jnp.concatenate([p.active for p in parts]),
    )


def build_gizmo_lines(sim, params,
                      kinds=(GIZMO_AXES, GIZMO_LINEAR_VELOCITY, GIZMO_CONTACTS),
                      aspect: float = 16.0 / 9.0, n_cascades: int = 1):
    """Build the line pool from the sim state for the requested gizmo kinds.

    ``aspect``/``n_cascades`` are only consulted by the shadow-cascade gizmo
    (they are render-config statics, not sim state)."""
    bodies = sim.phys.bodies
    n = bodies.n
    alive = bodies.alive
    parts = []

    if GIZMO_AXES in kinds:
        for axis in range(3):
            d = quat.rotate(bodies.orientation, jnp.eye(3)[axis][None].repeat(n, 0))
            parts.append(
                GizmoLines(
                    bodies.position,
                    bodies.position + d,
                    jnp.broadcast_to(AXIS_COLORS[axis], (n, 3)),
                    alive,
                )
            )

    if GIZMO_LINEAR_VELOCITY in kinds:
        parts.append(
            GizmoLines(
                bodies.position,
                bodies.position + bodies.velocity * 0.5,
                jnp.broadcast_to(jnp.asarray([1.0, 0.9, 0.1]), (n, 3)),
                alive & (jnp.linalg.norm(bodies.velocity, axis=-1) > 1e-3),
            )
        )

    if GIZMO_ANGULAR_VELOCITY in kinds:
        parts.append(
            GizmoLines(
                bodies.position,
                bodies.position + bodies.angular_velocity * 0.5,
                jnp.broadcast_to(jnp.asarray([0.9, 0.2, 0.9]), (n, 3)),
                alive & (jnp.linalg.norm(bodies.angular_velocity, axis=-1) > 1e-3),
            )
        )

    if GIZMO_CONTACTS in kinds:
        cache = sim.phys.solver_cache
        parts.append(
            GizmoLines(
                cache.position,
                cache.position + cache.normal * 0.5,
                jnp.broadcast_to(jnp.asarray([1.0, 0.3, 0.1]), cache.position.shape),
                cache.active,
            )
        )

    if GIZMO_ANGULAR_MOMENTUM in kinds:
        parts.append(
            GizmoLines(
                bodies.position,
                bodies.position + bodies.angular_momentum * 0.1,
                jnp.broadcast_to(jnp.asarray([0.6, 0.1, 0.9]), (n, 3)),
                alive
                & (jnp.linalg.norm(bodies.angular_momentum, axis=-1) > 1e-3),
            )
        )

    if GIZMO_FORCE in kinds:
        parts.append(
            GizmoLines(
                bodies.position,
                bodies.position + bodies.total_force * 0.01,
                jnp.broadcast_to(jnp.asarray([0.95, 0.55, 0.1]), (n, 3)),
                alive & (jnp.linalg.norm(bodies.total_force, axis=-1) > 1e-3),
            )
        )

    if GIZMO_TORQUE in kinds:
        parts.append(
            GizmoLines(
                bodies.position,
                bodies.position + bodies.total_torque * 0.01,
                jnp.broadcast_to(jnp.asarray([0.55, 0.95, 0.1]), (n, 3)),
                alive & (jnp.linalg.norm(bodies.total_torque, axis=-1) > 1e-3),
            )
        )

    if GIZMO_CENTER_OF_MASS in kinds:
        # small cross at every dynamic body's COM
        for axis in range(3):
            d = jnp.eye(3)[axis] * 0.15
            parts.append(
                GizmoLines(
                    bodies.position - d,
                    bodies.position + d,
                    jnp.broadcast_to(jnp.asarray([1.0, 1.0, 1.0]), (n, 3)),
                    alive & bodies.is_dynamic,
                )
            )

    if GIZMO_BOUNDING_SPHERES in kinds and sim is not None:
        # voxel-object bounding spheres as 3 great-circle polylines
        from ..voxel.collision import bounding_radii

        pool = sim.voxels
        radii = bounding_radii(pool)
        centers = bodies.position[pool.body_index]
        n_seg = 24
        ang = np.linspace(0.0, 2.0 * np.pi, n_seg + 1)
        for plane in ((0, 1), (0, 2), (1, 2)):
            for i in range(n_seg):
                p0 = np.zeros(3)
                p1 = np.zeros(3)
                d0 = jnp.zeros((pool.n_objects, 3))
                d0 = d0.at[:, plane[0]].set(np.cos(ang[i])).at[:, plane[1]].set(np.sin(ang[i]))
                d1 = jnp.zeros((pool.n_objects, 3))
                d1 = d1.at[:, plane[0]].set(np.cos(ang[i + 1])).at[:, plane[1]].set(np.sin(ang[i + 1]))
                parts.append(
                    GizmoLines(
                        centers + radii[:, None] * d0,
                        centers + radii[:, None] * d1,
                        jnp.broadcast_to(
                            jnp.asarray([0.3, 0.8, 0.3]), (pool.n_objects, 3)
                        ),
                        pool.alive,
                    )
                )

    if GIZMO_VOXEL_CHUNKS in kinds and sim is not None:
        # grid-extent boxes around each voxel object (12 edges)
        pool = sim.voxels
        from ..math import quaternion as _q

        g = pool.grid_size
        lo = pool.origin  # body frame
        hi = pool.origin + g * pool.voxel_extent[:, None]
        q = bodies.orientation[pool.body_index]
        x = bodies.position[pool.body_index]

        def corner(mask):
            local = jnp.where(jnp.asarray(mask, bool)[None, :], hi, lo)
            return _q.rotate(q, local) + x

        edges = [
            ((0, 0, 0), (1, 0, 0)), ((0, 0, 0), (0, 1, 0)), ((0, 0, 0), (0, 0, 1)),
            ((1, 1, 0), (0, 1, 0)), ((1, 1, 0), (1, 0, 0)), ((1, 1, 0), (1, 1, 1)),
            ((1, 0, 1), (0, 0, 1)), ((1, 0, 1), (1, 0, 0)), ((1, 0, 1), (1, 1, 1)),
            ((0, 1, 1), (0, 0, 1)), ((0, 1, 1), (0, 1, 0)), ((0, 1, 1), (1, 1, 1)),
        ]
        for a, b in edges:
            parts.append(
                GizmoLines(
                    corner(a), corner(b),
                    jnp.broadcast_to(
                        jnp.asarray([0.9, 0.8, 0.2]), (pool.n_objects, 3)
                    ),
                    pool.alive,
                )
            )

    if GIZMO_LIGHT_SPHERES in kinds and params is not None:
        lp = params.lights
        nl = lp.omni_mask.shape[0]
        for axis in range(3):
            d = jnp.eye(3)[axis][None, :] * jnp.maximum(
                lp.omni_extent, 0.25
            )[:, None]
            parts.append(
                GizmoLines(
                    lp.omni_position - d,
                    lp.omni_position + d,
                    jnp.broadcast_to(jnp.asarray([1.0, 1.0, 0.5]), (nl, 3)),
                    lp.omni_mask,
                )
            )

    # --- collider gizmos, split by kind (ref GizmoType::DynamicCollider /
    # StaticCollider / PhantomCollider, lib.rs:52-55; GIZMO_COLLIDERS = all) --
    from ..physics.collision import (
        KIND_DYNAMIC_COLLIDABLE,
        KIND_PHANTOM_COLLIDABLE,
        KIND_STATIC_COLLIDABLE,
    )

    collider_requests = []
    if GIZMO_COLLIDERS in kinds:
        collider_requests.append((None, jnp.asarray([0.2, 0.9, 0.9])))
    if GIZMO_DYNAMIC_COLLIDERS in kinds:
        collider_requests.append(
            (KIND_DYNAMIC_COLLIDABLE, jnp.asarray([0.2, 0.9, 0.9])))
    if GIZMO_STATIC_COLLIDERS in kinds:
        collider_requests.append(
            (KIND_STATIC_COLLIDABLE, jnp.asarray([0.5, 0.5, 0.95])))
    if GIZMO_PHANTOM_COLLIDERS in kinds:
        collider_requests.append(
            (KIND_PHANTOM_COLLIDABLE, jnp.asarray([0.95, 0.4, 0.95])))
    for want_kind, color in collider_requests:
        coll = params.phys_params.collidables

        def _of_kind(kind, mask):
            return mask if want_kind is None else mask & (kind == want_kind)

        # sphere colliders: three axis-aligned cross lines through the center
        c = bodies.position[coll.sph_body] + quat.rotate(
            bodies.orientation[coll.sph_body], coll.sph_center
        )
        sph_act = _of_kind(coll.sph_kind, coll.sph_mask)
        for axis in range(3):
            d = jnp.eye(3)[axis] * coll.sph_radius[:, None]
            parts.append(GizmoLines(
                c - d, c + d, jnp.broadcast_to(color, c.shape), sph_act))
        # capsule colliders: segment axis + radius crosses at both ends
        qb = bodies.orientation[coll.cap_body]
        pb = bodies.position[coll.cap_body]
        a = pb + quat.rotate(qb, coll.cap_start)
        e = pb + quat.rotate(qb, coll.cap_end)
        cap_act = _of_kind(coll.cap_kind, coll.cap_mask)
        parts.append(GizmoLines(a, e, jnp.broadcast_to(color, a.shape), cap_act))
        for axis in range(3):
            d = jnp.eye(3)[axis] * coll.cap_radius[:, None]
            for p0 in (a, e):
                parts.append(GizmoLines(
                    p0 - d, p0 + d, jnp.broadcast_to(color, a.shape), cap_act))
        # plane colliders: cross of two in-plane tangents at the nearest
        # point to the world origin (planes are unbounded)
        qp = bodies.orientation[coll.pln_body]
        nrm = quat.rotate(qp, coll.pln_normal)
        p_pt = (bodies.position[coll.pln_body]
                + nrm * (coll.pln_disp[:, None]
                         - jnp.sum(bodies.position[coll.pln_body] * nrm,
                                   -1, keepdims=True)))
        helper = jnp.where(
            jnp.abs(nrm[:, 2:3]) < 0.9,
            jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))
        t0 = jnp.cross(nrm, helper)
        t0 = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-9)
        t1 = jnp.cross(nrm, t0)
        pln_act = _of_kind(coll.pln_kind, coll.pln_mask)
        for t in (t0, t1):
            parts.append(GizmoLines(
                p_pt - 2.0 * t, p_pt + 2.0 * t,
                jnp.broadcast_to(color, p_pt.shape), pln_act))

    if GIZMO_ANCHORS in kinds:
        # joint anchor points: a line from anchor-a to anchor-b plus crosses
        # (ref GizmoType::Anchors, lib.rs:52)
        j = params.phys_params.joints
        pa = bodies.position[j.body_a] + quat.rotate(
            bodies.orientation[j.body_a], j.anchor_a)
        pb = bodies.position[j.body_b] + quat.rotate(
            bodies.orientation[j.body_b], j.anchor_b)
        parts.append(GizmoLines(
            pa, pb, jnp.broadcast_to(jnp.asarray([1.0, 0.6, 0.9]), pa.shape),
            j.mask))
        for axis in range(3):
            d = jnp.eye(3)[axis] * 0.1
            for p in (pa, pb):
                parts.append(GizmoLines(
                    p - d, p + d,
                    jnp.broadcast_to(jnp.asarray([1.0, 0.6, 0.9]), p.shape),
                    j.mask))

    if GIZMO_COLLISION_PROBES in kinds and sim is not None:
        # cached voxel collision probes (ref GizmoType::CollisionProbes;
        # collidable.rs probe points), drawn as small vertical ticks
        pool = sim.voxels
        pr = sim.probes
        o, p = pr.active.shape
        q = bodies.orientation[pool.body_index]
        x = bodies.position[pool.body_index]
        wp = quat.rotate(q[:, None, :], pr.pos_local) + x[:, None, :]
        act = pr.active & pool.alive[:, None]
        tick = jnp.asarray([0.0, 1.0, 0.0]) * (0.35 * pool.voxel_extent
                                               )[:, None, None]
        parts.append(GizmoLines(
            (wp - tick).reshape(o * p, 3), (wp + tick).reshape(o * p, 3),
            jnp.broadcast_to(jnp.asarray([0.95, 0.9, 0.2]), (o * p, 3)),
            act.reshape(o * p)))

    if GIZMO_VOXEL_SDS in kinds and sim is not None:
        # signed distances at the collision probes (ref
        # GizmoType::VoxelSignedDistances): a line along the local SDF
        # gradient, length ∝ |sd|, green outside / red inside
        pool = sim.voxels
        pr = sim.probes
        o, p = pr.active.shape
        q = bodies.orientation[pool.body_index]
        x = bodies.position[pool.body_index]
        wp = quat.rotate(q[:, None, :], pr.pos_local) + x[:, None, :]
        eps = 0.5 * pool.voxel_extent[:, None, None]
        sd = _sample_pool_sdf_local(pool, pr.pos_local)
        gx = (_sample_pool_sdf_local(pool, pr.pos_local + eps * jnp.eye(3)[0])
              - sd)
        gy = (_sample_pool_sdf_local(pool, pr.pos_local + eps * jnp.eye(3)[1])
              - sd)
        gz = (_sample_pool_sdf_local(pool, pr.pos_local + eps * jnp.eye(3)[2])
              - sd)
        grad = jnp.stack([gx, gy, gz], -1)
        grad = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
        gw = quat.rotate(q[:, None, :], grad)
        length = jnp.clip(jnp.abs(sd), 0.1, 3.0)[..., None]
        color = jnp.where((sd > 0.0)[..., None],
                          jnp.asarray([0.2, 0.95, 0.3]),
                          jnp.asarray([0.95, 0.25, 0.2]))
        act = pr.active & pool.alive[:, None]
        parts.append(GizmoLines(
            wp.reshape(o * p, 3), (wp + gw * length).reshape(o * p, 3),
            color.reshape(o * p, 3), act.reshape(o * p)))

    if GIZMO_VOXEL_INTERSECTIONS in kinds and sim is not None:
        # center-to-center links for voxel-object pairs whose bounding
        # spheres overlap (ref GizmoType::VoxelIntersections: the candidate
        # pairs the voxel-vs-voxel narrowphase actually tests)
        from ..voxel.collision import bounding_radii

        pool = sim.voxels
        radii = bounding_radii(pool)
        centers = bodies.position[pool.body_index]
        o = pool.n_objects
        d2 = jnp.sum(
            (centers[:, None, :] - centers[None, :, :]) ** 2, -1)
        rsum = radii[:, None] + radii[None, :]
        hit = (d2 < rsum * rsum) & pool.alive[:, None] & pool.alive[None, :]
        hit = hit & (jnp.arange(o)[:, None] < jnp.arange(o)[None, :])
        parts.append(GizmoLines(
            jnp.broadcast_to(centers[:, None, :], (o, o, 3)).reshape(-1, 3),
            jnp.broadcast_to(centers[None, :, :], (o, o, 3)).reshape(-1, 3),
            jnp.broadcast_to(jnp.asarray([0.95, 0.5, 0.1]), (o * o, 3)),
            hit.reshape(-1)))

    if GIZMO_BVH in kinds and sim is not None:
        # implicit LBVH node AABBs over the voxel objects (ref
        # GizmoType::BoundingVolumeHierarchy)
        from ..geometry.bvh import build_object_bvh
        from ..voxel.collision import bounding_radii

        pool = sim.voxels
        radii = bounding_radii(pool)
        centers = bodies.position[pool.body_index]
        bvh = build_object_bvh(centers, radii, pool.alive, n_levels=4)
        shades = np.linspace(0.95, 0.4, max(len(bvh.lo), 1))
        for lo, hi, act, shade in zip(bvh.lo, bvh.hi, bvh.active, shades):
            parts.extend(_aabb_edge_lines(
                lo, hi, jnp.asarray([shade, shade * 0.7, 0.1]), act))

    if GIZMO_SHADOW_CUBEMAP_FACES in kinds and params is not None:
        # the 6 cubemap face frusta of every shadowable omni light (ref
        # GizmoType::ShadowCubemapFaces): apex-to-far-corner pyramid edges
        lp = params.lights
        nl = lp.omni_mask.shape[0]
        act = lp.omni_mask & lp.omni_shadowable
        reach = jnp.maximum(3.0 * jnp.maximum(lp.omni_extent, 1.0), 5.0)
        for face in range(6):
            axis, sign = face // 2, 1.0 - 2.0 * (face % 2)
            fwd = jnp.eye(3)[axis] * sign
            u = jnp.eye(3)[(axis + 1) % 3]
            v = jnp.eye(3)[(axis + 2) % 3]
            corners = [
                lp.omni_position + reach[:, None] * (fwd + su * u + sv * v)
                for su, sv in ((-1, -1), (1, -1), (1, 1), (-1, 1))
            ]
            col = jnp.asarray([0.4, 0.7, 0.95])
            for k in range(4):
                parts.append(GizmoLines(
                    lp.omni_position, corners[k],
                    jnp.broadcast_to(col, (nl, 3)), act))
                parts.append(GizmoLines(
                    corners[k], corners[(k + 1) % 4],
                    jnp.broadcast_to(col, (nl, 3)), act))

    if GIZMO_SHADOW_CASCADES in kinds and params is not None:
        # CSM cascade sub-frusta of the camera (ref
        # GizmoType::ShadowMapCascades): the world-space camera sub-frustum
        # each cascade's ortho map is fitted to
        from .lights import _frustum_corners_world, cascade_partition_depths

        cam = params.camera
        splits = cascade_partition_depths(cam.near, cam.far, n_cascades)
        cascade_colors = np.asarray(
            [[0.2, 0.9, 0.4], [0.9, 0.9, 0.2], [0.9, 0.5, 0.2],
             [0.9, 0.2, 0.2]], np.float32)
        uni_any = jnp.any(params.lights.uni_mask
                          & params.lights.uni_shadowable)
        for c in range(n_cascades):
            corners = _frustum_corners_world(
                cam.position, cam.orientation, cam.vertical_fov, aspect,
                splits[c], splits[c + 1])  # [8,3]: near quad then far quad
            col = jnp.asarray(cascade_colors[min(c, 3)])
            quad = (0, 1, 3, 2)  # corner order is (-y-x, -y+x, +y-x, +y+x)
            for ring in (0, 4):
                for k in range(4):
                    a = corners[quad[k] + ring]
                    b = corners[quad[(k + 1) % 4] + ring]
                    parts.append(GizmoLines(
                        a[None], b[None], col[None], uni_any[None]))
            for k in range(4):
                parts.append(GizmoLines(
                    corners[quad[k]][None], corners[quad[k] + 4][None],
                    col[None], uni_any[None]))

    return _concat(parts)


def _aabb_edge_lines(lo, hi, color, active):
    """12 box-edge GizmoLines parts for AABBs lo/hi f32[K,3]."""
    def corner(mask):
        m = jnp.asarray(mask, bool)
        return jnp.where(m[None, :], hi, lo)

    edges = [
        ((0, 0, 0), (1, 0, 0)), ((0, 0, 0), (0, 1, 0)), ((0, 0, 0), (0, 0, 1)),
        ((1, 1, 0), (0, 1, 0)), ((1, 1, 0), (1, 0, 0)), ((1, 1, 0), (1, 1, 1)),
        ((1, 0, 1), (0, 0, 1)), ((1, 0, 1), (1, 0, 0)), ((1, 0, 1), (1, 1, 1)),
        ((0, 1, 1), (0, 0, 1)), ((0, 1, 1), (0, 1, 0)), ((0, 1, 1), (1, 1, 1)),
    ]
    k = lo.shape[0]
    return [
        GizmoLines(corner(a), corner(b),
                   jnp.broadcast_to(color, (k, 3)), active)
        for a, b in edges
    ]


def _sample_pool_sdf_local(pool, pts_local):
    """Trilinear SDF sample at body-frame points pts_local f32[O,P,3],
    in voxel-extent units (positive outside)."""
    g = pool.grid_size
    ext = pool.voxel_extent[:, None, None]
    gridc = (pts_local - pool.origin[:, None, :]) / jnp.maximum(ext, 1e-9) - 0.5
    i0 = jnp.clip(jnp.floor(gridc).astype(jnp.int32), 0, g - 2)
    f = jnp.clip(gridc - i0, 0.0, 1.0)
    sdf = pool.sdf.astype(jnp.float32)
    o = pts_local.shape[0]
    oi = jnp.arange(o)[:, None]

    def at(dx, dy, dz):
        return sdf[oi, i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz]

    c00 = at(0, 0, 0) * (1 - f[..., 0]) + at(1, 0, 0) * f[..., 0]
    c10 = at(0, 1, 0) * (1 - f[..., 0]) + at(1, 1, 0) * f[..., 0]
    c01 = at(0, 0, 1) * (1 - f[..., 0]) + at(1, 0, 1) * f[..., 0]
    c11 = at(0, 1, 1) * (1 - f[..., 0]) + at(1, 1, 1) * f[..., 0]
    c0 = c00 * (1 - f[..., 1]) + c10 * f[..., 1]
    c1 = c01 * (1 - f[..., 1]) + c11 * f[..., 1]
    return c0 * (1 - f[..., 2]) + c1 * f[..., 2]


def overlay_lines(image_u8, lines: GizmoLines, view_proj, samples_per_line: int = 32):
    """Splat line segments over a rendered u8 frame. Returns u8 [H,W,3]."""
    h, w, _ = image_u8.shape
    t = jnp.linspace(0.0, 1.0, samples_per_line)[None, :, None]  # [1,S,1]
    pts = lines.start[:, None, :] + t * (lines.end - lines.start)[:, None, :]
    hp = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
    clip = jnp.einsum("ij,lsj->lsi", view_proj, hp)
    wc = clip[..., 3]
    ok = (wc > 1e-6) & lines.active[:, None]
    ndc = clip[..., :3] / jnp.maximum(wc, 1e-6)[..., None]
    x = ((ndc[..., 0] * 0.5 + 0.5) * w).astype(jnp.int32)
    y = ((0.5 - ndc[..., 1] * 0.5) * h).astype(jnp.int32)
    ok = ok & (x >= 0) & (x < w) & (y >= 0) & (y < h) & (ndc[..., 2] > 0) & (ndc[..., 2] < 1)
    # out-of-bounds / masked samples are dropped by scatter mode="drop"
    xi = jnp.where(ok, x, w)
    yi = jnp.where(ok, y, h)
    img = image_u8.astype(jnp.float32)
    color = jnp.broadcast_to(lines.color[:, None, :], pts.shape) * 255.0
    img = img.at[yi, xi].set(color, mode="drop")
    return jnp.clip(img, 0, 255).astype(jnp.uint8)
