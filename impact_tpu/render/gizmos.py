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
GIZMO_COLLIDERS = "colliders"
GIZMO_BOUNDING_SPHERES = "bounding_spheres"
GIZMO_VOXEL_CHUNKS = "voxel_chunks"
GIZMO_LIGHT_SPHERES = "light_spheres"

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


def build_gizmo_lines(sim, params, kinds=(GIZMO_AXES, GIZMO_LINEAR_VELOCITY, GIZMO_CONTACTS)):
    """Build the line pool from the sim state for the requested gizmo kinds."""
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

    if GIZMO_COLLIDERS in kinds:
        coll = params.phys_params.collidables
        # sphere colliders: three axis-aligned cross lines through the center
        c = bodies.position[coll.sph_body] + quat.rotate(
            bodies.orientation[coll.sph_body], coll.sph_center
        )
        for axis in range(3):
            d = jnp.eye(3)[axis] * coll.sph_radius[:, None]
            parts.append(
                GizmoLines(
                    c - d, c + d,
                    jnp.broadcast_to(jnp.asarray([0.2, 0.9, 0.9]), c.shape),
                    coll.sph_mask,
                )
            )

    return _concat(parts)


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
