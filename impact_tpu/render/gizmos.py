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

# gizmo kinds (subset of the reference's 21; the pool design extends freely)
GIZMO_AXES = "reference_frame_axes"
GIZMO_LINEAR_VELOCITY = "linear_velocity"
GIZMO_ANGULAR_VELOCITY = "angular_velocity"
GIZMO_CENTER_OF_MASS = "center_of_mass"
GIZMO_CONTACTS = "contacts"
GIZMO_COLLIDERS = "colliders"

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
