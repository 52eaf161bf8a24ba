"""Sphere / plane / capsule / oriented-box primitives and distance queries.

Ref: impact_geometry/src/{sphere,plane,capsule,oriented_box}.rs. These feed the
analytic narrow-phase collision functions (impact_tpu.physics.collision) and
SDF evaluation. A plane is (unit_normal [...,3], displacement [...]) with the
plane equation n·p = d; a capsule is (segment_start, segment_end, radius).
"""

from __future__ import annotations

import jax.numpy as jnp


def plane_signed_distance(normal, displacement, p):
    """Signed distance of point(s) to plane(s): positive on the normal side."""
    return jnp.sum(normal * p, axis=-1) - displacement


def closest_point_on_segment(a, b, p, eps=1e-12):
    """Closest point to ``p`` on segment a→b (and the clamped parameter t)."""
    ab = b - a
    denom = jnp.sum(ab * ab, axis=-1)
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(denom, eps)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab, t


def sphere_sdf(center, radius, p):
    return jnp.linalg.norm(p - center, axis=-1) - radius


def capsule_sdf(a, b, radius, p):
    cp, _ = closest_point_on_segment(a, b, p)
    return jnp.linalg.norm(p - cp, axis=-1) - radius


def box_sdf(half_extents, p):
    """SDF of an axis-aligned box centered at the origin (exact)."""
    q = jnp.abs(p) - half_extents
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def segment_segment_closest_points(p1, q1, p2, q2, eps=1e-9):
    """Closest points between segments p1→q1 and p2→q2 (vectorized Ericson
    'Real-Time Collision Detection' §5.1.9 algorithm, branch-free)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, eps)
    t_clamped = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        t != t_clamped,
        jnp.clip((t_clamped * b - c) / jnp.maximum(a, eps), 0.0, 1.0),
        s,
    )
    t = t_clamped
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t[..., None] * d2
    return c1, c2
