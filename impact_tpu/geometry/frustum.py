"""View frustum plane extraction and culling tests.

Ref: impact_geometry/src/frustum.rs (plane extraction + the
"most inside corner" trick used by the GPU chunk-culling shader,
ref: impact_voxel/shaders/compute/voxel_chunk_culling.template.wgsl:1-70).

A frustum is six planes (normals [6,3], displacements [6]) pointing inward:
a point is inside iff n·p ≥ d for all six. Culling whole pools of AABBs or
spheres is one vectorized op.
"""

from __future__ import annotations

import jax.numpy as jnp


def frustum_planes_from_view_proj(view_proj):
    """Extract the 6 inward frustum planes from a combined view-projection
    matrix (Gribb-Hartmann, adapted to [0,1] clip depth).

    Returns (normals [6,3], displacements [6]) with the convention
    inside ⇔ n·p - d ≥ 0. Plane order: left, right, bottom, top, near, far.
    """
    r0, r1, r2, r3 = view_proj[0], view_proj[1], view_proj[2], view_proj[3]
    rows = jnp.stack(
        [
            r3 + r0,  # left:   x > -w
            r3 - r0,  # right:  x < w
            r3 + r1,  # bottom
            r3 - r1,  # top
            r2,       # near:   z > 0   ([0,1] depth)
            r3 - r2,  # far:    z < w
        ]
    )
    normals = rows[:, :3]
    d = -rows[:, 3]
    inv_len = 1.0 / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    return normals * inv_len, d * inv_len.squeeze(-1)


def sphere_inside_frustum(normals, displacements, centers, radii):
    """True for spheres not entirely outside any plane. centers [...,3]."""
    sd = (
        jnp.einsum("pk,...k->...p", normals, centers)
        - displacements
    )
    return jnp.all(sd >= -radii[..., None], axis=-1)


def aabb_inside_frustum(normals, displacements, lo, hi):
    """Conservative AABB-vs-frustum: tests each box's most-inside corner
    against every plane (the p-vertex trick the reference's culling shader
    uses). lo/hi [...,3] broadcast against the 6 planes."""
    # For each plane pick the corner furthest along the plane normal.
    corner = jnp.where(normals[..., :, :] > 0, hi[..., None, :], lo[..., None, :])
    sd = jnp.sum(normals * corner, axis=-1) - displacements
    return jnp.all(sd >= 0.0, axis=-1)
