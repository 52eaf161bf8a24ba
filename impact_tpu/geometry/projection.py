"""Camera projection matrices.

Matches the reference's conventions exactly so view-space and clip-space
quantities agree with its shaders (ref: impact_geometry/src/projection.rs:
77-187): right-handed camera looking down −z, clip depth in [0, 1]
(wgpu convention), near plane at depth 0, far at depth 1 (clear depth 1.0,
depth test LESS — ref: impact_rendering/src/render_command/clearing_pass.rs:20).

Perspective matrix entries (row-major, column vectors):
  m[1,1] = 1 / tan(fov_y / 2)
  m[0,0] = m[1,1] / aspect
  m[2,2] = -far / (far - near)
  m[2,3] = m[2,2] * near
  m[3,2] = -1
"""

from __future__ import annotations

import jax.numpy as jnp


def perspective_projection_matrix(aspect_ratio, vertical_fov, near, far):
    """[4,4] perspective projection (ref: projection.rs:161-187)."""
    f = 1.0 / jnp.tan(0.5 * vertical_fov)
    m22 = -far / (far - near)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect_ratio)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set(m22)
    m = m.at[2, 3].set(m22 * near)
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic_projection_matrix(left, right, bottom, top, near, far):
    """[4,4] orthographic projection onto [-1,1]² × [0,1] looking down −z
    (ref: projection.rs:196)."""
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(2.0 / (top - bottom))
    m = m.at[2, 2].set(-1.0 / (far - near))
    m = m.at[0, 3].set(-(right + left) / (right - left))
    m = m.at[1, 3].set(-(top + bottom) / (top - bottom))
    m = m.at[2, 3].set(-near / (far - near))
    m = m.at[3, 3].set(1.0)
    return m


def project_points(proj, points_view):
    """Apply a projection matrix to view-space points [...,3] → NDC [...,3]
    (x, y in [-1,1], depth in [0,1]); also returns clip-space w."""
    hp = jnp.concatenate([points_view, jnp.ones_like(points_view[..., :1])], -1)
    clip = jnp.einsum("ij,...j->...i", proj, hp)
    w = clip[..., 3]
    ndc = clip[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]
    return ndc, w


def view_z_from_depth(depth, near, far):
    """Invert the perspective depth mapping: depth ∈ [0,1] → view-space -z."""
    # depth = far (z_view + near) / (z_view (far - near))  with z_view = -z
    return far * near / jnp.maximum(far - depth * (far - near), 1e-12)
