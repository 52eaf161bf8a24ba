"""Camera: view transforms, projection, TAA jitter.

Ref: impact_camera/src/gpu_resource.rs:24-76 — perspective projection with a
32-entry Halton jitter sequence for temporal anti-aliasing, camera uniforms
carrying current and previous view-projection matrices for motion vectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.projection import perspective_projection_matrix
from ..math import quaternion as quat
from ..math.random import taa_jitter_offsets


class Camera(NamedTuple):
    position: jnp.ndarray  # f32[3]
    orientation: jnp.ndarray  # f32[4] camera-to-world rotation
    vertical_fov: jnp.ndarray  # f32 radians
    near: jnp.ndarray
    far: jnp.ndarray


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """Camera at ``eye`` looking at ``target`` (camera looks down −z)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
    true_up = jnp.cross(right, fwd)
    # camera basis: x=right, y=up, z=-forward
    m = jnp.stack([right, true_up, -fwd], axis=-1)
    return quat.from_rotation_matrix(m)


def view_matrix(cam: Camera):
    """World → view 4x4 (inverse of the camera's rigid transform)."""
    r = quat.to_rotation_matrix(quat.conjugate(cam.orientation))
    t = -r @ cam.position
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    m = m.at[3, 3].set(1.0)
    return m


def projection_matrix(
    cam: Camera, width: int, height: int, jitter_index=None,
    orthographic: bool = False,
):
    """Projection for the camera; ``orthographic`` sizes the view volume like
    the reference (half-height = far * tan(fov/2), projection.rs:216-236)."""
    if orthographic:
        from ..geometry.projection import orthographic_projection_matrix

        half_h = cam.far * jnp.tan(0.5 * cam.vertical_fov)
        half_w = half_h * (width / height)
        proj = orthographic_projection_matrix(
            -half_w, half_w, -half_h, half_h, cam.near, cam.far
        )
        if jitter_index is not None:
            offsets = jnp.asarray(taa_jitter_offsets)
            j = offsets[jitter_index % offsets.shape[0]]
            # ortho: w == 1, so the NDC offset lives in the translation column
            proj = proj.at[0, 3].add(-j[0] * 2.0 / width)
            proj = proj.at[1, 3].add(-j[1] * 2.0 / height)
        return proj
    proj = perspective_projection_matrix(
        width / height, cam.vertical_fov, cam.near, cam.far
    )
    if jitter_index is not None:
        offsets = jnp.asarray(taa_jitter_offsets)
        j = offsets[jitter_index % offsets.shape[0]]
        # jitter in NDC units: one pixel = 2/size
        proj = proj.at[0, 2].add(-j[0] * 2.0 / width)
        proj = proj.at[1, 2].add(-j[1] * 2.0 / height)
    return proj


def view_proj(cam: Camera, width: int, height: int, jitter_index=None,
              orthographic: bool = False):
    return projection_matrix(
        cam, width, height, jitter_index, orthographic
    ) @ view_matrix(cam)
