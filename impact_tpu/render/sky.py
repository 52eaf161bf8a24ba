"""Skybox: per-pixel sky luminance for geometry-free pixels.

Ref: impact_scene/src/skybox.rs (cubemap skybox resource + max luminance) and
the SkyboxPass (render_command.rs:352-376). The zero-egress environment has
no fetched HDR cubemaps, so the default source is a procedural gradient sky
with an optional sun disk (from the scene's directional light); a cubemap
path samples a [6,S,S,3] texture by dominant-axis face selection for
generated/imported skyboxes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math import quaternion as quat


def pixel_view_directions(cam_orientation, vertical_fov, width: int, height: int):
    """Unit world-space view ray per pixel [H,W,3] (camera looks along −z)."""
    ty = jnp.tan(0.5 * vertical_fov)
    tx = ty * width / height
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    dx = xs[None, :] * tx
    dy = ys[:, None] * ty
    local = jnp.stack(
        [
            jnp.broadcast_to(dx, (height, width)),
            jnp.broadcast_to(dy, (height, width)),
            -jnp.ones((height, width), jnp.float32),
        ],
        axis=-1,
    )
    local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)
    return quat.rotate(cam_orientation[None, None, :], local)


def procedural_sky(
    view_dir,
    zenith_luminance=(3000.0, 4500.0, 9000.0),
    horizon_luminance=(8000.0, 8500.0, 9500.0),
    ground_luminance=(1500.0, 1400.0, 1300.0),
    sun_direction=None,  # direction LIGHT TRAVELS (like uni lights)
    sun_luminance=(5e7, 4.6e7, 4e7),
    sun_cos_radius: float = 0.9999,
):
    """Gradient sky + optional sun disk at world directions [...,3]."""
    up = view_dir[..., 1]
    t = jnp.clip(up, 0.0, 1.0) ** 0.6
    zen = jnp.asarray(zenith_luminance, jnp.float32)
    hor = jnp.asarray(horizon_luminance, jnp.float32)
    gnd = jnp.asarray(ground_luminance, jnp.float32)
    sky = hor * (1.0 - t[..., None]) + zen * t[..., None]
    below = jnp.clip(-up, 0.0, 1.0) ** 0.4
    lum = sky * (1.0 - below[..., None]) + gnd * below[..., None]
    if sun_direction is not None:
        sd = -jnp.asarray(sun_direction, jnp.float32)
        sd = sd / jnp.maximum(jnp.linalg.norm(sd), 1e-9)
        c = jnp.sum(view_dir * sd, axis=-1)
        disk = jnp.clip(
            (c - sun_cos_radius) / jnp.maximum(1.0 - sun_cos_radius, 1e-9), 0.0, 1.0
        )
        lum = lum + jnp.asarray(sun_luminance, jnp.float32) * disk[..., None]
    return lum


def sample_sky_cubemap(cubemap, view_dir):
    """Sample a [6,S,S,3] cubemap at world directions [...,3] (nearest texel;
    face layout matches lights.CUBE_FACE_DIRS)."""
    v = view_dir
    av = jnp.abs(v)
    face = jnp.where(
        (av[..., 0] >= av[..., 1]) & (av[..., 0] >= av[..., 2]),
        jnp.where(v[..., 0] >= 0, 0, 1),
        jnp.where(
            av[..., 1] >= av[..., 2],
            jnp.where(v[..., 1] >= 0, 2, 3),
            jnp.where(v[..., 2] >= 0, 4, 5),
        ),
    )
    # forward axis magnitude per face + in-face (u,v)
    ax = jnp.take_along_axis(
        jnp.stack([v[..., 0], -v[..., 0], v[..., 1], -v[..., 1], v[..., 2], -v[..., 2]], -1),
        face[..., None],
        axis=-1,
    )[..., 0]
    us = jnp.stack([-v[..., 2], v[..., 2], v[..., 0], v[..., 0], v[..., 0], -v[..., 0]], -1)
    vs = jnp.stack([-v[..., 1], -v[..., 1], v[..., 2], -v[..., 2], -v[..., 1], -v[..., 1]], -1)
    u = jnp.take_along_axis(us, face[..., None], axis=-1)[..., 0]
    w = jnp.take_along_axis(vs, face[..., None], axis=-1)[..., 0]
    inv = 1.0 / jnp.maximum(ax, 1e-9)
    s = cubemap.shape[1]
    iu = jnp.clip(((u * inv * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    iv = jnp.clip(((w * inv * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    return cubemap[face, iv, iu]
