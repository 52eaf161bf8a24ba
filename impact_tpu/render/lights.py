"""Light pools and deferred shading passes.

Ref: impact_light/src/lib.rs:183-340 — 5 light types: AmbientLight,
OmnidirectionalLight, ShadowableOmnidirectionalLight (cubemap shadows),
UnidirectionalLight, ShadowableUnidirectionalLight (≤4-cascade CSM,
MAX_SHADOW_MAP_CASCADES=4) — and impact_rendering's ambient/directional light
passes (render_command.rs AmbientLightPass, DirectionalLightPass).

TPU redesign: all lights of a kind live in masked pools; each shading pass is
one fused op over the full G-buffer × light pool. Shadow maps are depth-only
raster targets rendered with the same chunked rasterizer; cubemaps are 6 faces
stacked on a leading axis, cascades likewise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.projection import perspective_projection_matrix, orthographic_projection_matrix
from . import raster as rasterlib
from .brdf import ambient_brdf, evaluate_brdf


class LightPools(NamedTuple):
    # ambient (ref: lib.rs:183): single accumulated illuminance
    ambient_luminance: jnp.ndarray  # f32[3]
    # omnidirectional (point) lights (ref: lib.rs:203-234)
    omni_position: jnp.ndarray  # f32[L,3]
    omni_intensity: jnp.ndarray  # f32[L,3] luminous intensity (lm/sr)
    omni_extent: jnp.ndarray  # f32[L] source extent for soft shadows
    omni_shadowable: jnp.ndarray  # bool[L]
    omni_mask: jnp.ndarray  # bool[L]
    # unidirectional (directional) lights (ref: lib.rs:265-340)
    uni_direction: jnp.ndarray  # f32[D,3] direction light travels
    uni_illuminance: jnp.ndarray  # f32[D,3] perpendicular illuminance (lux)
    uni_extent: jnp.ndarray  # f32[D] angular extent for soft shadows
    uni_shadowable: jnp.ndarray  # bool[D]
    uni_mask: jnp.ndarray  # bool[D]


def empty_light_pools(n_omni: int = 4, n_uni: int = 2) -> LightPools:
    return LightPools(
        ambient_luminance=jnp.zeros(3, jnp.float32),
        omni_position=jnp.zeros((n_omni, 3), jnp.float32),
        omni_intensity=jnp.zeros((n_omni, 3), jnp.float32),
        omni_extent=jnp.zeros(n_omni, jnp.float32),
        omni_shadowable=jnp.zeros(n_omni, bool),
        omni_mask=jnp.zeros(n_omni, bool),
        uni_direction=jnp.tile(jnp.array([[0.0, -1.0, 0.0]], jnp.float32), (n_uni, 1)),
        uni_illuminance=jnp.zeros((n_uni, 3), jnp.float32),
        uni_extent=jnp.zeros(n_uni, jnp.float32),
        uni_shadowable=jnp.zeros(n_uni, bool),
        uni_mask=jnp.zeros(n_uni, bool),
    )


# --- shadow maps ---------------------------------------------------------------

# Omni-light shadow volume: the cubemap far plane AND the shadow-caster cull
# radius (pipeline.shadow_pass) share this constant so a changed far plane
# can never silently cull casters inside the shadow volume.
OMNI_SHADOW_FAR = 100.0

CUBE_FACE_DIRS = np.array(
    [
        [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0], [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
    ],
    np.float32,
)
CUBE_FACE_UPS = np.array(
    [
        [0.0, -1.0, 0.0], [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
        [0.0, -1.0, 0.0], [0.0, -1.0, 0.0],
    ],
    np.float32,
)


def _look_view_matrix(eye, fwd, up):
    """World→view matrix for a camera at eye looking along fwd."""
    f = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
    r = jnp.cross(f, up)
    r = r / jnp.maximum(jnp.linalg.norm(r), 1e-9)
    u = jnp.cross(r, f)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, :3].set(r).at[1, :3].set(u).at[2, :3].set(-f)
    m = m.at[0, 3].set(-jnp.dot(r, eye))
    m = m.at[1, 3].set(-jnp.dot(u, eye))
    m = m.at[2, 3].set(jnp.dot(f, eye))
    m = m.at[3, 3].set(1.0)
    return m


def render_omni_shadow_cubemap(
    light_pos, tri_pos9, tri_active, resolution: int,
    near=0.05, far=None, backend: str = "xla",
):
    """6-face depth cubemap for one point light (ref: omni shadow map update
    pass, 6 faces per light). ``tri_pos9``: corner-major world positions
    [T,9]. Returns (depths [6,S,S], view_projs [6,4,4], n_drop)."""
    from .pipeline import project_corners

    if far is None:
        far = OMNI_SHADOW_FAR
    face_dirs = jnp.asarray(CUBE_FACE_DIRS)
    face_ups = jnp.asarray(CUBE_FACE_UPS)
    proj = perspective_projection_matrix(1.0, jnp.pi / 2, near, far)

    def face_clip(i):
        view = _look_view_matrix(light_pos, face_dirs[i], face_ups[i])
        vp = proj @ view
        return project_corners(tri_pos9, vp), vp  # [T,3,4]

    if backend == "pallas":
        from .raster_pallas import rasterize_depth_pos

        # static Python loop over the 6 faces (one kernel compile, 6 calls —
        # Pallas kernels don't batch under vmap the way XLA ops do)
        ds, vs = [], []
        n_drop = jnp.int32(0)
        for i in range(6):
            view = _look_view_matrix(light_pos, face_dirs[i], face_ups[i])
            vp = proj @ view
            # kernel plane-eval matmuls exempt from the stage's f32
            # precision (coverage/depth-min decisions, not shading values)
            with jax.default_matmul_precision("default"):
                d, nd = rasterize_depth_pos(
                    tri_pos9, tri_active, vp, resolution, resolution,
                    cull_backfaces=False, tile=32, k_per_range=256,
                    return_drops=True,
                )
            ds.append(d)
            vs.append(vp)
            n_drop = n_drop + nd
        return jnp.stack(ds), jnp.stack(vs), n_drop

    def face(i):
        tri_clip, vp = face_clip(i)
        # smaller big-pass budget + tile chunks: depth-only targets under a
        # 6-face vmap (memory per loop iteration is multiplied by the batch)
        # 90° face frusta close to geometry stretch triangle screen bboxes
        # enormously — a big_budget of 16 silently dropped ground planes and
        # nearby occluders from the face maps (missing shadows); 256 holds a
        # fully-subdivided ground rect plus every near occluder
        target, _, _ = rasterlib.rasterize(
            tri_clip, tri_active, resolution, resolution, cull_backfaces=False,
            k_per_tile=256, big_budget=256, tiles_per_chunk=32,
        )
        return target.depth, vp

    depths, vps = jax.vmap(face)(jnp.arange(6))
    # the XLA fallback keeps the nearest-K per tile without counting (CPU
    # oracle path; the Pallas path above counts)
    return depths, vps, jnp.int32(0)


def render_uni_shadow_map(
    light_dir, scene_center, scene_radius,
    tri_pos9, tri_active, resolution: int,
    backend: str = "xla",
):
    """Orthographic shadow map for a directional light covering the scene
    bounding sphere (single cascade; the cascade split logic of the
    reference's CSM slots in above this).
    Returns (depth [S,S], vp [4,4], n_drop)."""
    eye = scene_center - light_dir * (2.0 * scene_radius)
    up = jnp.where(
        jnp.abs(light_dir[1]) < 0.95,
        jnp.array([0.0, 1.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    view = _look_view_matrix(eye, light_dir, up)
    r = scene_radius
    proj = orthographic_projection_matrix(-r, r, -r, r, 0.05, 4.0 * r)
    vp = proj @ view
    if backend == "pallas":
        from .raster_pallas import rasterize_depth_pos

        with jax.default_matmul_precision("default"):
            depth, n_drop = rasterize_depth_pos(
                tri_pos9, tri_active, vp, resolution, resolution,
                cull_backfaces=False, tile=32, k_per_range=256,
                return_drops=True,
            )
        return depth, vp, n_drop
    from .pipeline import project_corners

    tri_clip = project_corners(tri_pos9, vp)
    target, _, _ = rasterlib.rasterize(
        tri_clip, tri_active, resolution, resolution, cull_backfaces=False,
        k_per_tile=256, big_budget=64, tiles_per_chunk=64,
    )
    return target.depth, vp, jnp.int32(0)


def _sample_shadow_pcf(depth_map, uv, depth_ref, bias=2e-3):
    """Bilinear-weighted 4-tap PCF. uv in [0,1]², depth_ref the receiver's
    light-space depth. Returns visibility in [0,1].

    4 taps with bilinear weights filter as smoothly as a 3×3 box while doing
    2.25× fewer gathers — the shadow lookup gathers dominate the whole
    deferred-shading pass on TPU."""
    s = depth_map.shape[0]
    base = uv * s - 0.5
    b0 = jnp.floor(base)
    f = base - b0
    b0 = b0.astype(jnp.int32)
    vis = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            p = jnp.clip(b0 + jnp.array([dx, dy]), 0, s - 1)
            d = depth_map[p[..., 1], p[..., 0]]
            wx = f[..., 0] if dx else 1.0 - f[..., 0]
            wy = f[..., 1] if dy else 1.0 - f[..., 1]
            vis = vis + wx * wy * (depth_ref - bias <= d)
    return vis


def quad_pack(depth_map):
    """[...,S,S] depth → [...,S,S,4] where channel c = depth[y+dy, x+dx]
    (edge-clamped). One gather row then yields all 4 bilinear PCF taps —
    TPU gather cost scales with row COUNT, not row bytes, so this quarters
    the dominant shadow-lookup cost."""
    d00 = depth_map
    d10 = jnp.concatenate([depth_map[..., :, 1:], depth_map[..., :, -1:]], axis=-1)
    d01 = jnp.concatenate([depth_map[..., 1:, :], depth_map[..., -1:, :]], axis=-2)
    d11 = jnp.concatenate([d01[..., :, 1:], d01[..., :, -1:]], axis=-1)
    return jnp.stack([d00, d10, d01, d11], axis=-1)


def _pcf_4tap_quad(quad_at, base, size, depth_ref, bias=2e-3):
    """Bilinear 4-tap PCF from a quad-packed map: ``quad_at(p)`` gathers the
    [...,4] channel row at integer texel p [...,2]."""
    b0f = jnp.floor(base)
    f = base - b0f
    p = jnp.clip(b0f.astype(jnp.int32), 0, size - 1)
    q = quad_at(p)  # [...,4] = d00,d10,d01,d11
    lit = (depth_ref[..., None] - bias <= q).astype(jnp.float32)
    wx, wy = f[..., 0], f[..., 1]
    return (
        lit[..., 0] * (1 - wx) * (1 - wy)
        + lit[..., 1] * wx * (1 - wy)
        + lit[..., 2] * (1 - wx) * wy
        + lit[..., 3] * wx * wy
    )


def _pcf_4tap(sample_fn, base, f_scale, depth_ref, radius, bias=2e-3):
    """Bilinear 4-tap PCF at a (possibly per-pixel) tap ``radius`` in texels.

    ``sample_fn(p)`` gathers the depth at integer texel coords p [...,2].
    radius 0.5 ≈ hard shadows; larger radii give PCSS-style penumbras
    (ref: the soft omnidirectional/unidirectional light shader templates)."""
    b0 = jnp.floor(base)
    f = base - b0
    vis = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            off = jnp.stack(
                [
                    (dx - 0.5) * 2.0 * radius,
                    (dy - 0.5) * 2.0 * radius,
                ],
                axis=-1,
            )
            p = jnp.round(base + off).astype(jnp.int32)
            p = jnp.clip(p, 0, f_scale - 1)
            d = sample_fn(p)
            wx = f[..., 0] if dx else 1.0 - f[..., 0]
            wy = f[..., 1] if dy else 1.0 - f[..., 1]
            vis = vis + wx * wy * (depth_ref - bias <= d)
    return vis


def omni_shadow_visibility(
    light_pos, shadow_depths, shadow_vps, world_pos, source_extent=None
):
    """Visibility from a point-light cubemap at world positions [...,3].

    ``source_extent``: physical light size — enables PCSS-style soft shadows
    (blocker depth from the center tap scales the PCF radius;
    ref: soft shadow cube mapping scene / *omnidirectional_light*.wgsl).

    Per-pixel ``shadow_vps[face]`` would gather a 4x4 matrix per pixel
    (~25 ms at 540p on the v5e); instead the position is projected by ALL six
    face matrices (one [P,4]x[4,24] matmul) and the result is one-hot
    selected — and depth-map lookups use FLAT 1D indices into the stacked
    faces."""
    v = world_pos - light_pos
    av = jnp.abs(v)
    # face selection by dominant axis
    face = jnp.where(
        (av[..., 0] >= av[..., 1]) & (av[..., 0] >= av[..., 2]),
        jnp.where(v[..., 0] >= 0, 0, 1),
        jnp.where(
            av[..., 1] >= av[..., 2],
            jnp.where(v[..., 1] >= 0, 2, 3),
            jnp.where(v[..., 2] >= 0, 4, 5),
        ),
    )
    # componentwise projection by each face + flat one-hot select (matrix
    # gathers and [...,6,4]/[...,4] forms lane-pad their minor dims 32x)
    wx, wy, wz = world_pos[..., 0], world_pos[..., 1], world_pos[..., 2]

    def proj_face(f, row):
        m = shadow_vps[f]
        return m[row, 0] * wx + m[row, 1] * wy + m[row, 2] * wz + m[row, 3]

    def select_by_face(row):
        out = proj_face(0, row)
        for f in range(1, 6):
            out = jnp.where(face == f, proj_face(f, row), out)
        return out

    cxp = select_by_face(0)
    cyp = select_by_face(1)
    czp = select_by_face(2)
    cwp = jnp.maximum(select_by_face(3), 1e-8)
    iwp = 1.0 / cwp
    uv = jnp.stack(
        [cxp * iwp * 0.5 + 0.5, 0.5 - cyp * iwp * 0.5], -1
    )
    depth_ref = czp * iwp

    # accept raw [6,S,S] or quad-packed [6,S,S,4] maps
    quads = shadow_depths if shadow_depths.ndim == 4 else quad_pack(shadow_depths)
    s = quads.shape[-2]
    base = uv * s - 0.5
    flat = quads.reshape(6 * s * s, 4)
    fbase = face * (s * s)

    def sample(p):
        return flat[fbase + p[..., 1] * s + p[..., 0], 0]

    if source_extent is not None:
        # PCSS-lite: blocker depth from the center tap → penumbra radius
        pc = jnp.clip(jnp.round(base).astype(jnp.int32), 0, s - 1)
        d_blocker = sample(pc)
        penumbra = (
            source_extent
            * jnp.maximum(depth_ref - d_blocker, 0.0)
            / jnp.maximum(d_blocker, 1e-3)
        )
        radius = jnp.clip(0.5 + penumbra * s * 8.0, 0.5, 8.0)
        return _pcf_4tap(sample, base, s, depth_ref, radius)

    def quad_at(p):
        return flat[fbase + p[..., 1] * s + p[..., 0], :]

    return _pcf_4tap_quad(quad_at, base, s, depth_ref)


def uni_shadow_visibility(shadow_depth, shadow_vp, world_pos):
    hp = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    clip = jnp.einsum("ij,...j->...i", shadow_vp, hp)
    ndc = clip[..., :3]  # ortho: w == 1
    uv = jnp.stack([ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5], -1)
    in_map = jnp.all((uv >= 0.0) & (uv <= 1.0), axis=-1)
    vis = _sample_shadow_pcf(shadow_depth, uv, ndc[..., 2])
    return jnp.where(in_map, vis, 1.0)


# --- shading -------------------------------------------------------------------


def shade(
    lights: LightPools,
    world_pos,  # f32[H,W,3]
    normal,  # f32[H,W,3]
    albedo,  # f32[H,W,3]
    f0,  # f32[H,W,3]
    roughness,  # f32[H,W]
    emissive,  # f32[H,W,3]
    occlusion,  # f32[H,W] ambient occlusion factor
    camera_pos,  # f32[3]
    valid,  # bool[H,W] geometry coverage
    omni_shadows=None,  # optional (depths [L,6,S,S], vps [L,6,4,4])
    uni_shadows=None,  # optional (depths [D,C,S,S], vps [D,C,4,4], splits [D,C+1])
    view_depth=None,  # f32[H,W] camera-space depth (cascade selection)
    shadow_downsample: int = 1,  # compute visibility at 1/k res, upsample
    soft_shadows: bool = False,  # PCSS-style penumbras from source extents
    bf16: bool = False,  # evaluate the BRDF math in bfloat16
):
    """Deferred shading: ambient + omni + uni lights → HDR luminance [H,W,3].

    ``shadow_downsample > 1`` evaluates the PCF shadow visibility on a
    strided pixel grid and nearest-upsamples — the shadow-map gathers are the
    dominant cost of this pass on TPU, and penumbra quality at 1080p barely
    changes at 1/2 resolution."""
    h, w = world_pos.shape[:2]
    s = shadow_downsample

    def at_vis_res(x):
        return x[::s, ::s] if s > 1 else x

    def upsample(vis):
        if s == 1:
            return vis
        return jnp.repeat(jnp.repeat(vis, s, axis=0), s, axis=1)[:h, :w]

    view_dir = camera_pos - world_pos
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9
    )

    if bf16:
        # material/BRDF math in bf16 (half the VPU bandwidth); positions and
        # shadow projections stay f32 (depth comparisons need the precision)
        bt = jnp.bfloat16
        normal = normal.astype(bt)
        view_dir = view_dir.astype(bt)
        albedo = albedo.astype(bt)
        f0 = f0.astype(bt)
        roughness = roughness.astype(bt)
        emissive = emissive.astype(bt)
        occlusion = occlusion.astype(bt)

    lum = emissive + ambient_brdf(normal, view_dir, albedo, f0, roughness) * (
        (lights.ambient_luminance.astype(normal.dtype)) * occlusion[..., None]
    )

    # omni lights: inverse-square falloff (luminous intensity → illuminance)
    n_omni = lights.omni_mask.shape[0]
    for li in range(n_omni):
        lvec = lights.omni_position[li] - world_pos
        dist2 = jnp.sum(lvec * lvec, axis=-1)
        inv_dist = 1.0 / jnp.maximum(jnp.sqrt(dist2), 1e-9)
        ldir = (lvec * inv_dist[..., None]).astype(normal.dtype)
        illum = (
            lights.omni_intensity[li] / jnp.maximum(dist2, 1e-6)[..., None]
        ).astype(normal.dtype)
        # spherical-area-light emulation (always on in the reference's omni
        # shader): angular radius = emissive radius / distance
        tan_r = (0.5 * lights.omni_extent[li] * inv_dist).astype(normal.dtype)
        b = evaluate_brdf(normal, view_dir, ldir, albedo, f0, roughness,
                          tan_angular_radius=tan_r)
        contrib = b * illum
        if omni_shadows is not None:
            depths, vps = omni_shadows
            vis = upsample(
                omni_shadow_visibility(
                    lights.omni_position[li], depths[li], vps[li],
                    at_vis_res(world_pos),
                    source_extent=(
                        lights.omni_extent[li] if soft_shadows else None
                    ),
                )
            )
            vis = jnp.where(lights.omni_shadowable[li], vis, 1.0)
            contrib = contrib * vis[..., None].astype(contrib.dtype)
        lum = lum + jnp.where(lights.omni_mask[li], contrib, 0.0)

    # uni lights
    n_uni = lights.uni_mask.shape[0]
    for li in range(n_uni):
        ldir = (-lights.uni_direction[li]).astype(normal.dtype)
        # area emulation: tan of half the angular source extent
        # (lib.rs:1375 tan_angular_radius_from_angular_extent)
        tan_r = jnp.tan(
            0.5 * lights.uni_extent[li] * (jnp.pi / 180.0)
        ).astype(normal.dtype)
        b = evaluate_brdf(normal, view_dir, ldir, albedo, f0, roughness,
                          tan_angular_radius=tan_r)
        if uni_shadows is not None:
            depths, vps, splits = uni_shadows
            vis = upsample(
                uni_cascade_visibility(
                    depths[li], vps[li], splits[li], at_vis_res(view_depth),
                    at_vis_res(world_pos), at_vis_res(normal),
                    angular_extent=(
                        lights.uni_extent[li] * (jnp.pi / 180.0)
                        if soft_shadows
                        else None
                    ),
                )
            )
            vis = jnp.where(lights.uni_shadowable[li], vis, 1.0)
            b = b * vis[..., None].astype(b.dtype)
        lum = lum + jnp.where(
            lights.uni_mask[li],
            b * lights.uni_illuminance[li].astype(normal.dtype),
            0.0,
        )

    return jnp.where(valid[..., None], lum, 0.0).astype(jnp.float32)


# --- cascaded shadow maps (ref: lib.rs:296-340 ShadowableUnidirectionalLight,
#     MAX_SHADOW_MAP_CASCADES = 4, CascadePartitionDepths) ----------------------

MAX_SHADOW_MAP_CASCADES = 4  # ref: lib.rs:340


def cascade_partition_depths(near, far, n_cascades: int, blend: float = 0.75):
    """Practical split scheme: blend of linear and logarithmic partitions
    (the standard PSSM split the reference's CascadePartitionDepths models).
    Returns [n_cascades + 1] view-space depths."""
    i = jnp.arange(n_cascades + 1, dtype=jnp.float32) / n_cascades
    linear = near + (far - near) * i
    logarithmic = near * (far / near) ** i
    return blend * logarithmic + (1.0 - blend) * linear


def _frustum_corners_world(cam_pos, cam_orientation, vertical_fov, aspect, d0, d1):
    """8 world-space corners of the camera sub-frustum between depths d0, d1."""
    from ..math import quaternion as quat

    ty = jnp.tan(0.5 * vertical_fov)
    tx = ty * aspect
    corners = []
    for d in (d0, d1):
        for sy in (-1.0, 1.0):
            for sx in (-1.0, 1.0):
                corners.append(jnp.stack([sx * tx * d, sy * ty * d, -d]))
    local = jnp.stack(corners)  # [8,3] camera space
    return quat.rotate(cam_orientation[None, :], local) + cam_pos[None, :]


def render_uni_shadow_cascades(
    light_dir, cam_pos, cam_orientation, vertical_fov, aspect, near, far,
    tri_pos9, tri_active, resolution: int,
    n_cascades: int, backend: str = "xla",
):
    """n-cascade directional shadow maps fit to the camera sub-frusta
    (ref: uni shadow cascade update passes, ≤4 cascades per light).

    Returns (depths [C,S,S], vps [C,4,4], splits [C+1], n_drop)."""
    splits = cascade_partition_depths(near, far, n_cascades)

    def one(c):
        d0, d1 = splits[c], splits[c + 1]
        corners = _frustum_corners_world(
            cam_pos, cam_orientation, vertical_fov, aspect, d0, d1
        )
        center = jnp.mean(corners, axis=0)
        radius = jnp.max(jnp.linalg.norm(corners - center, axis=-1)) + 1e-3
        return render_uni_shadow_map(
            light_dir, center, radius,
            tri_pos9, tri_active, resolution,
            backend=backend,
        )

    if backend == "pallas":
        # static loop: Pallas kernels don't batch under vmap
        outs = [one(c) for c in range(n_cascades)]
        n_drop = sum(o[2] for o in outs)
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]), splits, n_drop)
    depths, vps, drops = jax.vmap(one)(jnp.arange(n_cascades))
    return depths, vps, splits, jnp.sum(drops)


def uni_cascade_visibility(
    depths, vps, splits, view_depth, world_pos, normal=None, angular_extent=None
):
    """Cascade-selected PCF visibility. view_depth [...]: −z in camera space.

    Receiver positions are offset along the surface normal by ~1.5 shadow
    texels (normal-offset bias, derived from each cascade's ortho extent via
    vp[0,0] = 1/radius) — kills the acne the constant depth bias leaves on
    large ground planes."""
    # accept raw [C,S,S] or quad-packed [C,S,S,4] maps
    quads = depths if depths.ndim == 4 else quad_pack(depths)
    n_cascades = quads.shape[0]
    # pick the first cascade whose far split exceeds the pixel depth
    if n_cascades > 1:
        idx = jnp.sum(
            (view_depth[..., None] > splits[1:-1]).astype(jnp.int32), axis=-1
        )
        idx = jnp.clip(idx, 0, n_cascades - 1)
    else:
        idx = jnp.zeros(view_depth.shape, jnp.int32)
    s = quads.shape[-2]
    # componentwise per-cascade projection + select (per-pixel [4,4] matrix
    # gathers / [...,C,4] one-hot einsums lane-pad their minor dims 32x)
    if normal is not None:
        radii = 1.0 / jnp.maximum(jnp.abs(vps[:, 0, 0]), 1e-9)  # [C]
        radius_px = radii[0]
        for c in range(1, n_cascades):
            radius_px = jnp.where(idx == c, radii[c], radius_px)
        texel_world = 2.0 * radius_px / s
        world_pos = world_pos + normal * (1.5 * texel_world)[..., None]
    wx, wy, wz = world_pos[..., 0], world_pos[..., 1], world_pos[..., 2]

    def proj_c(c, row):
        m = vps[c]
        return m[row, 0] * wx + m[row, 1] * wy + m[row, 2] * wz + m[row, 3]

    def select_c(row):
        out = proj_c(0, row)
        for c in range(1, n_cascades):
            out = jnp.where(idx == c, proj_c(c, row), out)
        return out

    ndc_x = select_c(0)
    ndc_y = select_c(1)
    ndc_z = select_c(2)
    uv = jnp.stack([ndc_x * 0.5 + 0.5, 0.5 - ndc_y * 0.5], -1)
    ndc = jnp.stack([ndc_x, ndc_y, ndc_z], -1)
    in_map = jnp.all((uv >= 0.0) & (uv <= 1.0), axis=-1)
    base = uv * s - 0.5
    flat = quads.reshape(n_cascades * s * s, 4)
    cbase = idx * (s * s)

    if angular_extent is not None:
        # PCSS-lite for directional lights: penumbra ∝ angular extent ×
        # (receiver − blocker) light-space depth difference
        def sample(p):
            return flat[cbase + p[..., 1] * s + p[..., 0], 0]

        pc = jnp.clip(jnp.round(base).astype(jnp.int32), 0, s - 1)
        d_blocker = sample(pc)
        penumbra = angular_extent * jnp.maximum(ndc[..., 2] - d_blocker, 0.0)
        radius = jnp.clip(0.5 + penumbra * s * 4.0, 0.5, 8.0)
        vis = _pcf_4tap(sample, base, s, ndc[..., 2], radius)
        return jnp.where(in_map, vis, 1.0)

    def quad_at(p):
        return flat[cbase + p[..., 1] * s + p[..., 0], :]

    vis = _pcf_4tap_quad(quad_at, base, s, ndc[..., 2])
    return jnp.where(in_map, vis, 1.0)
