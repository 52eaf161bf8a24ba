"""The deferred HDR render pipeline as one jit-compiled function.

Ref: impact_rendering/src/render_command.rs:222-432 — the reference records
wgpu passes: clear → voxel chunk culling → depth prepass → geometry pass
(G-buffer) → shadow map updates → ambient light → directional lights → skybox
→ postprocessing (AO → TAA → bloom → exposure → tone map to surface). Here the
whole frame is one XLA program: rasterize G-buffer → shadow maps → fused
shading → postprocess chain; intermediate attachments are just arrays
(the reference's 11 render-attachment quantities, attachment.rs:37-49, map to
the locals of this function).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import post, raster as rasterlib
from .camera import Camera, projection_matrix, view_matrix
from .lights import (
    LightPools,
    render_omni_shadow_cubemap,
    render_uni_shadow_cascades,
    render_uni_shadow_map,
    shade,
)


class RenderScene(NamedTuple):
    """Flattened world-space geometry for one frame (from the scene module).

    CORNER-MAJOR: every per-vertex quantity is stored per triangle corner
    ([:, 3c:3c+3] / [:, c] is corner c) so the per-frame render path never
    gathers by triangle index — a [T,3]-indexed gather at bench scale
    measured ~150 ms/frame on the v5e (devtools/probe_attr_ops.py). The
    corner layout is built once per remesh (CompactMesh.tri_*) and
    transformed elementwise here each frame."""

    tri_pos: jnp.ndarray  # f32[T,9] world corner positions
    tri_pos_prev: jnp.ndarray  # f32[T,9] previous-frame world corner positions
    tri_normal: jnp.ndarray  # f32[T,9] world corner normals
    tri_albedo: jnp.ndarray  # f32[T,9]
    tri_f0: jnp.ndarray  # f32[T,9] specular reflectance at normal incidence
    tri_roughness: jnp.ndarray  # f32[T,3]
    tri_emissive: jnp.ndarray  # f32[T,9]
    tri_material: jnp.ndarray  # i32[T,3] texture layer (voxel type), -1 untextured
    tri_active: jnp.ndarray  # bool[T]
    tri_shadow: jnp.ndarray  # bool[T] casts shadows (scene flags + distance rules)


class RenderConfig(NamedTuple):
    """Static pipeline configuration (derived from EngineConfig.rendering)."""

    width: int = 256
    height: int = 192
    shadow_map_resolution: int = 256
    ao_enabled: bool = True
    ao_sample_count: int = 4
    ao_sample_radius: float = 1.0
    ao_intensity: float = 2.0
    ao_contrast: float = 0.75
    taa_enabled: bool = True
    taa_current_frame_weight: float = 0.1
    taa_variance_clipping_threshold: float = 1.0
    bloom_enabled: bool = True
    bloom_n_downsamplings: int = 4
    bloom_blur_filter_radius: float = 0.005
    bloom_blurred_luminance_weight: float = 0.04
    exposure_ev_compensation: float = 0.0
    exposure_lower: float = 1e-6
    exposure_upper: float = 1e-2
    # manual sensitivity (ref: capturing.rs SensorSensitivity::Manual) — when
    # set, exposure is fixed from aperture/shutter/ISO instead of average
    # luminance
    exposure_iso: float | None = None
    relative_aperture: float = 4.0
    shutter_duration: float = 0.005
    luminance_lower: float = 100.0
    luminance_upper: float = 1e7
    exposure_current_frame_weight: float = 0.02
    tone_mapping: str = "ACES"
    shadows_enabled: bool = True
    csm_cascades: int = 1  # directional-light cascades (ref MAX = 4)
    sky_luminance: tuple = (0.0, 0.0, 0.0)
    # textured-material path (ref: impact_material Textured*/NormalMap setup
    # components) — triplanar voxel-type texture arrays applied in shading
    textured: bool = False
    texture_scale: float = 0.5  # world units → uv tiling frequency
    normal_map_strength: float = 1.0
    shadow_pcf_downsample: int = 1  # PCF visibility at 1/k res (1080p: 2)
    ao_downsample: int = 1  # AO at 1/k res (1080p: 2) — occluder gathers
    # dominate the shade pass; AO is low-frequency and 3x3-blurred anyway
    soft_shadows: bool = False  # PCSS-style penumbras from light extents
    procedural_sky: bool = False  # gradient+sun skybox for sky pixels
    orthographic: bool = False  # true orthographic camera projection
    bf16_shading: bool = False  # BRDF math in bfloat16
    # raster triangle budget: the scene's (mostly inactive) triangle slots are
    # compacted to this many before clipping — the render-side analog of the
    # reference's chunk culling + indirect draws
    max_triangles: int = 65536
    # per-view culling (ref: impact_scene/src/lib.rs:160 frustum-culled
    # instance buffering + voxel_chunk_culling.template.wgsl): the camera pass
    # masks triangles whose bounding spheres are outside the view frustum
    # (geometry/frustum.py planes); omni shadow passes mask casters beyond
    # the light's range. Static shapes mean culling is masking — the win is
    # fewer binned raster candidates, not smaller arrays.
    view_culling: bool = True
    # "pallas" = the Pallas tile kernel (raster_pallas.py, TPU), "xla" = the
    # XLA tile-binned raster (raster.py, CPU oracle + fallback). Resolved
    # from "auto" by platform at config-build time (runtime/setup.py).
    raster_backend: str = "xla"


class RenderState(NamedTuple):
    """Cross-frame render state (history buffers, exposure smoothing)."""

    history_luminance: jnp.ndarray  # f32[H,W,3] TAA history
    avg_luminance: jnp.ndarray  # f32 smoothed scene luminance
    frame_index: jnp.ndarray  # i32
    # cumulative raster candidates lost to per-tile/big-block overflow across
    # all views and frames ("no silent caps" — bench asserts this stays 0).
    # Plain-int default avoids touching the backend at import time.
    n_raster_drops: jnp.ndarray = 0


def init_render_state(config: RenderConfig) -> RenderState:
    return RenderState(
        history_luminance=jnp.zeros((config.height, config.width, 3), jnp.float32),
        avg_luminance=jnp.asarray(1000.0, jnp.float32),
        frame_index=jnp.asarray(0, jnp.int32),
        n_raster_drops=jnp.asarray(0, jnp.int32),
    )


class GBuffer(NamedTuple):
    """Per-pixel geometry attachments (ref: attachment.rs:37-49 quantities)."""

    world_pos: jnp.ndarray  # f32[H,W,3]
    normal: jnp.ndarray  # f32[H,W,3]
    albedo: jnp.ndarray  # f32[H,W,3]
    f0: jnp.ndarray  # f32[H,W,3]
    roughness: jnp.ndarray  # f32[H,W]
    emissive: jnp.ndarray  # f32[H,W,3]
    material: jnp.ndarray  # i32[H,W] texture layer (-1 = untextured)
    motion: jnp.ndarray  # f32[H,W,2] uv-space motion vectors
    valid: jnp.ndarray  # bool[H,W]


def compact_scene_triangles(scene: RenderScene, max_triangles: int) -> RenderScene:
    """Compact active triangle slots to the raster budget (slots are mostly
    masked: fixed-capacity voxel meshes). Corner-major: every field is
    per-triangle, so compaction gathers all of them — size the budget to the
    slot count when possible to skip this entirely."""
    if scene.tri_active.shape[0] > max_triangles:
        order = jnp.argsort(~scene.tri_active, stable=True)[:max_triangles]
        scene = jax.tree.map(lambda a: a[order], scene)
    return scene


def project_corners(tri_pos9, vp):
    """Corner-major world positions [T,9] → clip positions [T,3,4].

    Elementwise per corner (no gather); the [T,3,4] stack is materialized
    only at the raster API boundary."""
    cols = []
    for c in range(3):
        p = tri_pos9[:, 3 * c : 3 * c + 3]
        cols.append(p @ vp[:, :3].T + vp[None, :, 3])
    return jnp.stack(cols, axis=1)


def triangle_bounding_spheres(tri_pos9):
    """Per-triangle bounding spheres (centroid + max corner distance) from
    corner-major world positions [T,9]. Used by the per-view frustum/range
    culls (ref: impact_scene frustum culling over model bounding spheres)."""
    c0 = tri_pos9[:, 0:3]
    c1 = tri_pos9[:, 3:6]
    c2 = tri_pos9[:, 6:9]
    center = (c0 + c1 + c2) * (1.0 / 3.0)
    rad = jnp.sqrt(
        jnp.maximum(
            jnp.sum((c0 - center) ** 2, axis=-1),
            jnp.maximum(
                jnp.sum((c1 - center) ** 2, axis=-1),
                jnp.sum((c2 - center) ** 2, axis=-1),
            ),
        )
    )
    return center, rad


def cull_scene_to_frustum(scene: RenderScene, view_proj) -> RenderScene:
    """Mask ``tri_active`` to triangles whose bounding spheres intersect the
    view frustum (ref: lib.rs:160 buffer_model_instances_and_bound_lights —
    the reference frustum-culls instances per view; here the cull is exact
    per-triangle since the flat corner-major scene has no instance gather).
    ``tri_shadow`` is left untouched — shadow views cull separately."""
    from ..geometry.frustum import (
        frustum_planes_from_view_proj,
        sphere_inside_frustum,
    )

    normals, disp = frustum_planes_from_view_proj(view_proj)
    center, rad = triangle_bounding_spheres(scene.tri_pos)
    vis = sphere_inside_frustum(normals, disp, center, rad)
    return scene._replace(tri_active=scene.tri_active & vis)


def _f32_matmuls(fn):
    """Trace the stage with f32 matmul precision.

    TPU dots default to bf16 passes; the render stages' matmuls are
    small-K projection/interpolation contractions (world->clip,
    world->light-space, barycentric interpolation) whose bf16 rounding is
    VISIBLE — reference-golden parity on hardware drops from 0.976 to
    0.910 (devtools/probe_tpu_parity.py). These contractions are
    bandwidth-bound, so f32 costs nothing; the physics step keeps the
    default (its MXU solver matmuls feed impulses, not pixels).

    Scope: geometry/shadow/shade only. The Pallas raster kernels inside
    them are re-exempted inline (their MXU plane evals decide coverage,
    not shading — HIGHEST doubled the geometry pass), and postprocess is
    NOT wrapped (its bloom/TAA convolutions tripled under HIGHEST while
    contributing nothing measurable to golden parity)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


@_f32_matmuls
def geometry_pass(
    scene: RenderScene,
    cam: Camera,
    cam_prev: Camera,
    frame_index,
    config: RenderConfig,
) -> GBuffer:
    """Rasterize the G-buffer + motion vectors (ref: GeometryPass, 592).

    Returns (GBuffer, n_drop) — n_drop counts raster candidates lost to
    per-tile/big-block overflow ("no silent caps"; callers sum per-frame).
    ``scene`` must already be triangle-compacted (compact_scene_triangles)."""
    h, w = config.height, config.width
    jitter = frame_index if config.taa_enabled else None
    ortho = config.orthographic
    vm = view_matrix(cam)
    pm = projection_matrix(cam, w, h, jitter, orthographic=ortho)
    vp = pm @ vm
    if config.view_culling:
        scene = cull_scene_to_frustum(scene, vp)
    vm_prev = view_matrix(cam_prev)
    pm_prev = projection_matrix(cam_prev, w, h, None, orthographic=ortho)
    vp_prev = pm_prev @ vm_prev

    # fused raster: attributes are fetched per (tile, candidate) inside the
    # tile loop and interpolated at winner selection. Corner-major [T,60]
    # packing (20 attrs per corner) — no per-frame gather at all.
    def corner_attrs(c):
        return jnp.concatenate(
            [
                scene.tri_pos[:, 3 * c : 3 * c + 3],  # 0:3
                scene.tri_pos_prev[:, 3 * c : 3 * c + 3],  # 3:6
                scene.tri_normal[:, 3 * c : 3 * c + 3],  # 6:9
                scene.tri_albedo[:, 3 * c : 3 * c + 3],  # 9:12
                scene.tri_f0[:, 3 * c : 3 * c + 3],  # 12:15
                scene.tri_roughness[:, c : c + 1],  # 15
                scene.tri_emissive[:, 3 * c : 3 * c + 3],  # 16:19
                scene.tri_material[:, c : c + 1].astype(jnp.float32),  # 19
            ],
            axis=-1,
        )

    packed = jnp.concatenate([corner_attrs(c) for c in range(3)], axis=-1)
    t = scene.tri_active.shape[0]
    if config.raster_backend == "pallas":
        from . import raster_pallas

        # 32-px tiles: with the MXU plane eval the kernel is bound by its
        # ~3.4 µs/grid-step floor (DMA starts + Mosaic loop), so 4x fewer
        # steps wins; k scales with tile area.
        # The kernel's plane-eval matmuls are EXEMPT from the stage's f32
        # precision (they decide coverage, not shading values, and HIGHEST
        # there doubled the pass: 68.6 → 126.4 ms at 1080p)
        with jax.default_matmul_precision("default"):
            out, near, valid, n_drop = raster_pallas.rasterize_attributes_pos(
                scene.tri_pos, scene.tri_active, packed, vp, h, w,
                tile=32, k_per_range=256, return_drops=True,
            )
    else:
        # XLA fallback (CPU oracle): identity corner indices; keeps the
        # nearest-K per tile without counting drops
        tri_clip = project_corners(scene.tri_pos, vp)
        idx = jnp.arange(3 * t, dtype=jnp.int32).reshape(t, 3)
        out, near, valid = rasterlib.rasterize_attributes(
            tri_clip, scene.tri_active, idx, packed.reshape(3 * t, 20), h, w
        )
        n_drop = jnp.int32(0)

    world_pos = out[..., 0:3]
    world_pos_prev = out[..., 3:6]
    normal = out[..., 6:9]
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    albedo = out[..., 9:12]
    f0 = out[..., 12:15]
    # G-buffer stores GGX alpha = perceptual roughness squared, converted
    # per-fragment after interpolation (ref: model_geometry.template.wgsl:332
    # computeGGXRoughnessFromPerceptuallyLinearRoughness)
    roughness = out[..., 15] * out[..., 15]
    emissive = out[..., 16:19]

    # material index from the max-weight corner (ints don't interpolate)
    material = jnp.round(near[..., 19]).astype(jnp.int32)
    material = jnp.where(valid, material, -1)

    # motion vectors in uv units (ref: MotionVector attachment).
    # Componentwise projection: einsum("ij,hwj->hwi") materializes [H,W,4]
    # forms whose 4-wide minor dim lane-pads 32x on TPU.
    vp_cur_unjittered = (
        projection_matrix(cam, w, h, None, orthographic=ortho) @ vm
    )

    def ndc_xy(wp, m):
        x, y, z = wp[..., 0], wp[..., 1], wp[..., 2]
        cx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
        cy = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
        cw = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
        iw = 1.0 / jnp.maximum(cw, 1e-8)
        return cx * iw, cy * iw

    px_prev, py_prev = ndc_xy(world_pos_prev, vp_prev)
    px_cur, py_cur = ndc_xy(world_pos, vp_cur_unjittered)
    motion = jnp.stack(
        [(px_prev - px_cur) * 0.5, (py_prev - py_cur) * -0.5], axis=-1
    )
    motion = jnp.where(valid[..., None], motion, 0.0)

    gb = GBuffer(
        world_pos=world_pos, normal=normal, albedo=albedo, f0=f0,
        roughness=roughness, emissive=emissive, material=material,
        motion=motion, valid=valid,
    )
    return gb, n_drop


@_f32_matmuls
def shadow_pass(scene: RenderScene, lights: LightPools, cam: Camera, config: RenderConfig):
    """Render all shadow maps (ref: omni/uni shadow-map update passes).

    Returns (omni_shadows, uni_shadows, n_drop), or (None, None, 0) when
    disabled. n_drop sums raster-candidate overflow over every view."""
    import jax

    h, w = config.height, config.width
    if not config.shadows_enabled:
        return None, None, jnp.int32(0)

    shadow_tris = scene.tri_active & scene.tri_shadow
    backend = config.raster_backend
    n_drop = jnp.int32(0)
    if config.view_culling:
        # bound omni shadow work to casters inside the light's range
        # (ref: bound_omnidirectional_lights_and_buffer_shadow_casting_models)
        sph_center, sph_rad = triangle_bounding_spheres(scene.tri_pos)

    from .lights import OMNI_SHADOW_FAR, quad_pack

    def omni_one(pos):
        tris = shadow_tris
        if config.view_culling:
            d2 = jnp.sum((sph_center - pos[None, :]) ** 2, axis=-1)
            tris = tris & (d2 <= (OMNI_SHADOW_FAR + sph_rad) ** 2)
        return render_omni_shadow_cubemap(
            pos, scene.tri_pos, tris,
            config.shadow_map_resolution, backend=backend,
        )

    if backend == "pallas":
        # static loop over the light pool: Pallas kernels don't batch under
        # vmap (pool slots are few; masked-out lights render empty maps)
        outs = [omni_one(lights.omni_position[i])
                for i in range(lights.omni_position.shape[0])]
        omni_depths = jnp.stack([o[0] for o in outs])
        omni_vps = jnp.stack([o[1] for o in outs])
        n_drop = n_drop + sum(o[2] for o in outs)
    else:
        omni_depths, omni_vps, omni_drops = jax.vmap(omni_one)(
            lights.omni_position
        )
        n_drop = n_drop + jnp.sum(omni_drops)
    # quad-pack once per frame: the shade pass then needs ONE gather row per
    # pixel for all four bilinear PCF taps
    omni_shadows = (quad_pack(omni_depths), omni_vps)

    if config.csm_cascades > 1:
        # cascaded maps fit to camera sub-frusta (ref: ≤4-cascade CSM)
        def uni_one(d):
            return render_uni_shadow_cascades(
                d, cam.position, cam.orientation, cam.vertical_fov,
                w / h, cam.near, jnp.minimum(cam.far, 200.0),
                scene.tri_pos, shadow_tris,
                config.shadow_map_resolution, config.csm_cascades,
                backend=backend,
            )

        if backend == "pallas":
            outs = [uni_one(lights.uni_direction[i])
                    for i in range(lights.uni_direction.shape[0])]
            uni_depths = jnp.stack([o[0] for o in outs])
            uni_vps = jnp.stack([o[1] for o in outs])
            uni_splits = jnp.stack([o[2] for o in outs])
            n_drop = n_drop + sum(o[3] for o in outs)
        else:
            uni_depths, uni_vps, uni_splits, uni_drops = jax.vmap(uni_one)(
                lights.uni_direction
            )
            n_drop = n_drop + jnp.sum(uni_drops)
    else:
        corner0 = scene.tri_pos[:, 0:3]
        act = scene.tri_active[:, None]
        scene_center = jnp.sum(
            jnp.where(act, corner0, 0.0), axis=0
        ) / jnp.maximum(jnp.sum(scene.tri_active), 1)
        scene_radius = jnp.maximum(
            jnp.max(jnp.where(
                scene.tri_active,
                jnp.linalg.norm(corner0 - scene_center, axis=-1), 0.0)), 1.0
        )

        def uni_one(d):
            return render_uni_shadow_map(
                d, scene_center, scene_radius,
                scene.tri_pos, shadow_tris,
                config.shadow_map_resolution, backend=backend,
            )

        if backend == "pallas":
            outs = [uni_one(lights.uni_direction[i])
                    for i in range(lights.uni_direction.shape[0])]
            uni_depths = jnp.stack([o[0] for o in outs])
            uni_vps = jnp.stack([o[1] for o in outs])
            n_drop = n_drop + sum(o[2] for o in outs)
        else:
            uni_depths, uni_vps, uni_drops = jax.vmap(uni_one)(
                lights.uni_direction
            )
            n_drop = n_drop + jnp.sum(uni_drops)
        uni_depths = uni_depths[:, None]
        uni_vps = uni_vps[:, None]
        uni_splits = jnp.tile(
            jnp.stack([cam.near, cam.far])[None], (lights.uni_mask.shape[0], 1)
        )
    uni_shadows = (quad_pack(uni_depths), uni_vps, uni_splits)
    return omni_shadows, uni_shadows, n_drop


@_f32_matmuls
def deferred_shade(
    gb: GBuffer,
    lights: LightPools,
    cam: Camera,
    omni_shadows,
    uni_shadows,
    config: RenderConfig,
    textures=None,
):
    """AO + deferred lighting → HDR luminance [H,W,3] (ref: ambient +
    directional light passes, AO computation/application).

    ``textures``: optional ``VoxelTextureSet`` — applies triplanar albedo and
    normal mapping to pixels whose material layer is ≥ 0 before lighting
    (ref: impact_material TexturedColor/NormalMap, setup/physical.rs:36-166;
    voxel-type texture arrays, voxel_types.rs)."""
    h, w = config.height, config.width
    vm = view_matrix(cam)

    def view_row(wp, m, i):
        """Row i of the view transform applied componentwise (einsum over a
        [H,W,4] homogeneous array lane-pads its minor dim 32x on TPU)."""
        return (
            m[i, 0] * wp[..., 0]
            + m[i, 1] * wp[..., 1]
            + m[i, 2] * wp[..., 2]
            + m[i, 3]
        )

    if config.textured and textures is not None:
        from .textures import lod_from_scale, sample_triplanar, triplanar_normal

        has_tex = gb.material >= 0
        layer = jnp.maximum(gb.material, 0)
        # mip level from the texel footprint of one pixel at this depth
        view_depth = -view_row(gb.world_pos, vm, 2)
        tex_size = textures.albedo.mips[0].shape[1]
        world_per_pixel = view_depth * (
            2.0 * jnp.tan(0.5 * cam.vertical_fov) / h
        )
        lod = lod_from_scale(world_per_pixel * config.texture_scale * tex_size)

        wp = gb.world_pos
        props = None
        if textures.props is not None:
            # per-layer PBR property textures for textured mesh entities
            # (ref: Textured{SpecularReflectance,Roughness,Metalness,
            # EmissiveLuminance}/ParallaxMap, setup/physical.rs:79-214)
            props = sample_triplanar(
                textures.props, layer, wp, gb.normal,
                config.texture_scale, lod,
            )
            # single-step triplanar parallax: shift the world-space sample
            # position along the view's tangential component by the height
            # sample (displacement scale baked into the channel at setup;
            # ref: ParallaxMap — the reference occlusion-steps in-shader,
            # one offset step is the standard approximation)
            hgt = props[..., 4]
            v = cam.position - wp
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6
            )
            ndv = jnp.sum(v * gb.normal, axis=-1, keepdims=True)
            vtan = v - ndv * gb.normal
            wp = wp - vtan * (hgt / jnp.maximum(ndv[..., 0], 0.2))[..., None]
            props = sample_triplanar(
                textures.props, layer, wp, gb.normal,
                config.texture_scale, lod,
            )

        tex_albedo = sample_triplanar(
            textures.albedo, layer, wp, gb.normal,
            config.texture_scale, lod,
        )
        metal_mask = jnp.any(gb.f0 > 0.5, axis=-1, keepdims=True)
        albedo = jnp.where(
            (has_tex & ~metal_mask[..., 0])[..., None], tex_albedo, gb.albedo
        )
        normal = triplanar_normal(
            textures.normal, layer, wp, gb.normal,
            config.normal_map_strength, config.texture_scale, lod,
        )
        normal = jnp.where(has_tex[..., None], normal, gb.normal)
        if props is None:
            gb = gb._replace(albedo=albedo, normal=normal)
        else:
            # full-PBR layers (textured entities) recompute every material
            # quantity from the sampled stack; voxel-type layers (full_pbr=0)
            # keep the albedo/normal-only behavior above. Metal/dielectric
            # mix per the reference: dielectric F0 = spec, diffuse = color;
            # metal F0 = color*spec, diffuse = 0 (setup/physical.rs:110-135).
            fp = textures.full_pbr[layer] * has_tex
            rough_t, metal_t, spec_t, emis_t = (
                props[..., 0], props[..., 1], props[..., 2], props[..., 3]
            )
            m1 = metal_t[..., None]
            alb_full = tex_albedo * (1.0 - m1)
            f0_full = spec_t[..., None] * ((1.0 - m1) + tex_albedo * m1)
            emis_full = tex_albedo * emis_t[..., None]
            fpx = fp[..., None]
            gb = gb._replace(
                albedo=albedo * (1.0 - fpx) + alb_full * fpx,
                normal=normal,
                f0=gb.f0 * (1.0 - fpx) + f0_full * fpx,
                roughness=gb.roughness * (1.0 - fp) + rough_t * fp,
                emissive=gb.emissive * (1.0 - fpx) + emis_full * fpx,
            )

    if config.ao_enabled:
        k = config.ao_downsample
        wp_k = gb.world_pos[::k, ::k]
        vpos_h = jnp.stack(
            [view_row(wp_k, vm, i) for i in range(3)], axis=-1
        )
        n_k = gb.normal[::k, ::k]
        vnorm = jnp.stack(
            [
                vm[i, 0] * n_k[..., 0]
                + vm[i, 1] * n_k[..., 1]
                + vm[i, 2] * n_k[..., 2]
                for i in range(3)
            ],
            axis=-1,
        )
        occlusion = post.ambient_occlusion(
            vpos_h, vnorm, gb.valid[::k, ::k], cam.vertical_fov,
            sample_count=config.ao_sample_count,
            sample_radius=config.ao_sample_radius,
            intensity=config.ao_intensity,
            contrast=config.ao_contrast,
        )
        if k > 1:
            occlusion = jnp.repeat(
                jnp.repeat(occlusion, k, axis=0), k, axis=1
            )[:h, :w]
    else:
        occlusion = jnp.ones((h, w), jnp.float32)

    view_depth = -view_row(gb.world_pos, vm, 2)
    lum = shade(
        lights, gb.world_pos, gb.normal, gb.albedo, gb.f0, gb.roughness,
        gb.emissive, occlusion, cam.position, gb.valid,
        omni_shadows, uni_shadows, view_depth,
        shadow_downsample=config.shadow_pcf_downsample,
        soft_shadows=config.soft_shadows,
        bf16=config.bf16_shading,
    )
    if config.procedural_sky:
        from .sky import pixel_view_directions, procedural_sky

        rays = pixel_view_directions(cam.orientation, cam.vertical_fov, w, h)
        sun = None
        if lights.uni_mask.shape[0] > 0:
            sun = lights.uni_direction[0]
        sky = procedural_sky(rays, sun_direction=sun)
    else:
        sky = jnp.asarray(config.sky_luminance, jnp.float32)
    return jnp.where(gb.valid[..., None], lum, sky)


def postprocess(
    lum,
    motion,
    state: RenderState,
    config: RenderConfig,
):
    """TAA → bloom → auto-exposure → tone map → u8 (ref: Postprocessor chain).

    Returns (img u8 [H,W,3], hdr luminance, new RenderState)."""
    if config.taa_enabled:
        blended = post.temporal_anti_aliasing(
            lum, state.history_luminance, motion,
            config.taa_current_frame_weight,
            config.taa_variance_clipping_threshold,
        )
        first = state.frame_index == 0
        lum_out = jnp.where(first, lum, blended)
        history = lum_out
    else:
        lum_out = lum
        history = state.history_luminance

    if config.bloom_enabled:
        lum_out = post.bloom(
            lum_out, config.bloom_n_downsamplings,
            blur_filter_radius=config.bloom_blur_filter_radius,
            blurred_luminance_weight=config.bloom_blurred_luminance_weight,
        )

    frame_avg = post.average_luminance(
        lum_out, config.luminance_lower, config.luminance_upper
    )
    wgt = config.exposure_current_frame_weight
    avg = jnp.where(
        state.frame_index == 0,
        frame_avg,
        (1.0 - wgt) * state.avg_luminance + wgt * frame_avg,
    )
    if config.exposure_iso is not None:
        exposure = post.manual_exposure(
            config.relative_aperture, config.shutter_duration,
            config.exposure_iso, config.exposure_lower, config.exposure_upper,
        )
    else:
        exposure = post.exposure_from_average_luminance(
            avg, config.exposure_ev_compensation,
            config.exposure_lower, config.exposure_upper,
        )
    ldr = post.tonemap(lum_out * exposure, config.tone_mapping)
    img = post.to_u8(post.to_srgb(ldr))

    new_state = RenderState(
        history_luminance=history,
        avg_luminance=avg,
        frame_index=state.frame_index + 1,
        n_raster_drops=state.n_raster_drops,
    )
    return img, lum_out, new_state


def render_frame(
    scene: RenderScene,
    lights: LightPools,
    cam: Camera,
    cam_prev: Camera,
    state: RenderState,
    config: RenderConfig,
    textures=None,
):
    """Render one frame. Returns (u8 image [H,W,3], hdr luminance, new state).

    Composition of the four passes. NOTE: jitting this whole function as one
    program makes XLA's optimization passes blow up (minutes of compile time);
    prefer jitting the stage functions separately (HeadlessRuntime does)."""
    scene = compact_scene_triangles(scene, config.max_triangles)
    gb, geo_drops = geometry_pass(scene, cam, cam_prev, state.frame_index, config)
    omni_shadows, uni_shadows, shadow_drops = shadow_pass(
        scene, lights, cam, config
    )
    state = state._replace(
        n_raster_drops=state.n_raster_drops + geo_drops + shadow_drops
    )
    lum = deferred_shade(
        gb, lights, cam, omni_shadows, uni_shadows, config, textures
    )
    return postprocess(lum, gb.motion, state, config)
