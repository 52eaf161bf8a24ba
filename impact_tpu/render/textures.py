"""Texture arrays, samplers, mipmaps, and lookup tables.

Ref: impact_texture — ``TextureRegistry``/``SamplerRegistry`` (lib.rs),
image import + mipmap policy (import.rs, processing.rs), ``LookupTable``
textures (lookup_table.rs); mipmap generation is a compute pass in the
reference (impact_gpu/src/texture/mipmap.rs + shaders/mipmap.wgsl).

TPU redesign: a texture "array" is a dense ``[N, H, W, C]`` f32 array of
same-size layers plus a tuple of mip levels (each its own static-shape
array — XLA has no jagged arrays). Sampling is vectorized gathers over pixel
batches; wrap/filter modes are compile-time branches (samplers are tiny
static configs, not registry objects). The asset-fetching import pipeline is
out of scope (zero-egress environment); procedural generators below stand in
for fetched image files, matching the texture-set role of
``impact_voxel/src/voxel_types.rs:32-51`` (256-res per-voxel-type arrays).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# wrap modes (ref: impact_texture sampler configs / wgpu AddressMode)
WRAP_REPEAT = "repeat"
WRAP_CLAMP = "clamp"
WRAP_MIRROR = "mirror"


class SamplerConfig(NamedTuple):
    """Static sampling configuration (ref: SamplerRegistry entries)."""

    wrap: str = WRAP_REPEAT
    filter_linear: bool = True
    mip_linear: bool = True


class TextureArray(NamedTuple):
    """N same-size texture layers with a full mip chain.

    ``mips[0]`` is the base level ``[N, H, W, C]``; ``mips[l]`` halves H and W
    per level down to 1×1 (ref: mipmap.rs full-chain policy)."""

    mips: tuple  # tuple of f32[N, H>>l, W>>l, C]

    @property
    def n_layers(self) -> int:
        return self.mips[0].shape[0]

    @property
    def base_shape(self):
        return self.mips[0].shape[1:3]

    @property
    def n_levels(self) -> int:
        return len(self.mips)


def build_texture_array(layers, generate_mipmaps: bool = True) -> TextureArray:
    """Stack ``layers`` (list/array [N,H,W,C], H=W powers of two) into a
    texture array with a box-filtered mip chain (ref: mipmap.wgsl 2×2 box)."""
    base = jnp.asarray(layers, jnp.float32)
    assert base.ndim == 4, "expect [N,H,W,C]"
    mips = [base]
    if generate_mipmaps:
        cur = base
        while cur.shape[1] > 1 or cur.shape[2] > 1:
            n, h, w, c = cur.shape
            nh, nw = max(h // 2, 1), max(w // 2, 1)
            cur = cur[:, : nh * 2, : nw * 2, :].reshape(n, nh, min(h, 2), nw, min(w, 2), c)
            cur = jnp.mean(cur, axis=(2, 4))
            mips.append(cur)
    return TextureArray(mips=tuple(mips))


def _wrap_coords(x, size, mode: str):
    if mode == WRAP_REPEAT:
        return jnp.mod(x, size)
    if mode == WRAP_MIRROR:
        period = 2 * size
        m = jnp.mod(x, period)
        return jnp.where(m < size, m, period - 1 - m)
    return jnp.clip(x, 0, size - 1)  # clamp


def sample_level(level, layer, uv, sampler: SamplerConfig = SamplerConfig()):
    """Sample one mip level ``[N,H,W,C]`` at ``uv`` [...,2] for layers
    ``layer`` i32[...]. Returns [...,C]."""
    n, h, w, c = level.shape
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    if not sampler.filter_linear:
        iu = _wrap_coords(jnp.round(u).astype(jnp.int32), w, sampler.wrap)
        iv = _wrap_coords(jnp.round(v).astype(jnp.int32), h, sampler.wrap)
        return level[layer, iv, iu]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    def texel(du, dv):
        iu = _wrap_coords(u0 + du, w, sampler.wrap)
        iv = _wrap_coords(v0 + dv, h, sampler.wrap)
        return level[layer, iv, iu]

    top = texel(0, 0) * (1 - fu) + texel(1, 0) * fu
    bot = texel(0, 1) * (1 - fu) + texel(1, 1) * fu
    return top * (1 - fv) + bot * fv


def sample_texture_array(
    tex: TextureArray,
    layer,
    uv,
    lod=None,
    sampler: SamplerConfig = SamplerConfig(),
):
    """Trilinear (mip-interpolated) sample. ``lod`` is the mip level as f32
    [...]; None = base level. Returns [...,C]."""
    if lod is None or tex.n_levels == 1:
        return sample_level(tex.mips[0], layer, uv, sampler)
    lod = jnp.clip(lod, 0.0, tex.n_levels - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0)[..., None]
    # static unrolled select over mip levels (few levels, static shapes)
    out0 = sample_level(tex.mips[0], layer, uv, sampler)
    out1 = sample_level(tex.mips[min(1, tex.n_levels - 1)], layer, uv, sampler)
    acc0, acc1 = out0, out1
    for l in range(1, tex.n_levels):
        s0 = sample_level(tex.mips[l], layer, uv, sampler)
        s1 = sample_level(
            tex.mips[min(l + 1, tex.n_levels - 1)], layer, uv, sampler
        )
        m = (l0 == l)[..., None]
        acc0 = jnp.where(m, s0, acc0)
        acc1 = jnp.where(m, s1, acc1)
    if not sampler.mip_linear:
        return acc0
    return acc0 * (1 - f) + acc1 * f


def lod_from_scale(texels_per_pixel):
    """Mip level from the texel-footprint of one screen pixel (the analog of
    hardware derivative-based LOD selection)."""
    return jnp.log2(jnp.maximum(texels_per_pixel, 1e-6))


# --- triplanar projection -------------------------------------------------------
# Voxel surfaces have no UV atlas; the reference's voxel geometry shader
# projects its per-type texture arrays along the dominant axes and blends by
# the normal (impact_voxel/shaders/rendering/voxel_geometry.template.wgsl).


def triplanar_weights(normal, sharpness: float = 4.0):
    """[...,3] blend weights for the x/y/z projections."""
    w = jnp.abs(normal) ** sharpness
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)


def sample_triplanar(
    tex: TextureArray,
    layer,
    world_pos,
    normal,
    scale: float = 1.0,
    lod=None,
    sampler: SamplerConfig = SamplerConfig(),
):
    """Triplanar-blended texture sample at world positions [...,3]."""
    wts = triplanar_weights(normal)
    uv_x = world_pos[..., (1, 2)] * scale
    uv_y = world_pos[..., (0, 2)] * scale
    uv_z = world_pos[..., (0, 1)] * scale
    sx = sample_texture_array(tex, layer, uv_x, lod, sampler)
    sy = sample_texture_array(tex, layer, uv_y, lod, sampler)
    sz = sample_texture_array(tex, layer, uv_z, lod, sampler)
    return (
        sx * wts[..., 0:1] + sy * wts[..., 1:2] + sz * wts[..., 2:3]
    )


def triplanar_normal(
    tex: TextureArray,
    layer,
    world_pos,
    normal,
    strength: float = 1.0,
    scale: float = 1.0,
    lod=None,
    sampler: SamplerConfig = SamplerConfig(),
):
    """Normal-mapped surface normal via triplanar tangent-space perturbation
    (whiteout blend). ``tex`` holds tangent-space normal maps in [0,1]
    (ref: impact_material NormalMap variants, setup/physical.rs:141-166)."""
    tn = sample_triplanar(tex, layer, world_pos, normal, scale, lod, sampler)
    tn = tn * 2.0 - 1.0  # [-1,1] tangent-space normal
    wts = triplanar_weights(normal)
    # whiteout blend: swizzle the tangent normal into each projection plane
    n_x = jnp.stack([normal[..., 0], tn[..., 0] * strength, tn[..., 1] * strength], -1)
    n_y = jnp.stack([tn[..., 0] * strength, normal[..., 1], tn[..., 1] * strength], -1)
    n_z = jnp.stack([tn[..., 0] * strength, tn[..., 1] * strength, normal[..., 2]], -1)
    out = n_x * wts[..., 0:1] + n_y * wts[..., 1:2] + n_z * wts[..., 2:3]
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)


def parallax_offset_uv(height_tex: TextureArray, layer, uv, view_dir_tangent,
                       height_scale: float = 0.05,
                       sampler: SamplerConfig = SamplerConfig()):
    """Single-step parallax mapping UV offset (ref: ParallaxMap variant,
    setup/physical.rs:168-214 — the reference does occlusion stepping in the
    shader; one offset step is the common approximation)."""
    h = sample_level(height_tex.mips[0], layer, uv, sampler)[..., 0]
    offs = view_dir_tangent[..., :2] / jnp.maximum(
        view_dir_tangent[..., 2:3][..., 0], 0.2
    )[..., None] * (h * height_scale)[..., None]
    return uv - offs


# --- lookup tables --------------------------------------------------------------


class LookupTable(NamedTuple):
    """Precomputed N-D table sampled with linear interpolation
    (ref: impact_texture/src/lookup_table.rs; the BRDF specular LUTs in
    impact_rendering/src/brdf.rs:10-26 are instances)."""

    values: jnp.ndarray  # f32[..., C]

    def sample(self, coords):
        """coords [...,D] in [0,1]^D → [...,C] multilinear interpolation."""
        dims = self.values.shape[:-1]
        d = len(dims)
        x = [coords[..., i] * (dims[i] - 1) for i in range(d)]
        i0 = [jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, dims[i] - 1)
              for i, xi in enumerate(x)]
        i1 = [jnp.clip(i + 1, 0, dims[k] - 1) for k, i in enumerate(i0)]
        f = [jnp.clip(xi - ii, 0.0, 1.0)[..., None] for xi, ii in zip(x, i0)]
        out = 0.0
        for corner in range(1 << d):
            idx = tuple(
                i1[k] if corner >> k & 1 else i0[k] for k in range(d)
            )
            w = 1.0
            for k in range(d):
                w = w * (f[k] if corner >> k & 1 else 1.0 - f[k])
            out = out + self.values[idx] * w
        return out


# --- procedural sources ---------------------------------------------------------
# Stand-ins for the reference's fetched image assets (asset_fetcher is N/A in
# a zero-egress environment). Deterministic, seeded, power-of-two sizes.


def checkerboard(size: int = 256, tiles: int = 8, color_a=(0.9, 0.9, 0.9),
                 color_b=(0.2, 0.2, 0.2)):
    ij = np.indices((size, size)) * tiles // size
    sel = (ij[0] + ij[1]) % 2
    a = np.asarray(color_a, np.float32)
    b = np.asarray(color_b, np.float32)
    return np.where(sel[..., None] == 0, a, b).astype(np.float32)


def value_noise(size: int = 256, cells: int = 16, seed: int = 0, channels: int = 1):
    """Bilinear-interpolated value noise, tileable."""
    rng = np.random.default_rng(seed)
    lattice = rng.uniform(0.0, 1.0, (cells, cells, channels)).astype(np.float32)
    ys = np.linspace(0, cells, size, endpoint=False)
    xs = np.linspace(0, cells, size, endpoint=False)
    y0 = np.floor(ys).astype(int) % cells
    x0 = np.floor(xs).astype(int) % cells
    fy = (ys - np.floor(ys))[:, None, None]
    fx = (xs - np.floor(xs))[None, :, None]
    y1 = (y0 + 1) % cells
    x1 = (x0 + 1) % cells
    c00 = lattice[y0][:, x0]
    c01 = lattice[y0][:, x1]
    c10 = lattice[y1][:, x0]
    c11 = lattice[y1][:, x1]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def noise_normal_map(size: int = 256, cells: int = 16, seed: int = 0,
                     strength: float = 2.0):
    """Tangent-space normal map derived from a value-noise height field."""
    h = value_noise(size, cells, seed)[..., 0]
    dx = (np.roll(h, -1, axis=1) - np.roll(h, 1, axis=1)) * 0.5 * size / cells
    dy = (np.roll(h, -1, axis=0) - np.roll(h, 1, axis=0)) * 0.5 * size / cells
    n = np.stack([-dx * strength, -dy * strength, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return ((n + 1.0) * 0.5).astype(np.float32)


class VoxelTextureSet(NamedTuple):
    """Texture arrays consumed by the shading pass: one layer per voxel type
    (ref: VoxelMaterialGPUResources texture arrays, gpu_resource.rs) followed
    by one layer per textured mesh entity (ref: impact_material
    setup/physical.rs Textured*/NormalMap/ParallaxMap components).

    ``props`` (optional) carries per-layer PBR property textures, channels
    [roughness, metalness, specular, emissive, height, 0, 0, 0] — entity
    scale_factors are baked in at layer build. ``full_pbr`` (f32[L]) flags
    layers whose props channels REPLACE the G-buffer values (textured
    entities); voxel-type layers keep the albedo/normal-only behavior."""

    albedo: TextureArray
    normal: TextureArray
    props: TextureArray | None = None
    full_pbr: jnp.ndarray | None = None  # f32[L]


def _resize_nearest(arr, size: int):
    """Nearest-neighbor resize [H,W,C] → [size,size,C] (procedural/entity
    layer normalization; image imports resize properly in load_image_layer)."""
    h, w = arr.shape[:2]
    yi = (np.arange(size) * h // size).astype(np.int64)
    xi = (np.arange(size) * w // size).astype(np.int64)
    return arr[yi][:, xi]


def build_entity_material_layer(
    size: int,
    color=None,  # [S,S,3] texture or (3,) uniform
    normal=None,  # [S,S,3] tangent-space map in [0,1] or None (flat)
    roughness=1.0,  # [S,S] texture (scale baked) or scalar
    metalness=0.0,
    specular=0.0,
    emissive=0.0,
    height=None,  # [S,S] height map with displacement scale baked, or None
):
    """Compose one textured-entity layer (albedo, normal, props[8]) from a
    mix of textures and uniform fallbacks — the lowering target of the
    Textured*/NormalMap/ParallaxMap setup components (setup/physical.rs:
    each property is independently uniform or textured)."""

    def chan(v):
        if v is None:
            return np.zeros((size, size), np.float32)
        v = np.asarray(v, np.float32)
        if v.ndim == 0:
            return np.full((size, size), float(v), np.float32)
        if v.ndim == 3:
            v = v[..., 0]
        if v.shape != (size, size):
            v = _resize_nearest(v[..., None], size)[..., 0]
        return v.astype(np.float32)

    if color is None:
        color = np.ones(3, np.float32)
    color = np.asarray(color, np.float32)
    if color.ndim == 1:
        albedo = np.broadcast_to(color, (size, size, 3)).astype(np.float32)
    else:
        albedo = _resize_nearest(color, size) if color.shape[:2] != (size, size) else color
    if normal is None:
        nrm = np.broadcast_to(
            np.asarray([0.5, 0.5, 1.0], np.float32), (size, size, 3)
        ).astype(np.float32)
    else:
        normal = np.asarray(normal, np.float32)
        nrm = _resize_nearest(normal, size) if normal.shape[:2] != (size, size) else normal
    props = np.stack(
        [
            chan(roughness), chan(metalness), chan(specular), chan(emissive),
            chan(height),
            np.zeros((size, size), np.float32),
            np.zeros((size, size), np.float32),
            np.zeros((size, size), np.float32),
        ],
        axis=-1,
    )
    return albedo, nrm, props


def build_scene_texture_set(
    n_voxel_types: int,
    entity_layers,
    size: int = 64,
    include_voxel_layers: bool = True,
) -> VoxelTextureSet:
    """Compose the scene texture set: voxel-type layers (optional) followed
    by textured-entity layers. ``entity_layers`` is a list of
    (albedo, normal, props) triples from build_entity_material_layer."""
    albedos, normals, props_l, full = [], [], [], []
    if include_voxel_layers and n_voxel_types > 0:
        va, vn = default_voxel_texture_arrays(n_voxel_types, size)
        for t in range(n_voxel_types):
            albedos.append(np.asarray(va.mips[0][t]))
            normals.append(np.asarray(vn.mips[0][t]))
            props_l.append(np.zeros((size, size, 8), np.float32))
            full.append(0.0)
    for alb, nrm, pr in entity_layers:
        albedos.append(alb)
        normals.append(nrm)
        props_l.append(pr)
        full.append(1.0)
    need_props = any(f > 0 for f in full)
    return VoxelTextureSet(
        albedo=build_texture_array(np.stack(albedos)),
        normal=build_texture_array(np.stack(normals)),
        props=build_texture_array(np.stack(props_l)) if need_props else None,
        full_pbr=jnp.asarray(full, jnp.float32) if need_props else None,
    )


def default_voxel_texture_arrays(n_types: int, size: int = 64):
    """Per-voxel-type albedo + normal-map arrays (the analog of the 256-res
    arrays VoxelTypeRegistry builds from its texture sets, voxel_types.rs)."""
    albedos = []
    normals = []
    palettes = [
        ((0.5, 0.42, 0.35), (0.38, 0.32, 0.27)),
        ((0.72, 0.72, 0.75), (0.6, 0.6, 0.64)),
        ((0.72, 0.86, 0.95), (0.62, 0.78, 0.9)),
    ]
    for t in range(n_types):
        hi, lo = palettes[t % len(palettes)]
        noise = value_noise(size, 8 + 4 * t, seed=11 + t)[..., 0][..., None]
        albedo = np.asarray(lo, np.float32) + (
            np.asarray(hi, np.float32) - np.asarray(lo, np.float32)
        ) * noise
        albedos.append(albedo)
        normals.append(noise_normal_map(size, 8 + 2 * t, seed=101 + t))
    return (
        build_texture_array(np.stack(albedos)),
        build_texture_array(np.stack(normals)),
    )


# --- image-file import (ref: impact_texture/src/import.rs) ----------------------


def load_image_layer(
    path_or_bytes, resolution: int | None = None, srgb: bool = True
):
    """Decode one PNG/JPEG image into a float [H,W,3] layer in linear color
    (ref: import.rs:174 load_image_texture + processing.rs sRGB handling).
    ``resolution`` resizes (Lanczos-filtered via PIL, applied AFTER
    linearization — filtering sRGB-encoded values would darken edges) so
    layers can stack into an array; power-of-two sizes keep the mip chain
    exact."""
    from ..utils.image import load_image

    arr = load_image(path_or_bytes, mode="RGB").astype(np.float32) / 255.0
    if srgb:  # decode sRGB → linear for shading (processing.rs)
        arr = np.where(
            arr <= 0.04045, arr / 12.92, ((arr + 0.055) / 1.055) ** 2.4
        ).astype(np.float32)
    if resolution is not None and arr.shape[:2] != (resolution, resolution):
        from PIL import Image

        chans = [
            np.asarray(
                Image.fromarray(arr[..., c], mode="F").resize(
                    (resolution, resolution), Image.LANCZOS
                ),
                np.float32,
            )
            for c in range(arr.shape[-1])
        ]
        # Lanczos can ring slightly negative on hard edges; keep linear
        # radiance non-negative
        arr = np.clip(np.stack(chans, axis=-1), 0.0, None)
    return arr


def texture_array_from_images(
    sources, resolution: int = 256, srgb: bool = True,
    generate_mipmaps: bool = True,
) -> TextureArray:
    """Load declared image textures (paths or raw bytes) into one mipmapped
    texture array — the import pipeline analog of
    import.rs:120 load_declared_image_textures. All layers are resized to
    ``resolution`` (the reference instead requires equal dimensions and
    fails; resizing suits fixed-shape TPU texture arrays)."""
    if not sources:
        raise ValueError("empty list of sources for texture array")
    layers = np.stack(
        [load_image_layer(s, resolution, srgb) for s in sources]
    )
    return build_texture_array(layers, generate_mipmaps)
