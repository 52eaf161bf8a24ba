"""Postprocessing chain: AO, TAA, bloom, auto-exposure, tone mapping.

Ref: impact_rendering/src/postprocessing.rs:74-80 — ordered passes: ambient
occlusion (sample-kernel AO + blur), temporal anti-aliasing (variance-clipped
history blend, temporal_anti_aliasing.template.wgsl), capturing camera
(physical exposure from aperture/shutter/ISO, capturing.rs; average-luminance
auto exposure, average_luminance.rs; bloom downsample/upsample chain,
bloom.rs; dynamic-range compression None/ACES/KhronosPBRNeutral + gamma,
dynamic_range_compression.rs).

Every pass is pure image math — ideal fusion fodder for XLA; the whole chain
stays resident in HBM between the G-buffer and the final u8 frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projection import view_z_from_depth
from ..math.random import splitmix64_sequence

# --- ambient occlusion (ref: ambient_occlusion.rs + shaders) --------------------


def _ao_sample_offsets(sample_count: int, radius: float):
    """Deterministic hemisphere sample kernel (host-side, splitmix-seeded —
    the reference generates its sample kernel on the CPU too)."""
    import numpy as np

    bits = splitmix64_sequence(1234, sample_count * 3)
    u = (bits.reshape(sample_count, 3) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    phi = 2 * np.pi * u[:, 0]
    cos_t = u[:, 1]
    sin_t = np.sqrt(1 - cos_t**2)
    r = radius * (0.3 + 0.7 * u[:, 2] ** 2)
    pts = np.stack(
        [r * sin_t * np.cos(phi), r * sin_t * np.sin(phi), r * cos_t], axis=-1
    )
    return jnp.asarray(pts, jnp.float32)


def ambient_occlusion(
    view_pos,  # f32[H,W,3] view-space positions
    view_normal,  # f32[H,W,3] view-space normals
    valid,  # bool[H,W]
    sample_count: int = 4,
    sample_radius: float = 1.0,
    intensity: float = 2.0,
    contrast: float = 0.75,
):
    """SSAO against the view-space depth field (ref config:
    rendering.ambient_occlusion sample_count/sample_radius/intensity/contrast).
    Returns occlusion factor [H,W] in (0,1], 1 = unoccluded."""
    h, w = valid.shape
    offsets = _ao_sample_offsets(sample_count, sample_radius)

    # build a tangent frame per pixel
    n = view_normal
    up = jnp.where(
        jnp.abs(n[..., 2:3]) < 0.9,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t = jnp.cross(up, n)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(n, t)

    occ = jnp.zeros((h, w), jnp.float32)
    z_buffer = view_pos[..., 2]  # negative in front of camera
    for s in range(sample_count):
        o = offsets[s]
        sample = view_pos + t * o[0] + b * o[1] + n * o[2]
        # project sample to pixel coordinates: assume same projection as the
        # buffer; approximate by nearest pixel of the sample's screen position.
        # screen x = (x/-z)*fx + cx — we reconstruct fx from the buffer extents
        # by local differencing: use the view_pos grid itself as the mapping.
        # Simpler robust approach: compare against depth at the *current*
        # pixel's neighborhood by scaled offsets in pixels.
        px_scale = 0.5 * h / jnp.maximum(-view_pos[..., 2], 1e-3)
        du = o[0] * px_scale
        dv = -o[1] * px_scale
        ui = jnp.clip(
            (jnp.arange(w)[None, :] + du).astype(jnp.int32), 0, w - 1
        )
        vi = jnp.clip(
            (jnp.arange(h)[:, None] + dv).astype(jnp.int32), 0, h - 1
        )
        neighbor_z = z_buffer[vi, ui]
        sample_z = sample[..., 2]
        # occluded if the depth buffer is in front of the sample point
        range_check = jnp.abs(neighbor_z - z_buffer) < sample_radius
        occ = occ + ((neighbor_z > sample_z + 0.02) & range_check)

    occ = occ / sample_count
    ao = jnp.clip(1.0 - intensity * occ, 0.0, 1.0) ** contrast
    ao = jnp.where(valid, ao, 1.0)
    # 3×3 box blur (ref: AO blur pass)
    k = jnp.ones((3, 3), jnp.float32) / 9.0
    ao = jax.scipy.signal.convolve2d(ao, k, mode="same")
    return ao


# --- temporal anti-aliasing (ref: temporal_anti_aliasing.template.wgsl) --------


def temporal_anti_aliasing(
    current,  # f32[H,W,3] current luminance
    history,  # f32[H,W,3] previous blended luminance
    motion,  # f32[H,W,2] screen-space motion (uv units, current←previous)
    current_frame_weight: float = 0.1,
    variance_clipping_threshold: float = 1.0,
):
    """Variance-clipped history blend."""
    h, w, _ = current.shape
    # reproject history by motion vectors (nearest sampling)
    u = jnp.arange(w)[None, :] + motion[..., 0] * w
    v = jnp.arange(h)[:, None] + motion[..., 1] * h
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
    hist = history[vi, ui]

    # 3×3 neighborhood statistics of the current frame
    pads = jnp.pad(current, ((1, 1), (1, 1), (0, 0)), mode="edge")
    neigh = jnp.stack(
        [pads[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        axis=0,
    )
    mu = jnp.mean(neigh, axis=0)
    sigma = jnp.std(neigh, axis=0)
    lo = mu - variance_clipping_threshold * sigma
    hi = mu + variance_clipping_threshold * sigma
    hist_clipped = jnp.clip(hist, lo, hi)

    return current_frame_weight * current + (1.0 - current_frame_weight) * hist_clipped


# --- bloom (ref: bloom.rs N-level downsample/upsample-blur chain) ---------------


def _downsample2(img):
    h, w, c = img.shape
    if h % 2 or w % 2:  # pad odd dims (edge) so halving always works
        img = jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        h, w = h + h % 2, w + w % 2
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def _upsample2(img):
    return jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)


def _blur3(img):
    k = jnp.array([0.25, 0.5, 0.25], jnp.float32)
    img = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    img = (
        img[:-2] * k[0] + img[1:-1] * k[1] + img[2:] * k[2]
    )
    img = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return img[:, :-2] * k[0] + img[:, 1:-1] * k[1] + img[:, 2:] * k[2]


def bloom(luminance, n_downsamplings: int = 4, blurred_luminance_weight: float = 0.04):
    """Physically-meaningless-but-pretty bloom: progressive downsample, then
    blurred upsample accumulation, blended with the source
    (ref: bloom.rs:594 downsample/upsample-blur chain + blending)."""
    levels = [luminance]
    img = luminance
    for _ in range(n_downsamplings):
        img = _downsample2(img)
        levels.append(img)
    # upsample back, blurring and accumulating (crop to each level's true size)
    acc = levels[-1]
    for i in range(n_downsamplings - 1, -1, -1):
        th, tw, _ = levels[i].shape
        acc = _blur3(_upsample2(acc)[:th, :tw]) + levels[i]
    acc = acc / (n_downsamplings + 1)
    return (
        1.0 - blurred_luminance_weight
    ) * luminance + blurred_luminance_weight * acc


# --- exposure (ref: capturing.rs + average_luminance.rs) ------------------------


def compute_luminance(rgb):
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )


def average_luminance(luminance_rgb, lower=100.0, upper=1e7):
    """Geometric-mean luminance within bounds (histogram-equivalent,
    ref: average_luminance.rs luminance_bounds)."""
    lum = compute_luminance(luminance_rgb)
    in_range = (lum >= lower) & (lum <= upper)
    log_lum = jnp.where(in_range, jnp.log(jnp.maximum(lum, 1e-12)), 0.0)
    count = jnp.maximum(jnp.sum(in_range), 1)
    return jnp.exp(jnp.sum(log_lum) / count)


def exposure_from_average_luminance(avg_lum, ev_compensation=0.0, lower=1e-6, upper=1e-2):
    """Saturation-based auto exposure: E = 0.18·2^EV / avg_lum, clamped to the
    configured exposure bounds (ref: capturing.rs SensitivityAuto +
    exposure_bounds)."""
    exposure = 0.18 * jnp.exp2(ev_compensation) / jnp.maximum(avg_lum, 1e-9)
    return jnp.clip(exposure, lower, upper)


# --- tone mapping (ref: dynamic_range_compression.rs None/ACES/KhronosPBRNeutral)


def tonemap_aces(x):
    """ACES filmic fit (Narkowicz)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap_khronos_pbr_neutral(color):
    """Khronos PBR Neutral tone mapper (spec-faithful implementation)."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    x = jnp.min(color, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    color = color - offset
    peak = jnp.max(color, axis=-1, keepdims=True)
    new_peak = 1.0 - (1.0 - start_compression) ** 2 / jnp.maximum(
        peak + 1.0 - 2.0 * start_compression, 1e-6
    )
    scaled = color * (new_peak / jnp.maximum(peak, 1e-6))
    g = 1.0 / (desaturation * (peak - new_peak) + 1.0)
    compressed = jnp.where(
        peak < start_compression, color, g * scaled + (1.0 - g) * new_peak
    )
    return jnp.clip(compressed, 0.0, 1.0)


def tonemap(color, method: str = "ACES"):
    if method in ("None", None, "none"):
        return jnp.clip(color, 0.0, 1.0)
    if method == "ACES":
        return tonemap_aces(color)
    if method == "KhronosPBRNeutral":
        return tonemap_khronos_pbr_neutral(color)
    raise ValueError(f"unknown tone mapping method {method!r}")


def to_srgb(linear):
    """Linear → sRGB transfer."""
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.maximum(linear, 1e-12) ** (1.0 / 2.4) - 0.055,
    )


def to_u8(ldr):
    return jnp.clip(jnp.round(ldr * 255.0), 0, 255).astype(jnp.uint8)
