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
import numpy as np

from ..geometry.projection import view_z_from_depth
from ..math.random import splitmix64_sequence

# --- ambient occlusion (ref: ambient_occlusion.rs + shaders) --------------------


def _ao_sample_offsets_unused(sample_count: int, radius: float):
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
    view_pos,  # f32[H,W,3] view-space positions (-z in front of the camera)
    view_normal,  # f32[H,W,3] view-space normals
    valid,  # bool[H,W]
    vertical_fov,  # camera vertical field of view (radians)
    sample_count: int = 4,
    sample_radius: float = 1.0,
    intensity: float = 2.0,
    contrast: float = 0.75,
    frame_counter: int = 0,
):
    """Alchemy screen-space ambient obscurance (McGuire et al. 2011), matching
    the reference exactly (ambient_occlusion_computation.template.wgsl:85-140 +
    ambient_occlusion.rs:229-254): horizontal Halton disc offsets rotated by
    interleaved-gradient-noise angles, projected with the camera projection;
    occlusion = (1 - (2·intensity/(π·N))·Σ max(0, d·n + bias)/|d|²)^contrast.
    Returns occlusion factor [H,W] in [0,1], 1 = unoccluded."""
    h, w = valid.shape

    # Halton(2)/Halton(3) uniform disc samples (ambient_occlusion.rs:236-252)
    def _halton(base, n):
        out = np.zeros(n)
        for i in range(n):
            f, r, idx = 1.0, 0.0, i + 1
            while idx > 0:
                f /= base
                r += f * (idx % base)
                idx //= base
            out[i] = r
        return out

    rad = sample_radius * np.sqrt(_halton(2, sample_count))
    ang = 2.0 * np.pi * _halton(3, sample_count)
    offs = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=-1)
    offs = jnp.asarray(offs, jnp.float32)  # [N,2]

    # per-pixel random rotation (interleaved gradient noise, the reference's
    # generateRandomAngle with frameCounter time offset)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5 + float(frame_counter % 8)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    noise = jnp.mod(
        52.9829189 * jnp.mod(0.06711056 * xs + 0.00583715 * ys, 1.0), 1.0
    )
    theta = 2.0 * jnp.pi * noise
    c, sn = jnp.cos(theta), jnp.sin(theta)

    fpx = (0.5 * h) / jnp.tan(0.5 * vertical_fov)  # focal length in pixels
    z = view_pos[..., 2]
    inv_neg_z = 1.0 / jnp.maximum(-z, 1e-6)
    # occluder positions looked up per sample; invalid pixels recede to -inf
    far = jnp.array([0.0, 0.0, -1e8], jnp.float32)
    occluder_buf = jnp.where(valid[..., None], view_pos, far)

    bias = 1e-4 * z  # biasDistance (z is negative)
    occluder_flat = occluder_buf.reshape(h * w, 3)
    total = jnp.zeros((h, w), jnp.float32)
    for si in range(sample_count):
        ox = offs[si, 0] * c - offs[si, 1] * sn
        oy = offs[si, 0] * sn + offs[si, 1] * c
        sx = view_pos[..., 0] + ox
        sy = view_pos[..., 1] + oy
        # project (sx, sy, z) with the camera projection to pixel coords
        u = 0.5 * w + sx * fpx * inv_neg_z
        v = 0.5 * h - sy * fpx * inv_neg_z
        ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
        occluder = occluder_flat[(vi * w + ui).reshape(-1)].reshape(h, w, 3)
        d = occluder - view_pos
        d_n = jnp.sum(d * view_normal, axis=-1)
        d2 = jnp.sum(d * d, axis=-1)
        total = total + jnp.maximum(0.0, d_n + bias) / (d2 + 1e-4)

    norm = 2.0 * intensity / (np.pi * sample_count)
    ao = jnp.maximum(0.0, 1.0 - norm * total) ** contrast
    ao = jnp.where(valid, ao, 1.0)
    # 3x3 box blur (ref: AO blur pass)
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
    # flat 1D-index gather: ~30% cheaper than the [vi,ui] 2D form on TPU
    hist = history.reshape(h * w, 3)[(vi * w + ui).reshape(-1)].reshape(
        h, w, 3
    )

    # 3×3 neighborhood statistics of the current frame — SEPARABLE row+column
    # sums (6 image passes) instead of a 9-plane stack reduced twice
    # (~18 passes over the full image)
    def _sum3(img):
        p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        rows = p[:-2] + p[1:-1] + p[2:]
        return rows[:, :-2] + rows[:, 1:-1] + rows[:, 2:]

    # one-pass moments: E[x²] − E[x]² underestimates σ when σ/µ < ~3e-4 in
    # f32, but at that contrast the clip interval is visually degenerate
    # anyway (history ≈ µ); the clamp keeps it non-negative
    sx = _sum3(current) * (1.0 / 9.0)
    sxx = _sum3(current * current) * (1.0 / 9.0)
    mu = sx
    sigma = jnp.sqrt(jnp.maximum(sxx - sx * sx, 0.0))
    lo = mu - variance_clipping_threshold * sigma
    hi = mu + variance_clipping_threshold * sigma
    hist_clipped = jnp.clip(hist, lo, hi)

    return current_frame_weight * current + (1.0 - current_frame_weight) * hist_clipped


# --- bloom (ref: bloom.rs N-level downsample/upsample-blur chain) ---------------


def _avg2x2(img):
    h, w, c = img.shape
    if h % 2 or w % 2:  # pad odd dims (edge) so halving always works
        img = jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        h, w = h + h % 2, w + w % 2
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def _int_shift(img, d, axis):
    """Shift by integer d pixels along axis (edge clamp)."""
    if d == 0:
        return img
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = (max(d, 0), max(-d, 0))
    sl = [slice(None)] * img.ndim
    sl[axis] = slice(max(-d, 0), max(-d, 0) + n)
    return jnp.pad(img, pad, mode="edge")[tuple(sl)]


def _frac_shift(img, d, axis):
    """Shift by float d pixels along axis (bilinear between integer shifts)."""
    lo = int(np.floor(d))
    f = d - lo
    a = _int_shift(img, lo, axis)
    if f == 0.0:
        return a
    return a * (1.0 - f) + _int_shift(img, lo + 1, axis) * f


# the 13-tap bloom downsample (bloom_downsampling.template.wgsl) is linear and
# shift-invariant on the 2x grid: each bilinear tap is a 2x2 average at an
# integer offset, so the whole filter collapses to ONE 6x6 stride-2 kernel
# (derived by impulse response from the tap formulation; rows sum to 1).
# As 13 pad/shift/strided-reshape averages it measured 63 ms @1080p on the
# v5e (devtools/probe_image_ops.py) — as a conv it rides the conv units.
_DOWN13_KERNEL = np.array(
    [
        [1, 1, 2, 2, 1, 1],
        [1, 5, 6, 6, 5, 1],
        [2, 6, 8, 8, 6, 2],
        [2, 6, 8, 8, 6, 2],
        [1, 5, 6, 6, 5, 1],
        [1, 1, 2, 2, 1, 1],
    ],
    np.float32,
) / 128.0


def _downsample13(img):
    """The reference's 13-tap downsampling filter as a 6x6 stride-2 conv
    (exact on even extents; odd extents differ from the tap-sequence form
    only in the final edge-clamped output row/column)."""
    h, w, c = img.shape
    if h % 2 or w % 2:
        img = jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    p = jnp.pad(img, ((2, 2), (2, 2), (0, 0)), mode="edge")
    x = jnp.transpose(p, (2, 0, 1))[:, None]  # channels as conv batch
    k = jnp.asarray(_DOWN13_KERNEL)[None, None]
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return jnp.transpose(y[:, 0], (1, 2, 0))


def _tent_blur(img, r):
    """Separable 3x3 tent filter at (fractional) pixel radius r
    (bloom_upsampling_blur.template.wgsl's 9-tap tent at uv radius R)."""
    def blur_axis(x, axis):
        return 0.5 * x + 0.25 * (
            _frac_shift(x, r, axis) + _frac_shift(x, -r, axis)
        )

    return blur_axis(blur_axis(img, 0), 1)


def _bilinear_up2(img):
    """2x bilinear upsample with wgpu half-pixel sample alignment: output
    texel 2i samples input at i-0.25, texel 2i+1 at i+0.25 (edge clamp)."""
    h, w, c = img.shape
    p = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    rows = jnp.stack(
        [0.75 * p[1 : h + 1] + 0.25 * p[0:h],
         0.75 * p[1 : h + 1] + 0.25 * p[2 : h + 2]],
        axis=1,
    ).reshape(2 * h, w, c)
    p = jnp.pad(rows, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return jnp.stack(
        [0.75 * p[:, 1 : w + 1] + 0.25 * p[:, 0:w],
         0.75 * p[:, 1 : w + 1] + 0.25 * p[:, 2 : w + 2]],
        axis=2,
    ).reshape(2 * h, 2 * w, c)


# --- NCHW conv forms of the bloom ops -------------------------------------
# The tap-sequence forms above are the readable reference; the bloom chain
# runs them as convolutions in channels-as-batch [3,1,H,W] layout (one
# transpose in, one out). The tap forms as pad/shift/strided-reshape programs
# measured 63 ms for ONE 1080p downsample on the v5e; the conv forms ride the
# conv units (devtools/probe_image_ops.py).


def _down13_nchw(x):
    """6x6 stride-2 conv form of _downsample13 on [B,1,H,W]."""
    b, _, h, w = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2)), mode="edge"
        )
    p = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)), mode="edge")
    k = jnp.asarray(_DOWN13_KERNEL)[None, None]
    return jax.lax.conv_general_dilated(
        p, k, (2, 2), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )


def _up2_nchw(x):
    """2x bilinear upsample (wgpu half-pixel alignment) as a separable
    lhs-dilated conv — exact match of _bilinear_up2."""
    p = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    k = jnp.asarray([0.25, 0.75, 0.75, 0.25], jnp.float32)
    y = jax.lax.conv_general_dilated(
        p, k[None, None, :, None], (1, 1), [(0, 0), (0, 0)],
        lhs_dilation=(2, 1), dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jax.lax.conv_general_dilated(
        y, k[None, None, None, :], (1, 1), [(0, 0), (0, 0)],
        lhs_dilation=(1, 2), dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _tent_kernel(r: float) -> np.ndarray:
    """1D impulse response of the fractional-radius tent blur axis pass."""
    import math

    reach = int(math.ceil(abs(r))) + 1
    w = np.zeros(2 * reach + 1, np.float32)
    w[reach] += 0.5
    for d in (r, -r):
        lo = int(math.floor(d))
        f = d - lo
        w[reach + lo] += 0.25 * (1.0 - f)
        w[reach + lo + 1] += 0.25 * f
    return w


def _tent_nchw(x, r: float):
    """Separable tent blur at static fractional radius r, conv form."""
    k = _tent_kernel(float(r))
    reach = (len(k) - 1) // 2
    p = jnp.pad(
        x, ((0, 0), (0, 0), (reach, reach), (reach, reach)), mode="edge"
    )
    kj = jnp.asarray(k)
    y = jax.lax.conv_general_dilated(
        p, kj[None, None, :, None], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jax.lax.conv_general_dilated(
        y, kj[None, None, None, :], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def bloom(
    luminance,
    n_downsamplings: int = 4,
    blur_filter_radius: float = 0.005,
    blurred_luminance_weight: float = 0.04,
):
    """The reference's bloom chain (bloom.rs:108-140 + shader templates):
    13-tap progressive downsample to mip N, then tent-blurred bilinear
    upsamples ADDED into each downsampled mip back up to mip 1; the final
    blend samples the mip-1 accumulation bilinearly at full res with
    normalization 1/N and the configured blurred weight.

    ``blur_filter_radius`` is in uv units of each upsample's INPUT mip
    (the shader's R in texture coordinates). Runs entirely as convs in
    channels-as-batch NCHW layout."""
    h, w0, _ = luminance.shape
    x = jnp.transpose(luminance, (2, 0, 1))[:, None]  # [3,1,H,W]
    levels = [x]
    for _ in range(n_downsamplings):
        x = _down13_nchw(x)
        levels.append(x)
    acc = levels[n_downsamplings]
    for i in range(n_downsamplings - 1, 0, -1):  # stop at mip 1 (bloom.rs:110)
        th, tw = levels[i].shape[2], levels[i].shape[3]
        r_px = blur_filter_radius * acc.shape[3]
        acc = (
            _up2_nchw(_tent_nchw(acc, r_px))[:, :, :th, :tw] + levels[i]
        )
    blurred = _up2_nchw(acc)[:, :, :h, :w0] / n_downsamplings
    w = blurred_luminance_weight
    return (1.0 - w) * luminance + w * jnp.transpose(blurred[:, 0], (1, 2, 0))


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
    """Saturation Based Sensitivity auto exposure (ref: capturing.rs:142-168):
    EV100 = log2(100·avg/K), max_lum = (78/(100·q))·2^(EV100 − comp),
    exposure = 1/max_lum, clamped to the configured bounds; K = 12.5,
    q = 0.65 (capturing.rs:108-111)."""
    max_lum = (78.0 / 65.0) * (100.0 / 12.5) * jnp.maximum(avg_lum, 1e-9)         * jnp.exp2(-ev_compensation)
    return jnp.clip(1.0 / max_lum, lower, upper)


def manual_exposure(relative_aperture=4.0, shutter_duration=0.005, iso=100.0,
                    lower=1e-6, upper=1e-2):
    """Manual-ISO exposure (ref: capturing.rs Manual{iso} path):
    EV100 = log2(N²·100/(t·ISO)), exposure = 1/((78/(100·0.65))·2^EV100)
    = t·ISO/(120·N²)."""
    e = shutter_duration * iso / (120.0 * relative_aperture ** 2)
    return float(np.clip(e, lower, upper))


# --- tone mapping (ref: dynamic_range_compression.rs None/ACES/KhronosPBRNeutral)


def tonemap_aces(x):
    """ACES filmic fit (Narkowicz) with the reference's 0.6 pre-exposure
    (ref: dynamic_range_compression.template.wgsl:22-31 `color *= 0.6`)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = x * 0.6
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap_khronos_pbr_neutral(color):
    """Khronos PBR Neutral tone mapper (spec-faithful implementation)."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    x = jnp.min(color, axis=-1, keepdims=True)
    # NOTE: the reference's WGSL `select(x - 6.25x², 0.04, x < 0.08)` takes
    # 0.04 when x < 0.08 — inverted from the published Khronos operator — and
    # parity means matching the reference's actual output
    # (dynamic_range_compression.template.wgsl:34-41)
    offset = jnp.where(x < 0.08, 0.04, x - 6.25 * x * x)
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
