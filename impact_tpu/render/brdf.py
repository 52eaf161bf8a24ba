"""Microfacet BRDF evaluation (GGX).

Ref: impact_rendering/src/brdf.rs:10-26 — GGX microfacet specular with
offline-computed reflectance LUTs for ambient lighting — and the reference's
shading templates (shaders/rendering/*light*.template.wgsl). Here the BRDF is
evaluated directly per pixel per light; the ambient term uses the split-sum
approximation with an analytic fit of the GGX environment BRDF (replacing the
reference's precomputed LUT planes, which can be added as a lookup table
later without changing callers).
"""

from __future__ import annotations

import jax.numpy as jnp


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _clamp0(x):
    return jnp.maximum(x, 0.0)


def _fresnel_incidence_factor(c):
    """(1 - cos)^5 (the shader's computeFresnelReflectanceIncidenceFactor)."""
    om = 1.0 - c
    om2 = om * om
    return om2 * om2 * om


def fresnel_schlick(v_dot_h, f0):
    return f0 + (1.0 - f0) * _fresnel_incidence_factor(_saturate(v_dot_h))


def reflection_dots(normal, view_dir, light_dir):
    """The reference's ReflectionDotProducts (computeLightQuantities):
    (VdotN, LdotN, LdotV, NdotH, LdotH), with H derived from L+V without
    normalizing a 3-vector (omnidirectional_light.template.wgsl:193-198)."""
    v_dot_n = jnp.sum(view_dir * normal, axis=-1)
    l_dot_n = jnp.sum(light_dir * normal, axis=-1)
    l_dot_v = jnp.sum(light_dir * view_dir, axis=-1)
    one_plus_lv = jnp.maximum(1.0 + l_dot_v, 1e-6)
    inv_h = 1.0 / jnp.sqrt(2.0 * one_plus_lv)
    n_dot_h = (l_dot_n + v_dot_n) * inv_h
    l_dot_h = one_plus_lv * inv_h
    return v_dot_n, l_dot_n, l_dot_v, n_dot_h, l_dot_h


def area_light_dots(tan_r, v_dot_n, l_dot_n, l_dot_v):
    """Representative-point direction for a spherical area light of angular
    radius atan(tan_r) (determineRepresentativeDirectionForSphericalAreaLight,
    omnidirectional_light.template.wgsl:211-258): tilt L toward the
    reflection vector R, clamped to the light's solid angle."""
    cos_r = 1.0 / jnp.sqrt(1.0 + tan_r * tan_r)
    sin_r = tan_r * cos_r
    l_dot_r = 2.0 * v_dot_n * l_dot_n - l_dot_v
    s = sin_r / jnp.sqrt(jnp.maximum(1.0 - l_dot_r * l_dot_r, 1e-6))
    new_ln = cos_r * l_dot_n + (v_dot_n - l_dot_r * l_dot_n) * s
    new_lv = cos_r * l_dot_v + (2.0 * v_dot_n * v_dot_n - 1.0 - l_dot_r * l_dot_v) * s
    inv_h = 1.0 / jnp.sqrt(2.0 * jnp.maximum(1.0 + new_lv, 1e-6))
    n_dot_h = (new_ln + v_dot_n) * inv_h
    l_dot_h = (1.0 + new_lv) * inv_h
    # reflection vector inside the sphere: snap to maximal intensity
    inside = l_dot_r >= cos_r
    n_dot_h = jnp.where(inside, 1.0, n_dot_h)
    l_dot_h = jnp.where(inside, v_dot_n, l_dot_h)
    new_ln = jnp.where(inside, v_dot_n, new_ln)
    new_lv = jnp.where(inside, 2.0 * v_dot_n * v_dot_n - 1.0, new_lv)
    return new_ln, new_lv, n_dot_h, l_dot_h


def area_light_luminance_scale(tan_r, roughness):
    """Energy normalization for the widened highlight
    (computeLuminanceScalingFactorForSphericalAreaLight)."""
    modified = _saturate(roughness + 0.333333333 * tan_r)
    return roughness * roughness / (modified * modified + 1e-4)


def evaluate_brdf_dots(v_dot_n, l_dot_n, l_dot_v, n_dot_h, l_dot_h,
                       albedo, f0, roughness):
    """(diffuse + specular BRDF)·π · clamped(LdotN)/π — multiply with incident
    luminance. Exact port of the reference's microfacet model: Hammon 2017
    diffuse-GGX fit + GGX specular with Hammon's scaled masking-shadowing
    (omnidirectional_light.template.wgsl:300-395). ``roughness`` is the GGX
    alpha, as in the reference."""
    cl_vn = _clamp0(v_dot_n)
    cl_ln = _clamp0(l_dot_n)
    r = roughness

    # diffuse (computeDiffuseGGXBRDFTimesPi)
    smooth = (
        1.05 * (1.0 - f0)
        * (1.0 - _fresnel_incidence_factor(cl_ln))[..., None]
        * (1.0 - _fresnel_incidence_factor(cl_vn))[..., None]
    )
    half_lv = 0.5 * (1.0 + l_dot_v)
    safe_ndh = jnp.where(jnp.abs(n_dot_h) > 1e-6, n_dot_h, 1.0)
    rough_c = jnp.where(
        jnp.abs(n_dot_h) > 1e-6,
        half_lv * (0.9 - 0.4 * half_lv) * (1.0 + 0.5 / safe_ndh),
        0.0,
    )
    multi = 0.3641 * r
    diffuse_pi = (cl_vn > 0.0)[..., None] * albedo * (
        (1.0 - r)[..., None] * smooth
        + (r * rough_c)[..., None]
        + albedo * multi[..., None]
    )

    # specular (computeSpecularGGXBRDFTimesPi)
    fresnel = fresnel_schlick(_clamp0(l_dot_h)[..., None], f0)
    g_scaled = 0.5 / (
        (1.0 - r) * 2.0 * cl_ln * cl_vn + r * (cl_ln + cl_vn) + 1e-6
    )
    r2 = r * r
    denom = 1.0 + n_dot_h * n_dot_h * (r2 - 1.0)
    d_pi = (n_dot_h > 0.0) * r2 / (denom * denom + 1e-6)
    specular_pi = fresnel * (g_scaled * d_pi)[..., None]

    inv_pi = 0.318309886
    return (diffuse_pi + specular_pi) * (cl_ln * inv_pi)[..., None]


def evaluate_brdf(normal, view_dir, light_dir, albedo, f0, roughness,
                  tan_angular_radius=None):
    """Combined diffuse + specular BRDF × NdotL (reference microfacet model).

    ``tan_angular_radius``: when given, emulate a spherical area light of
    that angular radius via the representative-point technique + luminance
    scaling (the reference's emulate_area_light_reflection path, always on
    in its light shaders). Returns the factor to multiply with incident
    luminance [...,3]."""
    v_dot_n, l_dot_n, l_dot_v, n_dot_h, l_dot_h = reflection_dots(
        normal, view_dir, light_dir
    )
    scale = 1.0
    if tan_angular_radius is not None:
        l_dot_n, l_dot_v, n_dot_h, l_dot_h = area_light_dots(
            tan_angular_radius, v_dot_n, l_dot_n, l_dot_v
        )
        scale = area_light_luminance_scale(tan_angular_radius, roughness)[
            ..., None
        ]
    return scale * evaluate_brdf_dots(
        v_dot_n, l_dot_n, l_dot_v, n_dot_h, l_dot_h, albedo, f0, roughness
    )


def ambient_brdf(normal, view_dir, albedo, f0, roughness):
    """Split-sum ambient response: diffuse albedo + analytic GGX env BRDF fit
    (Karis's approximation), replacing the reference's reflectance LUT
    (brdf.rs:10-26 specular_reflectance LUT planes)."""
    n_dot_v = _saturate(jnp.sum(normal * view_dir, axis=-1))[..., None]
    r = roughness[..., None]
    # Karis's analytic environment-BRDF fit (UE4 mobile approximation)
    rx = r * -1.0 + 1.0
    ry = r * -0.0275 + 0.0425
    rz = r * -0.572 + 1.04
    rw = r * 0.022 - 0.04
    a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * n_dot_v)) * rx + ry
    ab_x = -1.04 * a004 + rz
    ab_y = 1.04 * a004 + rw
    specular_env = f0 * ab_x + ab_y
    return albedo * (1.0 - f0) + specular_env
