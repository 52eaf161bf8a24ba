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


def ggx_distribution(n_dot_h, roughness):
    a = roughness * roughness
    a2 = a * a
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-8)


def smith_ggx_visibility(n_dot_v, n_dot_l, roughness):
    """Height-correlated Smith visibility term (V = G / (4 NdotV NdotL))."""
    a = roughness * roughness
    a2 = a * a
    lv = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v * n_dot_v * (1 - a2) + a2, 1e-8))
    ll = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l * n_dot_l * (1 - a2) + a2, 1e-8))
    return 0.5 / jnp.maximum(lv + ll, 1e-8)


def fresnel_schlick(v_dot_h, f0):
    return f0 + (1.0 - f0) * (1.0 - _saturate(v_dot_h)) ** 5


def evaluate_brdf(normal, view_dir, light_dir, albedo, f0, roughness):
    """Combined diffuse (Lambert) + specular (GGX) BRDF × NdotL.

    All inputs broadcast; ``f0`` [...,3] specular reflectance at normal
    incidence (from metalness/specular material params), albedo [...,3].
    Returns radiance factor [...,3] to multiply with incident illuminance.
    """
    h = light_dir + view_dir
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    n_dot_l = _saturate(jnp.sum(normal * light_dir, axis=-1))
    n_dot_v = _saturate(jnp.sum(normal * view_dir, axis=-1))
    n_dot_h = _saturate(jnp.sum(normal * h, axis=-1))
    v_dot_h = _saturate(jnp.sum(view_dir * h, axis=-1))

    d = ggx_distribution(n_dot_h, roughness)
    vis = smith_ggx_visibility(n_dot_v, n_dot_l, roughness)
    f = fresnel_schlick(v_dot_h[..., None], f0)
    specular = (d * vis)[..., None] * f
    diffuse = albedo / jnp.pi * (1.0 - f)
    return (diffuse + specular) * n_dot_l[..., None]


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
