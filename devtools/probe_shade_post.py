"""Break the deferred-shade (47 ms) and postprocess (25 ms) stages into
sub-ops at 1080p bench conditions to find the dominant gathers."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
S = 512  # shadow map res
VIS = (H // 2, W // 2)  # PCF/AO at 1/2 res


def readback(x):
    return float(
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0]
    )


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"[sp] {name:52s} {min(ts):8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    world_pos = jax.random.uniform(ks[0], (H, W, 3), minval=-20, maxval=20)
    normal = jax.random.normal(ks[1], (H, W, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    albedo = jax.random.uniform(ks[2], (H, W, 3))
    f0 = jnp.full((H, W, 3), 0.04)
    roughness = jax.random.uniform(ks[3], (H, W))
    emissive = jnp.zeros((H, W, 3))
    occlusion = jnp.ones((H, W))
    valid = jnp.ones((H, W), bool)
    view_depth = jax.random.uniform(ks[4], (H, W), minval=1.0, maxval=50.0)
    lum = jax.random.uniform(ks[5], (H, W, 3)) * 1000.0
    motion = jax.random.uniform(ks[6], (H, W, 2), minval=-0.01, maxval=0.01)

    from impact_tpu.render.lights import (
        LightPools, empty_light_pools, omni_shadow_visibility,
        uni_cascade_visibility, quad_pack, shade,
    )
    from impact_tpu.render import post
    from impact_tpu.render.brdf import ambient_brdf, evaluate_brdf

    lights = empty_light_pools(1, 1)
    lights = lights._replace(
        omni_position=jnp.asarray([[25.0, 30.0, 25.0]]),
        omni_intensity=jnp.full((1, 3), 3e5),
        omni_extent=jnp.asarray([0.5]),
        omni_shadowable=jnp.ones(1, bool),
        omni_mask=jnp.ones(1, bool),
        uni_direction=jnp.asarray([[-0.35, -0.8, -0.48]]),
        uni_illuminance=jnp.full((1, 3), 3e4),
        uni_extent=jnp.asarray([2.0]),
        uni_shadowable=jnp.ones(1, bool),
        uni_mask=jnp.ones(1, bool),
        ambient_luminance=jnp.full(3, 900.0),
    )
    omni_depths = jax.random.uniform(ks[7], (6, S, S))
    omni_vps = jnp.tile(jnp.eye(4)[None], (6, 1, 1))
    uni_depths = jax.random.uniform(ks[8], (1, S, S))
    uni_vps = jnp.tile(jnp.eye(4)[None], (1, 1, 1))
    splits = jnp.asarray([0.1, 200.0])

    omni_q = quad_pack(omni_depths)
    uni_q = quad_pack(uni_depths)

    wp2 = world_pos[::2, ::2]
    vd2 = view_depth[::2, ::2]
    n2 = normal[::2, ::2]

    bench("ambient_brdf 1080p", ambient_brdf, normal,
          normal, albedo, f0, roughness)
    bench("evaluate_brdf 1080p", lambda n, v, a, s, r: evaluate_brdf(
        n, v, jnp.asarray([0.0, 1.0, 0.0]), a, s, r), normal, normal,
        albedo, f0, roughness)
    bench("omni_shadow_visibility 540p",
          lambda wp: omni_shadow_visibility(
              lights.omni_position[0], omni_q, omni_vps, wp),
          wp2)
    bench("uni_cascade_visibility 540p (1 cascade)",
          lambda vd, wp, n: uni_cascade_visibility(
              uni_q, uni_vps, splits, vd, wp, n),
          vd2, wp2, n2)
    bench("full shade 1080p",
          lambda wp, n, a, s, r: shade(
              lights, wp, n, a, s, r, emissive, occlusion,
              jnp.asarray([0.0, 14.0, 34.0]), valid,
              (omni_q, omni_vps[None].repeat(1, 0)[0] * 1.0,),
              None, view_depth, shadow_downsample=2)
          if False else shade(
              lights, wp, n, a, s, r, emissive, occlusion,
              jnp.asarray([0.0, 14.0, 34.0]), valid,
              (omni_q[None][0], omni_vps), (uni_q, uni_vps, splits),
              view_depth, shadow_downsample=2),
          world_pos, normal, albedo, f0, roughness)

    # AO at 1/2 res
    vpos = jnp.concatenate([wp2, -vd2[..., None]], axis=-1)[..., :3]
    bench("ambient_occlusion 540p",
          lambda vp, n: post.ambient_occlusion(
              vp, n, valid[::2, ::2], 1.0, sample_count=4,
              sample_radius=1.0, intensity=2.0, contrast=0.75),
          vpos, n2)

    bench("TAA 1080p", lambda c, h, m: post.temporal_anti_aliasing(
        c, h, m, 0.1, 1.0), lum, lum, motion)
    bench("bloom 1080p (4 levels)", lambda x: post.bloom(
        x, 4, blur_filter_radius=0.005, blurred_luminance_weight=0.04), lum)
    bench("average_luminance", lambda x: post.average_luminance(
        x, 100.0, 1e7), lum)
    bench("tonemap+srgb+u8", lambda x: post.to_u8(
        post.to_srgb(post.tonemap(x * 1e-4, "ACES"))), lum)


if __name__ == "__main__":
    main()
