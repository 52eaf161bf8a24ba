"""A/B the shading math's array layout at 1080p: [H,W,3] vector-minor arrays
(lane dim = 3, padded to 128 on TPU) vs channel-major [H,W] planes.

Hypothesis (from probe_shade_post: ambient_brdf standalone = 72 ms for ~1 ms
of elementwise math): the 3-wide minor dim lane-pads ~42x, inflating both VPU
work and HBM traffic across the whole shade/post chain.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920


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
    print(f"[cm] {name:52s} {min(ts):8.2f} ms", flush=True)


def main():
    from impact_tpu.render.brdf import ambient_brdf

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    normal = jax.random.normal(ks[0], (H, W, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    albedo = jax.random.uniform(ks[1], (H, W, 3))
    f0 = jnp.full((H, W, 3), 0.04)
    roughness = jax.random.uniform(ks[2], (H, W))

    bench("ambient_brdf [H,W,3]", ambient_brdf, normal, normal, albedo, f0,
          roughness)

    # channel-major: [3,H,W] planes, identical math componentwise
    def ambient_brdf_planes(n3, v3, a3, f3, r):
        n_dot_v = jnp.clip(
            n3[0] * v3[0] + n3[1] * v3[1] + n3[2] * v3[2], 0.0, 1.0
        )
        rx = r * -1.0 + 1.0
        ry = r * -0.0275 + 0.0425
        rz = r * -0.572 + 1.04
        rw = r * 0.022 - 0.04
        a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * n_dot_v)) * rx + ry
        ab_x = -1.04 * a004 + rz
        ab_y = 1.04 * a004 + rw
        return jnp.stack(
            [a3[c] * (1.0 - f3[c]) + f3[c] * ab_x + ab_y for c in range(3)]
        )

    n_p = jnp.moveaxis(normal, -1, 0)
    a_p = jnp.moveaxis(albedo, -1, 0)
    f_p = jnp.moveaxis(f0, -1, 0)
    bench("ambient_brdf [3,H,W] planes", ambient_brdf_planes, n_p, n_p, a_p,
          f_p, roughness)

    # the transpose cost itself (would sit at a layout boundary once)
    bench("moveaxis [H,W,3]->[3,H,W] x3",
          lambda a, b, c: tuple(jnp.moveaxis(x, -1, 0) for x in (a, b, c)),
          normal, albedo, f0)


if __name__ == "__main__":
    main()
