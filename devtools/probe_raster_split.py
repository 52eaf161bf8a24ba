"""Split Pallas-raster cost into prologue (clip/bin/sort) vs kernel, at bench
scale, for the depth (shadow 512²) and attribute (geometry 1080p) paths."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from impact_tpu.render import raster_pallas as rp
from impact_tpu.render.raster import clip_triangles_near

T = int(os.environ.get("T", str(1 << 19)))


def readback(x):
    return float(
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0]
    )


def bench(name, fn, *args, n=10):
    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"[split] {name:46s} {min(ts):8.2f} ms", flush=True)


def make_clip(key, t):
    k1, k2 = jax.random.split(key)
    centers = jax.random.uniform(k1, (t, 3), minval=-1.0, maxval=1.0)
    centers = centers.at[:, 2].set(centers[:, 2] * 20 - 25)
    size = 0.004 * (-centers[:, 2:3])
    offs = jax.random.normal(k2, (t, 3, 3)) * size[:, None]
    verts = centers[:, None, :] + offs  # [T,3,3]
    f = 1.0 / np.tan(0.5)
    far, near = 100.0, 0.1
    a = far / (far - near)
    x, y, z = verts[..., 0], verts[..., 1], verts[..., 2]
    clip = jnp.stack(
        [f * x / (16 / 9), f * y, a * z + a * near, -z], axis=-1
    )
    return clip


def main():
    key = jax.random.PRNGKey(0)
    clip = make_clip(key, T)
    act = jnp.ones((T,), bool)

    # --- depth path at 512² ---
    S = 512
    bench("depth: full rasterize_depth 512²",
          lambda c, a: rp.rasterize_depth(c, a, S, S, cull_backfaces=False),
          clip, act)

    def depth_prologue(c, a):
        clip2, _, act2 = clip_triangles_near(c, a)
        return rp._bin(clip2, act2, S, S, 16, 256, 128, False, None, T)[:5]

    bench("depth: prologue (clip+bin+sort)", depth_prologue, clip, act)

    def clip_only(c, a):
        return clip_triangles_near(c, a)

    bench("depth: clip_triangles_near only", clip_only, clip, act)

    pro = jax.jit(depth_prologue)(clip, act)
    ranges, payload, big_rows, big_mask, _ = pro
    th = tw = -(-S // 16)

    def kernel_only(ranges, payload, big_rows, big_mask):
        return rp._run(ranges, payload, big_rows, big_mask, th, tw, 16, 256,
                       0, False)

    bench("depth: kernel only", kernel_only, ranges, payload, big_rows,
          big_mask)

    # --- attribute path at 1080p, 20 attrs ---
    H, W = 1080, 1920
    attrs = jax.random.uniform(key, (T, 60), jnp.float32)

    bench("attr: full rasterize_attributes 1080p",
          lambda c, a, at: rp.rasterize_attributes(
              c, a, None, at, H, W, corner_major=True),
          clip, act, attrs)

    def attr_prologue(c, a, at):
        clip2, bary2, act2 = clip_triangles_near(c, a)
        a_dim = at.shape[1] // 3
        ca = [jnp.concatenate([at[:, i * a_dim : (i + 1) * a_dim]] * 2, axis=0)
              for i in range(3)]
        bw = [[bary2[:, i, c] for c in range(3)] for i in range(3)]
        attr_rows = [
            bw[i][0] * ca[0][:, j] + bw[i][1] * ca[1][:, j]
            + bw[i][2] * ca[2][:, j]
            for i in range(3) for j in range(a_dim)
        ]
        return rp._bin(clip2, act2, H, W, 16, 256, 128, True, attr_rows, T)[:5]

    bench("attr: prologue (clip+blend+bin+sort)", attr_prologue, clip, act,
          attrs)

    pro = jax.jit(attr_prologue)(clip, act, attrs)
    ranges, payload, big_rows, big_mask, _ = pro
    th2 = -(-H // 16)
    tw2 = -(-W // 16)

    def attr_kernel(ranges, payload, big_rows, big_mask):
        return rp._run(ranges, payload, big_rows, big_mask, th2, tw2, 16,
                       256, 20, False)

    bench("attr: kernel only", attr_kernel, ranges, payload, big_rows,
          big_mask)


if __name__ == "__main__":
    main()
