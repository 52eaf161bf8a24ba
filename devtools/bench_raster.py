"""Old XLA raster vs Pallas raster on the real TPU at bench scale."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from impact_tpu.render import raster as rasterlib
from impact_tpu.render import raster_pallas as rp

T = int(os.environ.get("T", str(1 << 19)))
H = int(os.environ.get("H", "1080"))
W = int(os.environ.get("W", "1920"))
A = 20


def readback(x):
    return float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0])


def bench(name, fn, *args, n=10):
    out = fn(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"{name}: {min(ts):.1f} ms", flush=True)


def make_scene(key):
    # ~T small triangles (~4px) scattered over the view + one ground quad
    k1, k2 = jax.random.split(key)
    centers = jax.random.uniform(k1, (T, 3), minval=-1.0, maxval=1.0)
    centers = centers.at[:, 2].set(centers[:, 2] * 20 - 25)
    size = 0.004 * (-centers[:, 2:3])
    offs = jax.random.normal(k2, (T, 3, 3)) * size[:, None]
    verts = (centers[:, None, :] + offs).reshape(-1, 3)  # [3T,3]
    tri = jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3)
    active = jnp.ones((T,), bool)
    f = 1.0 / np.tan(0.5)
    far, near = 100.0, 0.1
    a = far / (far - near)
    b = -far * near / (far - near)
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    clip = jnp.stack([f / (W / H) * x, f * y, a * (-z) + b, -z], axis=-1)
    attrs = jax.random.normal(k2, (3 * T, A))
    return clip[tri], active, tri, attrs


key = jax.random.PRNGKey(0)
tri_clip, active, tri, attrs = make_scene(key)
jax.block_until_ready(tri_clip)
print(f"T={T} H={H} W={W}", flush=True)

old = None and jax.jit(
    lambda c, a, t_, v: rasterlib.rasterize_attributes(c, a, t_, v, H, W)
)


new = jax.jit(
    lambda c, a, t_, v: rp.rasterize_attributes(c, a, t_, v, H, W)
)
t0 = time.perf_counter()
out = new(tri_clip, active, tri, attrs)
readback(out)
print(f"new compile {time.perf_counter()-t0:.0f}s", flush=True)
bench("pallas rasterize_attributes 1080p", new, tri_clip, active, tri, attrs)

# depth-only at shadow-map scale
SH = 512
oldd = None and jax.jit(
    lambda c, a: rasterlib.rasterize(
        c, a, SH, SH, cull_backfaces=False, k_per_tile=256, big_budget=16,
        tiles_per_chunk=32,
    )[0].depth
)


newd = jax.jit(
    lambda c, a: rp.rasterize_depth(c, a, SH, SH, cull_backfaces=False)
)
t0 = time.perf_counter()
out = newd(tri_clip, active)
readback(out)
print(f"new depth compile {time.perf_counter()-t0:.0f}s", flush=True)
bench("pallas depth 512", newd, tri_clip, active)

ip, np_, vp_ = new(tri_clip, active, tri, attrs)
print("pallas valid frac:", float(np.asarray(vp_).mean()), flush=True)
