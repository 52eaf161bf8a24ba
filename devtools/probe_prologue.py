"""Time the pieces of the Pallas raster prologue at bench scale."""

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
H, W = 1080, 1920
A = 20


def _scalarize(fn):
    """Wrap fn so it returns ONE f32 scalar data-dependent on every output.

    Device-get of a big leaf through the ~30 MB/s tunnel poisons timings by
    hundreds of ms, and block_until_ready on the axon platform does not
    actually wait — a 4-byte scalar readback is the only honest sync."""

    @jax.jit
    def g(*a):
        out = fn(*a)
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            # full-sum so no part of the computation is dead code
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    return g


def bench(name, fn, *args, n=5):
    g = _scalarize(fn)
    print(f"[{name}] compiling...", flush=True)
    t0 = time.perf_counter()
    float(np.asarray(g(*args)))
    print(f"[{name}] compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = g(*args)
        float(np.asarray(r))
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"{name}: {min(ts):.1f} ms", flush=True)


key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
centers = jax.random.uniform(k1, (T, 3), minval=-1.0, maxval=1.0)
centers = centers.at[:, 2].set(centers[:, 2] * 20 - 25)
size = 0.004 * (-centers[:, 2:3])
offs = jax.random.normal(k2, (T, 3, 3)) * size[:, None]
verts = (centers[:, None, :] + offs).reshape(-1, 3)
tri = jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3)
active = jnp.ones((T,), bool)
f = 1.0 / np.tan(0.5)
far, near = 100.0, 0.1
a_ = far / (far - near)
b_ = -far * near / (far - near)
x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
clip = jnp.stack([f / (W / H) * x, f * y, a_ * (-z) + b_, -z], axis=-1)
tri_clip = clip[tri]
attrs = jax.random.normal(k2, (3 * T, A))


@jax.jit
def clip_only(c, act):
    return clip_triangles_near(c, act)


@jax.jit
def attr_prep(c, act, t_, v):
    clip2, bary2, act2 = clip_triangles_near(c, act)
    vids2 = jnp.concatenate([t_, t_], axis=0)
    corner_attrs = v[vids2]
    attr_c = jnp.einsum("tij,tja->tia", bary2, corner_attrs)
    return attr_c.reshape(clip2.shape[0], 3 * A)


@jax.jit
def bin_attr(c, act, t_, v):
    clip2, bary2, act2 = clip_triangles_near(c, act)
    vids2 = jnp.concatenate([t_, t_], axis=0)
    corner_attrs = v[vids2]
    attr_c = jnp.einsum("tij,tja->tia", bary2, corner_attrs)
    attr_flat = attr_c.reshape(clip2.shape[0], 3 * A)
    return rp._bin(clip2, act2, H, W, 16, 256, 128, True, attr_flat, T)[:4]


@jax.jit
def bin_depth(c, act):
    clip2, _, act2 = clip_triangles_near(c, act)
    return rp._bin(clip2, act2, 512, 512, 16, 256, 128, False, None, T)[:4]


bench("clip_triangles_near", clip_only, tri_clip, active)
bench("attr prep (gather+einsum)", attr_prep, tri_clip, active, tri, attrs)
bench("bin attr (full prologue)", bin_attr, tri_clip, active, tri, attrs)
bench("bin depth (full prologue 512)", bin_depth, tri_clip, active)

out = jax.jit(
    lambda c, a, t_, v: rp.rasterize_attributes(c, a, t_, v, H, W)
)
bench("full rasterize_attributes", out, tri_clip, active, tri, attrs)
