"""Ablate the raster prologue at depth-path bench scale (T=262k, 512²):
clip+plane math, the 13-op sort, searchsorted/ranges, payload blocking."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from impact_tpu.render import raster_pallas as rp
from impact_tpu.render.raster import clip_triangles_near

T = 262144
S = 512
TILE = 16


def readback(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])


def bench(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"[p3] {name:52s} {min(ts):8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    centers = jax.random.uniform(key, (T, 3), minval=-1.0, maxval=1.0)
    centers = centers.at[:, 2].set(centers[:, 2] * 20 - 25)
    size = 0.004 * (-centers[:, 2:3])
    offs = jax.random.normal(key, (T, 3, 3)) * size[:, None]
    verts = centers[:, None, :] + offs
    f2 = 1.0 / np.tan(0.5)
    a = 100.0 / (100.0 - 0.1)
    x, y, z = verts[..., 0], verts[..., 1], verts[..., 2]
    clip = jnp.stack([f2 * x, f2 * y, a * z + a * 0.1, -z], axis=-1)
    act = jnp.ones((T,), bool)

    def clip_plane(c, a2):
        clip2, _, act2 = clip_triangles_near(c, a2)
        geom, actp, bbox, near_z = rp._plane_coefficients(
            clip2, act2, S, S, False)
        return sum(jnp.sum(g) for g in geom) + jnp.sum(near_z)

    bench("clip + plane coefficients (sum)", clip_plane, clip, act)

    keys = jax.random.randint(key, (T,), 0, 1 << 20, dtype=jnp.int32
                              ).astype(jnp.uint32)
    rows = [jax.random.uniform(key, (T,), jnp.float32) for _ in range(12)]

    bench("sort u32 keys only (1 op)",
          lambda k: jax.lax.sort((k,), num_keys=1)[0], keys)
    bench("sort (key, id) 2-op",
          lambda k: jax.lax.sort(
              (k, jnp.arange(T, dtype=jnp.int32)), num_keys=1)[1], keys)
    bench("sort 13-op (key + 12 rows)",
          lambda k, *r: sum(jnp.sum(o) for o in jax.lax.sort(
              (k, *r), num_keys=1)[1:]), keys, *rows)

    order = jax.jit(lambda k: jax.lax.sort(
        (k, jnp.arange(T, dtype=jnp.int32)), num_keys=1)[1])(keys)
    full = jnp.stack(rows, axis=-1)  # [T,12]
    bench("row gather [T,12] by sorted order",
          lambda f3, o: f3[o], full, order)

    tile_s = jnp.sort(keys >> 14).astype(jnp.int32)
    n_bins = (S // TILE) ** 2 + (S // 64) ** 2 + 1
    bench("searchsorted bins",
          lambda t: jnp.searchsorted(t, jnp.arange(n_bins + 1,
                                                   dtype=jnp.int32)), tile_s)

    payload = jnp.stack(rows, axis=0)  # [12, T]
    rows_pad, p_pad = 16, -(-T // 128) * 128 + 256

    def block_transpose(p):
        pp = jnp.pad(p, ((0, rows_pad - 12), (0, p_pad - T)))
        return pp.reshape(rows_pad, p_pad // 128, 128).transpose(1, 0, 2)

    bench("payload blocking (pad+reshape+transpose)", block_transpose,
          payload)

    def block_stack(rows_list):
        padded = [jnp.pad(r, (0, p_pad - T)).reshape(p_pad // 128, 1, 128)
                  for r in rows_list]
        z = jnp.zeros((p_pad // 128, 1, 128), jnp.float32)
        return jnp.concatenate(padded + [z] * (rows_pad - 12), axis=1)

    bench("payload blocking (per-row reshape + concat axis1)", block_stack,
          rows)


if __name__ == "__main__":
    main()
