"""Isolate the slow sub-op in the raster attribute prologue on the TPU."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

T = int(os.environ.get("T", str(1 << 16)))
A = 20


def readback(x):
    return float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0])


def bench(name, fn, *args, n=10):
    t0 = time.perf_counter()
    readback(fn(*args))
    print(f"[{name}] compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"{name}: {min(ts):.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
v = jax.random.normal(key, (3 * T, A))
tri = jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3)
bary2 = jnp.broadcast_to(jnp.eye(3)[None], (2 * T, 3, 3))
k1, _ = jax.random.split(key)
clip_pos = jax.random.normal(k1, (T, 3, 4))
k = jnp.zeros((T,), jnp.int32)

bench("gather [T,3] idx", jax.jit(lambda v, t: v[t]), v, tri)
bench("gather flat idx", jax.jit(lambda v, t: v[t.ravel()].reshape(T, 3, A)), v, tri)
bench(
    "gather flat wide (reshape [T,3A] first)",
    jax.jit(lambda v, t: v.reshape(T, 3 * A)[t[:, 0] // 3]),
    v,
    tri,
)
corner = v[tri]
corner2 = jnp.concatenate([corner, corner], axis=0)
bench(
    "einsum bary x corner",
    jax.jit(lambda b, c: jnp.einsum("tij,tja->tia", b, c)),
    bary2,
    corner2,
)
bench(
    "take_along_axis rot (old clip)",
    jax.jit(
        lambda c, kk: jnp.take_along_axis(
            c, ((kk[:, None] + jnp.arange(3)[None, :]) % 3)[..., None], axis=1
        )
    ),
    clip_pos,
    k,
)
bench(
    "one-hot rot (new clip)",
    jax.jit(
        lambda c, kk: jnp.einsum(
            "tij,tjc->tic",
            jax.nn.one_hot(
                (kk[:, None] + jnp.arange(3)[None, :]) % 3, 3, dtype=c.dtype
            ),
            c,
        )
    ),
    clip_pos,
    k,
)
