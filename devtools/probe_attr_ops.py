"""Isolate the slow sub-op in the raster attribute prologue on the TPU.

Uses scalar-reduce readback: device_get of a big leaf through the ~30 MB/s
tunnel poisons timings, and block_until_ready on the axon platform does not
actually wait.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

T = int(os.environ.get("T", str(1 << 19)))
A = 20


def _scalarize(fn):
    @jax.jit
    def g(*a):
        out = fn(*a)
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    return g


def bench(name, fn, *args, n=10):
    g = _scalarize(fn)
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
    print(f"{name}: {min(ts):.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
v = jax.random.normal(key, (3 * T, A))
tri = jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3)
bary2 = jnp.broadcast_to(jnp.eye(3)[None], (2 * T, 3, 3))


def current(v, t, b):
    """The shipped path: [T2,3,A] gather + einsum blend."""
    vids2 = jnp.concatenate([t, t], axis=0)
    corner = v[vids2]  # [T2,3,A]
    attr_c = jnp.einsum("tij,tja->tia", b, corner)
    return attr_c.reshape(2 * T, 3 * A)


def gather_only(v, t):
    vids2 = jnp.concatenate([t, t], axis=0)
    return v[vids2]


def flat2d(v, t, b):
    """All-2D variant: per-corner [T,A] gathers + 9 MACs on [T2,A] arrays
    (no [T2,3,A] intermediates — 3D shapes pad every 20-float row to 128
    lanes and relayout repeatedly)."""
    c = [jnp.concatenate([v[t[:, j]]] * 2, axis=0) for j in range(3)]  # [T2,A]
    outs = []
    for i in range(3):
        acc = b[:, i, 0:1] * c[0] + b[:, i, 1:2] * c[1] + b[:, i, 2:3] * c[2]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)  # [T2,3A]


def gather_flat2d(v, t):
    return [jnp.concatenate([v[t[:, j]]] * 2, axis=0) for j in range(3)]


bench("current gather+einsum", current, v, tri, bary2)
bench("gather [T2,3,A] only", gather_only, v, tri)
bench("flat2d gather only", gather_flat2d, v, tri)
bench("flat2d gather+blend", flat2d, v, tri, bary2)

out_cur = np.asarray(jax.jit(current)(v, tri, bary2))
out_new = np.asarray(jax.jit(flat2d)(v, tri, bary2))
print("max diff:", float(np.abs(out_cur - out_new).max()))
