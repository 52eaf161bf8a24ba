"""Does a [H,W,3] image op pay lane padding (3->128) on TPU? Compare
elementwise chains in HWC vs CHW vs flat layouts at 1080p."""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920


def readback(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])


def bench(name, fn, *args, n=30):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"[lay] {name:48s} {min(ts):8.3f} ms", flush=True)


def chain(x):
    for _ in range(10):
        x = x * 1.0001 + 0.001
    return x


def main():
    key = jax.random.PRNGKey(0)
    hwc = jax.random.uniform(key, (H, W, 3), jnp.float32)
    chw = jnp.transpose(hwc, (2, 0, 1))
    flat = hwc.reshape(H, W * 3)

    bench("10-op elementwise chain [H,W,3]", chain, hwc)
    bench("10-op elementwise chain [3,H,W]", chain, chw)
    bench("10-op elementwise chain [H,W*3]", chain, flat)
    bench("sum [H,W,3]", lambda x: jnp.sum(x), hwc)
    bench("sum [3,H,W]", lambda x: jnp.sum(x), chw)

    # dot with a 4x4 matrix per pixel, HWC vs planes
    m = jax.random.uniform(key, (4, 4), jnp.float32)
    hp = jnp.concatenate([hwc, jnp.ones((H, W, 1))], -1)

    bench("einsum ij,hwj->hwi [H,W,4]",
          lambda m, hp: jnp.einsum("ij,hwj->hwi", m, hp), m, hp)

    planes = [hwc[..., 0], hwc[..., 1], hwc[..., 2]]

    def mat_planes(m, p0, p1, p2):
        outs = []
        for i in range(4):
            outs.append(m[i, 0] * p0 + m[i, 1] * p1 + m[i, 2] * p2 + m[i, 3])
        return outs

    bench("componentwise mat [H,W] planes", mat_planes, m, *planes)

    # normalize a vector field
    bench("normalize [H,W,3]",
          lambda x: x / jnp.maximum(
              jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9), hwc)

    def norm_planes(p0, p1, p2):
        inv = 1.0 / jnp.maximum(
            jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2), 1e-9)
        return p0 * inv, p1 * inv, p2 * inv

    bench("normalize [H,W] planes", norm_planes, *planes)


if __name__ == "__main__":
    main()
