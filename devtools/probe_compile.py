"""Bisect which raster-path change explodes compile time: chunked-sort
prologue, tile=32 attr kernel, or tile=32 depth kernel. Prints compile
seconds for each piece at bench scale."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from impact_tpu.render import raster_pallas as rp
from impact_tpu.render.raster import clip_triangles_near

T = 262144
H, W = 1080, 1920
S = 512


def cbench(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"[c] {name:52s} {time.perf_counter() - t0:7.1f} s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    clip = jax.random.normal(key, (T, 3, 4)) * 5.0
    clip = clip.at[..., 3].set(jnp.abs(clip[..., 3]) + 1.0)
    act = jnp.ones((T,), bool)
    attrs = jax.random.uniform(key, (T, 60), jnp.float32)

    cbench("depth tile=16 k=128 512²",
           lambda c, a: rp.rasterize_depth(
               c, a, S, S, cull_backfaces=False), clip, act)
    cbench("depth tile=32 k=256 512²",
           lambda c, a: rp.rasterize_depth(
               c, a, S, S, cull_backfaces=False, tile=32, k_per_range=256),
           clip, act)

    def attr_prologue(c, a, at):
        clip2, bary2, act2 = clip_triangles_near(c, a)
        a_dim = at.shape[1] // 3
        ca = [jnp.concatenate([at[:, i * a_dim : (i + 1) * a_dim]] * 2, axis=0)
              for i in range(3)]
        bw = [[bary2[:, i, c2] for c2 in range(3)] for i in range(3)]
        attr_rows = [
            bw[i][0] * ca[0][:, j] + bw[i][1] * ca[1][:, j]
            + bw[i][2] * ca[2][:, j]
            for i in range(3) for j in range(a_dim)
        ]
        return rp._bin(clip2, act2, H, W, 32, 256, 128, True, attr_rows, T)[:5]

    cbench("attr prologue (6 chunked sorts) 1080p", attr_prologue,
           clip, act, attrs)

    cbench("attr full tile=16 k=128 1080p",
           lambda c, a, at: rp.rasterize_attributes(
               c, a, None, at, H, W, corner_major=True), clip, act, attrs)
    cbench("attr full tile=32 k=256 1080p",
           lambda c, a, at: rp.rasterize_attributes(
               c, a, None, at, H, W, corner_major=True, tile=32,
               k_per_range=256), clip, act, attrs)


if __name__ == "__main__":
    main()
