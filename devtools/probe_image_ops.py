"""Microbenchmarks for the post/shade/scene_of sub-ops at 1080p bench scale.

Finds where the 127ms post / 119ms shade / 84ms scene_of go on the v5e:
gathers (TAA reprojection, AO occluder lookups, PCF shadow taps, material
table lookups), bloom mip chain, TAA stats, tonemap tail, corner transforms.
Prints one ms line per op.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
T = 1 << 19  # bench triangle budget


def timeit(fn, *args, n=10, label=""):
    # NOTE: under the axon tunnel block_until_ready does NOT synchronize —
    # only a host fetch does, so every probe reduces to a scalar and fetches.
    def summed(*a):
        out = fn(*a)
        return sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree.leaves(out)
        )

    f = jax.jit(summed)
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"[probe] {label:42s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W, 3), jnp.float32)
    imgc = jnp.transpose(img, (2, 0, 1))  # channel-major
    motion = jax.random.uniform(key, (H, W, 2), jnp.float32) * 0.01
    hist = img * 0.9

    # --- TAA pieces ---
    def taa_gather(hist, motion):
        u = jnp.arange(W)[None, :] + motion[..., 0] * W
        v = jnp.arange(H)[:, None] + motion[..., 1] * H
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        return hist[vi, ui]

    timeit(taa_gather, hist, motion, label="taa: 2D history gather [H,W,3]")

    def taa_gather_flat(hist, motion):
        u = jnp.arange(W)[None, :] + motion[..., 0] * W
        v = jnp.arange(H)[:, None] + motion[..., 1] * H
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        flat = hist.reshape(H * W, 3)
        return flat[(vi * W + ui).reshape(-1)].reshape(H, W, 3)

    timeit(taa_gather_flat, hist, motion, label="taa: flat 1D-index gather")

    def taa_stats(cur):
        pads = jnp.pad(cur, ((1, 1), (1, 1), (0, 0)), mode="edge")
        neigh = jnp.stack(
            [pads[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
        mu = jnp.mean(neigh, axis=0)
        sigma = jnp.std(neigh, axis=0)
        return mu, sigma

    timeit(taa_stats, img, label="taa: 3x3 stats [H,W,3]")

    def taa_stats_cm(cur):
        pads = jnp.pad(cur, ((0, 0), (1, 1), (1, 1)), mode="edge")
        acc = jnp.zeros_like(cur)
        acc2 = jnp.zeros_like(cur)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                x = pads[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
                acc = acc + x
                acc2 = acc2 + x * x
        mu = acc / 9.0
        return mu, jnp.sqrt(jnp.maximum(acc2 / 9.0 - mu * mu, 0.0))

    timeit(taa_stats_cm, imgc, label="taa: 3x3 stats channel-major")

    # --- bloom ---
    from impact_tpu.render.post import bloom

    timeit(lambda x: bloom(x, 4), img, label="bloom: full chain [H,W,3]")

    from impact_tpu.render.post import _downsample13

    timeit(lambda x: _downsample13(x), img, label="bloom: one downsample13 @1080p")

    def down13_cm(x):
        # channel-major variant
        def avg(x):
            c, h, w = x.shape
            return x.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

        def sh(x, dx, dy):
            return jnp.roll(x, (-dy, -dx), axis=(1, 2))

        return (
            0.125 * (avg(x) + avg(sh(x, -1, -1)) + avg(sh(x, 1, -1))
                     + avg(sh(x, -1, 1)) + avg(sh(x, 1, 1)))
            + 0.0625 * (avg(sh(x, 0, -2)) + avg(sh(x, -2, 0))
                        + avg(sh(x, 2, 0)) + avg(sh(x, 0, 2)))
            + 0.03125 * (avg(sh(x, -2, -2)) + avg(sh(x, 2, -2))
                         + avg(sh(x, -2, 2)) + avg(sh(x, 2, 2)))
        )

    timeit(down13_cm, imgc, label="bloom: one downsample13 channel-major")

    # --- luminance + tonemap tail ---
    from impact_tpu.render.post import (
        average_luminance, to_srgb, to_u8, tonemap)

    timeit(lambda x: average_luminance(x), img, label="avg luminance")
    timeit(lambda x: to_u8(to_srgb(tonemap(x))), img, label="tonemap+srgb+u8")

    # --- AO gathers (shade stage) ---
    vpos = jax.random.normal(key, (H, W, 3), jnp.float32)

    def ao_one_sample(vpos):
        u = jnp.clip((vpos[..., 0] * 100).astype(jnp.int32) % W, 0, W - 1)
        v = jnp.clip((vpos[..., 1] * 100).astype(jnp.int32) % H, 0, H - 1)
        occ = vpos[v, u]
        d = occ - vpos
        return jnp.sum(d * d, axis=-1)

    timeit(ao_one_sample, vpos, label="ao: one occluder gather [H,W,3]")

    # --- PCF shadow taps (shade stage) ---
    S = 512
    quads = jax.random.uniform(key, (6, S, S, 4), jnp.float32)
    wp = jax.random.normal(key, (H, W, 3), jnp.float32)

    def pcf_full(quads, wp):
        face = jnp.clip(jnp.abs(wp[..., 0] * 3).astype(jnp.int32), 0, 5)
        p = jnp.clip((wp[..., :2] * 100).astype(jnp.int32) % S, 0, S - 1)
        q = quads[face, p[..., 1], p[..., 0], :]
        return jnp.sum(q, axis=-1)

    timeit(pcf_full, quads, wp, label="pcf: quad gather fullres x1 light")

    def pcf_half(quads, wp):
        wph = wp[::2, ::2]
        face = jnp.clip(jnp.abs(wph[..., 0] * 3).astype(jnp.int32), 0, 5)
        p = jnp.clip((wph[..., :2] * 100).astype(jnp.int32) % S, 0, S - 1)
        q = quads[face, p[..., 1], p[..., 0], :]
        return jnp.sum(q, axis=-1)

    timeit(pcf_half, quads, wp, label="pcf: quad gather halfres x1 light")

    # --- scene_of pieces ---
    from impact_tpu.math import quaternion as quat

    O, TC = 64, 8192
    tri_pos = jax.random.normal(key, (O, TC, 9), jnp.float32)
    q = jax.random.normal(key, (O, 4), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def rot9(q, pos9):
        qq = q[:, None, :]
        return jnp.concatenate(
            [quat.rotate(qq, pos9[..., 3 * c : 3 * c + 3]) for c in range(3)],
            axis=-1)

    timeit(rot9, q, tri_pos, label="scene: rotate9 [O,Tc,9] x1")

    ttype = jax.random.randint(key, (O, TC, 3), 0, 8)
    table = jax.random.uniform(key, (8, 3), jnp.float32)

    def mat_lookup(ttype, table):
        return table[ttype]  # [O,Tc,3,3]

    timeit(mat_lookup, ttype, table, label="scene: material table gather")

    def mat_onehot(ttype, table):
        oh = jax.nn.one_hot(ttype, 8, dtype=jnp.float32)  # [O,Tc,3,8]
        return jnp.einsum("otck,kj->otcj", oh, table)

    timeit(mat_onehot, ttype, table, label="scene: material one-hot matmul")

    # full corner transform at bench scale: 3 rotations (cur/prev/normal)
    def scene_transform(q, tri_pos):
        a = rot9(q, tri_pos)
        b = rot9(q, tri_pos * 1.01)
        c = rot9(q, tri_pos * 0.99)
        return a + b + c

    timeit(scene_transform, q, tri_pos, label="scene: 3x rotate9 (cur/prev/nrm)")


if __name__ == "__main__":
    main()
