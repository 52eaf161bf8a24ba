"""Ablate the Pallas depth kernel's per-step cost sources at 512²/262k tris:
conds vs unconditional, window count, DMA starts. Finds what the ~10 µs/step
actually is."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from impact_tpu.render import raster_pallas as rp
from impact_tpu.render.raster import clip_triangles_near

T = 262144
S = 512
TILE = 16


def readback(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])


def bench(name, f, *args, n=20):
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"[ka] {name:48s} {min(ts):8.2f} ms", flush=True)


def make_variant(tile, n_blocks, tw, rows, p_pad, *, conds, mxu, windows,
                 dbuf):
    s2 = tile * tile

    def kernel(ranges_ref, payload, big_rows, big_mask, out_ref, data_s, sems):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2) if dbuf else 0
        nxt = jax.lax.rem(i + 1, 2)
        x0 = (jax.lax.rem(i, tw) * tile).astype(jnp.float32)
        y0 = (jax.lax.div(i, tw) * tile).astype(jnp.float32)

        def start_dmas(step, buf):
            for r in range(windows):
                s = ranges_ref[step * 8 + r]
                a = s - jax.lax.rem(s, 128)
                pltpu.make_async_copy(
                    payload.at[pl.ds(a // 128, n_blocks)],
                    data_s.at[buf, r], sems.at[buf, r],
                ).start()

        if dbuf:
            @pl.when(i == 0)
            def _():
                start_dmas(i, slot)

            @pl.when(i + 1 < nsteps)
            def _():
                start_dmas(i + 1, nxt)
        else:
            start_dmas(i, 0)

        pc = jax.lax.broadcasted_iota(jnp.int32, (s2, 1), 0)
        px = x0 + (pc % tile).astype(jnp.float32) + 0.5
        py = y0 + (pc // tile).astype(jnp.float32) + 0.5
        pxy = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def eval_block(geo, gidx, s, cnt, best_z):
            if mxu:
                def plane(rows3):
                    return jax.lax.dot_general(
                        pxy, rows3,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                b0 = plane(geo[0:3, :])
                b1 = plane(geo[3:6, :])
                z = plane(geo[6:9, :])
                b2 = 1.0 - b0 - b1
            else:
                b0 = geo[0:1, :] * px + geo[1:2, :] * py + geo[2:3, :]
                b1 = geo[3:4, :] * px + geo[4:5, :] * py + geo[5:6, :]
                b2 = 1.0 - b0 - b1
                z = geo[6:7, :] * px + geo[7:8, :] * py + geo[8:9, :]
            have = (gidx >= s) & (gidx < s + cnt)
            m = jnp.minimum(b0, jnp.minimum(b1, b2))
            cov = (m >= 0) & (z >= 0) & (z <= 1) & have
            zm = jnp.where(cov, z, 3e38)
            return jnp.minimum(best_z, zm)

        best_z = jnp.full((s2, 128), 3e38, jnp.float32)
        for r in range(windows):
            s = ranges_ref[i * 8 + r]
            cnt = ranges_ref[i * 8 + 4 + r]
            a = s - jax.lax.rem(s, 128)
            pltpu.make_async_copy(
                payload.at[pl.ds(a // 128, n_blocks)],
                data_s.at[slot, r], sems.at[slot, r],
            ).wait()
            for j in range(n_blocks):
                gidx = a + j * 128 + lane
                if conds:
                    def do(bz, r=r, j=j, gidx=gidx, s=s, cnt=cnt):
                        return eval_block(data_s[slot, r, j], gidx, s, cnt, bz)
                    best_z = jax.lax.cond(
                        a + j * 128 < s + cnt, do, lambda b: b, best_z)
                else:
                    best_z = eval_block(data_s[slot, r, j], gidx, s, cnt,
                                        best_z)
        bz = jnp.min(best_z, axis=1)
        out_ref[0, 0, :] = jnp.where(bz >= 3e38, 1.0, bz)

    return kernel


def run_variant(ranges, payload, big_rows, big_mask, th, tw, **kw):
    n_tiles = th * tw
    rows = payload.shape[1]
    p_pad = payload.shape[0] * 128
    n_blocks = 1 + -(-128 // 128)
    kernel = make_variant(TILE, n_blocks, tw, rows, p_pad, **kw)
    s2 = TILE * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, s2), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, n_blocks, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, s2), jnp.float32),
        grid_spec=grid_spec,
    )(ranges, payload, big_rows, big_mask)


def main():
    key = jax.random.PRNGKey(0)
    centers = jax.random.uniform(key, (T, 3), minval=-1.0, maxval=1.0)
    centers = centers.at[:, 2].set(centers[:, 2] * 20 - 25)
    size = 0.004 * (-centers[:, 2:3])
    offs = jax.random.normal(key, (T, 3, 3)) * size[:, None]
    verts = centers[:, None, :] + offs
    f = 1.0 / np.tan(0.5)
    a = 100.0 / (100.0 - 0.1)
    x, y, z = verts[..., 0], verts[..., 1], verts[..., 2]
    clip = jnp.stack([f * x, f * y, a * z + a * 0.1, -z], axis=-1)
    act = jnp.ones((T,), bool)

    clip2, _, act2 = clip_triangles_near(clip, act)
    pro = jax.jit(lambda c, a2: rp._bin(
        c, a2, S, S, TILE, 128, 128, False, None, T))(clip2, act2)
    ranges, payload, big_rows, big_mask = pro[0], pro[1], pro[2], pro[3]
    th = tw = S // TILE

    variants = [
        ("conds+mxu+dbuf (current)", dict(conds=True, mxu=True, dbuf=True,
                                          windows=4)),
        ("NO conds, mxu, dbuf", dict(conds=False, mxu=True, dbuf=True,
                                     windows=4)),
        ("conds, NO mxu, dbuf", dict(conds=True, mxu=False, dbuf=True,
                                     windows=4)),
        ("NO conds, NO mxu, dbuf", dict(conds=False, mxu=False, dbuf=True,
                                        windows=4)),
        ("conds+mxu NO dbuf", dict(conds=True, mxu=True, dbuf=False,
                                   windows=4)),
        ("2 windows (fine only) conds+mxu+dbuf",
         dict(conds=True, mxu=True, dbuf=True, windows=2)),
    ]
    for name, kw in variants:
        fn = jax.jit(functools.partial(
            run_variant, th=th, tw=tw, **kw))
        bench(name, fn, ranges, payload, big_rows, big_mask)


if __name__ == "__main__":
    main()
