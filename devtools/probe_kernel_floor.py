"""Isolate per-grid-step cost of the Pallas tile raster kernel.

Measures a ladder of kernels over the same 8160-tile grid (1080p/16px):
  empty   — write zeros to the output block only
  dma     — + the two 3-block payload DMAs
  eval    — + the 7 eval blocks (VPU plane arithmetic, no conds)
  cond    — + lax.cond gating as in the real kernel
  select  — + the 7 one-hot MXU matmuls
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(os.environ.get("TILE", "16"))
H, W = 1080, 1920
TH, TW = -(-H // TILE), -(-W // TILE)
N_TILES = TH * TW
S2 = TILE * TILE
ROWS = 72
NB = 3
P_BLOCKS = 4100


def make(mode):
    def kernel(ranges_ref, payload, out_ref, data_s, sems):
        i = pl.program_id(0)
        if mode == "empty":
            out_ref[0] = jnp.zeros((S2, ROWS), jnp.float32)
            return
        for r in range(2):
            a = ranges_ref[i * 4 + r]
            pltpu.make_async_copy(
                payload.at[pl.ds(a, NB)], data_s.at[r], sems.at[r]
            ).start()
        for r in range(2):
            pltpu.make_async_copy(
                payload.at[pl.ds(ranges_ref[i * 4 + r], NB)],
                data_s.at[r], sems.at[r],
            ).wait()
        if mode == "dma":
            out_ref[0] = jnp.zeros((S2, ROWS), jnp.float32) + data_s[0, 0, 0, 0]
            return
        pc = jax.lax.broadcasted_iota(jnp.int32, (S2, 1), 0)
        px = (pc % TILE).astype(jnp.float32)
        py = (pc // TILE).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        best_z = jnp.full((S2, 1), 3e38, jnp.float32)
        best_i = jnp.full((S2, 1), -1, jnp.int32)

        def eval_block(geo, gidx, carry):
            b0 = geo[0:1, :] * px + geo[1:2, :] * py + geo[2:3, :]
            b1 = geo[3:4, :] * px + geo[4:5, :] * py + geo[5:6, :]
            b2 = 1.0 - b0 - b1
            z = geo[6:7, :] * px + geo[7:8, :] * py + geo[8:9, :]
            cov = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (z >= 0) & (z <= 1)
            zm = jnp.where(cov, z, 3e38)
            bz, bi = carry
            m = jnp.min(zm, axis=1, keepdims=True)
            upd = m < bz
            bi2 = jnp.min(jnp.where(zm <= m, gidx, jnp.int32(0x7FFFFFFF)),
                          axis=1, keepdims=True)
            return jnp.where(upd, m, bz), jnp.where(upd, bi2, bi)

        for r in range(2):
            for j in range(NB):
                gidx = j * 128 + lane
                if mode == "cond" or mode == "select":
                    best_z, best_i = jax.lax.cond(
                        ranges_ref[i * 4 + 2 + r] > j * 128,
                        lambda c, r=r, j=j, g=gidx: eval_block(
                            data_s[r, j], g, c),
                        lambda c: c, (best_z, best_i),
                    )
                else:
                    best_z, best_i = eval_block(data_s[r, j], gidx,
                                                (best_z, best_i))
        if mode in ("eval", "cond"):
            out_ref[0] = jnp.concatenate(
                [best_z, best_i.astype(jnp.float32)] + [best_z] * (ROWS - 2),
                axis=-1)
            return
        sel = jnp.zeros((S2, ROWS), jnp.float32)
        for r in range(2):
            for j in range(NB):
                gidx = j * 128 + lane

                def sel_do(acc, r=r, j=j, gidx=gidx):
                    oh = (best_i == gidx).astype(jnp.float32)
                    return acc + jax.lax.dot_general(
                        oh, data_s[r, j],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                sel = jax.lax.cond(
                    ranges_ref[i * 4 + 2 + r] > j * 128, sel_do,
                    lambda a: a, sel)
        out_ref[0] = sel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, S2, ROWS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NB, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_TILES, S2, ROWS), jnp.float32),
        grid_spec=grid_spec,
    )


def readback(x):
    # axon tunnel: block_until_ready does not force remote execution — only
    # an actual device_get of a value does
    return float(np.asarray(jax.device_get(x[0, 0, 0])))


def bench(name, fn, *args, n=5):
    readback(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"{name}: {min(ts):.1f} ms  ({min(ts)/N_TILES*1e3:.1f} us/tile)",
          flush=True)


key = jax.random.PRNGKey(0)
payload = jax.random.normal(key, (P_BLOCKS, ROWS, 128), jnp.float32)
ranges = jnp.tile(
    jnp.asarray([17, 910, 256, 256], jnp.int32), (N_TILES,))
for mode in ("empty", "dma", "eval", "cond", "select"):
    f = jax.jit(lambda r, p, m=mode: make(m)(r, p))
    t0 = time.perf_counter()
    jax.block_until_ready(f(ranges, payload))
    print(f"{mode} compile {time.perf_counter()-t0:.0f}s", flush=True)
    bench(mode, f, ranges, payload)
