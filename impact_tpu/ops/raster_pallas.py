"""Tile-based triangle rasterization as a Pallas TPU kernel.

The z-buffered raster reduction (render/raster.py `_rasterize_clipped`) is the
renderer's hottest op: every (pixel, triangle) pair evaluates three edge
functions. The XLA version streams triangle chunks against the WHOLE pixel
grid from HBM; this kernel tiles the screen into VPU-shaped (8×128-multiple)
pixel tiles held in VMEM scratch and streams triangle chunks through them —
the framebuffer tile stays on-chip across the entire triangle sweep, cutting
HBM traffic from O(chunks × pixels) to O(pixels) (pallas_guide.md: keep data
in VMEM, grid over tiles, reduce in scratch).

Grid: (tiles_y, tiles_x, t_chunks) — triangle chunks iterate fastest, so the
z/id scratch persists per tile; it initializes at chunk 0 and writes out at
the last chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
TRI_CHUNK = 8

BIG_DEPTH = 1e9


def _raster_kernel(tri_ref, out_z_ref, out_id_ref, zbuf, idbuf):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        zbuf[:] = jnp.full((TILE_H, TILE_W), BIG_DEPTH, jnp.float32)
        idbuf[:] = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)

    # pixel centers of this tile
    py = (
        jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 0)
        + ty.astype(jnp.float32) * TILE_H
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 1)
        + tx.astype(jnp.float32) * TILE_W
        + 0.5
    )

    tri = tri_ref[:]  # [TRI_CHUNK, 16]: ax,ay,az, bx,by,bz, cx,cy,cz, active, id, pad…
    z = zbuf[:]
    tid = idbuf[:]
    for i in range(TRI_CHUNK):
        ax, ay, az = tri[i, 0], tri[i, 1], tri[i, 2]
        bx, by, bz = tri[i, 3], tri[i, 4], tri[i, 5]
        cx, cy, cz = tri[i, 6], tri[i, 7], tri[i, 8]
        active = tri[i, 9]
        tri_id = tri[i, 10]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        keep = (active > 0.5) & (area < -1e-12)
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        w0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
        w1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
        w2 = 1.0 - w0 - w1
        covered = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & keep
        zpix = w0 * az + w1 * bz + w2 * cz
        covered = covered & (zpix >= 0.0) & (zpix <= 1.0)
        closer = covered & (zpix < z)
        z = jnp.where(closer, zpix, z)
        tid = jnp.where(closer, tri_id, tid)
    zbuf[:] = z
    idbuf[:] = tid

    @pl.when(k == n_chunks - 1)
    def _():
        out_z_ref[:] = jnp.where(zbuf[:] >= BIG_DEPTH, 1.0, zbuf[:])
        out_id_ref[:] = idbuf[:].astype(jnp.int32)


def rasterize_pallas(screen_tris, tri_active, height: int, width: int, interpret: bool = False):
    """Pallas z-buffer raster.

    screen_tris: f32[T, 9] — per triangle (ax,ay,az, bx,by,bz, cx,cy,cz) in
    screen space (pixels; z in [0,1]). Backface convention matches
    render/raster.py (negative screen area survives).
    Returns (depth f32[H,W], tri_id i32[H,W]).
    """
    t = screen_tris.shape[0]
    n_chunks = -(-t // TRI_CHUNK)
    pad_t = n_chunks * TRI_CHUNK - t
    ids = jnp.arange(t, dtype=jnp.float32)
    packed = jnp.concatenate(
        [
            screen_tris,
            tri_active.astype(jnp.float32)[:, None],
            ids[:, None],
            jnp.zeros((t, 5), jnp.float32),  # pad row to 16 lanes
        ],
        axis=1,
    )
    packed = jnp.pad(packed, ((0, pad_t), (0, 0)))

    tiles_y = -(-height // TILE_H)
    tiles_x = -(-width // TILE_W)
    ph, pw = tiles_y * TILE_H, tiles_x * TILE_W

    grid = (tiles_y, tiles_x, n_chunks)
    out_z, out_id = pl.pallas_call(
        _raster_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TRI_CHUNK, 16), lambda ty, tx, k: (k, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda ty, tx, k: (ty, tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda ty, tx, k: (ty, tx),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
        interpret=interpret,
    )(packed)
    return out_z[:height, :width], out_id[:height, :width]


def screen_space_triangles(clip_pos, height: int, width: int):
    """Clip-space triangles [T,3,4] → (screen_tris f32[T,9], valid bool[T]),
    matching render/raster.py's screen mapping (y flipped)."""
    w = clip_pos[..., 3]
    valid = jnp.all(w > 1e-8, axis=-1)
    inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-8, w, 1.0)
    sx = (clip_pos[..., 0] * inv_w * 0.5 + 0.5) * width
    sy = (0.5 - clip_pos[..., 1] * inv_w * 0.5) * height
    sz = clip_pos[..., 2] * inv_w
    tris = jnp.stack([sx, sy, sz], axis=-1).reshape(-1, 9)
    return tris, valid
