"""Pallas TPU tile rasterizer.

Replaces the XLA tile-binned rasterizer (`raster.py`) on the hot path. The
reference rasterizes on GPU hardware (impact_rendering geometry/shadow passes,
render_command.rs:222-432); the TPU-native design is a screen-tile kernel:

  prologue (XLA):  near-clip -> screen-plane coefficients per triangle ->
                   bin each triangle to its CENTER 16x16 tile -> ONE sort by
                   (tile, depth) -> per-tile row ranges (searchsorted)
  kernel (Pallas): per tile, DMA the candidate payload rows of the 3x3
                   center-tile neighborhood (3 contiguous row ranges, one per
                   tile row) into VMEM, evaluate barycentric/depth planes for
                   8 candidates x all tile pixels on the VPU with a running
                   (z, index) min, then select the winner's payload per pixel
                   with one-hot MXU matmuls and interpolate attributes.

Why this shape (measured on the v5e, devtools/ benches):
  - lax.sort is cheap when narrow: 2-op 512k ~ 0.7 ms, 17-op ~ 3 ms. The
    depth path carries its whole 12-float payload THROUGH the sort (no
    gather); the attribute path sorts (key, id) and pays one row gather.
  - XLA row gathers cost ~3-15 ns/row; all per-candidate accesses in the
    kernel are contiguous-range DMAs instead.
  - Payload rows are 128 floats wide: Mosaic requires DMA slices whose
    trailing dim is 128-aligned.
  - Per-pixel attribute fetch is a [S^2, K] x [K, P] matmul on the MXU (a
    take_along_axis would lower to per-element gathers, ~10x slower).

Triangles spanning more than the 3x3 neighborhood (ground planes) and the
rare second output of a near-plane quad split go to a small "big" candidate
list broadcast to every tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import _edge, _screen_coords, clip_triangles_near

# payload columns (f32[P, 128]):
#   0:3   Ab0, Bb0, Cb0   barycentric-0 screen plane (b0 = A*px + B*py + C)
#   3:6   Ab1, Bb1, Cb1   barycentric-1 screen plane
#   6:9   ZA, ZB, ZC      NDC-depth screen plane    (z = A*px + B*py + C)
#   9:12  iw0, iw1, iw2   1/clip_w per corner (perspective correction)
#   12:16 pad
#   16:16+3*A   per-corner attributes (attr kernel only)
PW = 128
GEOM_COLS = 16
_INF = np.float32(3.0e38)
_ZKEY_BITS = 14
_ZKEY_SCALE = float((1 << _ZKEY_BITS) - 2)


def _plane_coefficients(clip2, act2, height, width, cull_backfaces):
    """Vectorized per-clipped-triangle screen setup.

    Returns (geom [T2,12], act, bbox tuple, near_z)."""
    sx, sy, z, valid = _screen_coords(clip2, height, width)  # [T2,3]
    act = act2 & jnp.all(valid, axis=-1)
    area = _edge(sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2])
    if cull_backfaces:
        act = act & (area < -1e-12)
    else:
        act = act & (jnp.abs(area) > 1e-12)

    xmin = jnp.min(sx, axis=-1)
    xmax = jnp.max(sx, axis=-1)
    ymin = jnp.min(sy, axis=-1)
    ymax = jnp.max(sy, axis=-1)
    act = act & (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)

    ia = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    ax, ay = sx[:, 0], sy[:, 0]
    bx, by = sx[:, 1], sy[:, 1]
    cx, cy = sx[:, 2], sy[:, 2]
    # b0 = edge(b, c, p) / area: an affine plane over screen space
    a0 = -(cy - by) * ia
    b0 = (cx - bx) * ia
    c0 = (-by * (cx - bx) + bx * (cy - by)) * ia
    # b1 = edge(c, a, p) / area
    a1 = -(ay - cy) * ia
    b1 = (ax - cx) * ia
    c1 = (-cy * (ax - cx) + cx * (ay - cy)) * ia
    z0, z1, z2 = z[:, 0], z[:, 1], z[:, 2]
    za = a0 * (z0 - z2) + a1 * (z1 - z2)
    zb = b0 * (z0 - z2) + b1 * (z1 - z2)
    zc = c0 * (z0 - z2) + c1 * (z1 - z2) + z2
    iw = 1.0 / jnp.maximum(clip2[..., 3], 1e-8)  # [T2,3]

    # inactive slots: b0 = -1 everywhere so they never cover a pixel
    c0 = jnp.where(act, c0, -1.0)
    a0 = jnp.where(act, a0, 0.0)
    b0 = jnp.where(act, b0, 0.0)

    geom = [a0, b0, c0, a1, b1, c1, za, zb, zc, iw[:, 0], iw[:, 1], iw[:, 2]]
    near_z = jnp.where(act, jnp.min(z, axis=-1), jnp.inf)
    return geom, act, (xmin, xmax, ymin, ymax), near_z


def _bin(
    clip2, act2, height, width, tile, k_per_range, big_budget,
    cull_backfaces, attr_corners, n_first,
):
    """Shared binning prologue.

    ``n_first``: only the first n_first slots (original triangles) are
    center-binned; later slots (near-plane quad seconds) route to the big
    list. Returns (starts3, counts3, payload [P_pad,128], big [NBpad,128],
    big_mask, n_dropped, th, tw).
    """
    t2 = clip2.shape[0]
    th = -(-height // tile)
    tw = -(-width // tile)
    n_tiles = th * tw

    geom, act, (xmin, xmax, ymin, ymax), near_z = _plane_coefficients(
        clip2, act2, height, width, cull_backfaces
    )

    tx0 = jnp.clip(jnp.floor(xmin / tile).astype(jnp.int32), 0, tw - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile).astype(jnp.int32), 0, tw - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile).astype(jnp.int32), 0, th - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile).astype(jnp.int32), 0, th - 1)
    first = jnp.arange(t2, dtype=jnp.int32) < n_first
    fits = (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
    small = act & fits & first
    big = act & ~small

    ctx = (tx0 + tx1) // 2
    cty = (ty0 + ty1) // 2
    ctile = jnp.where(small, cty * tw + ctx, n_tiles)
    zq = jnp.clip(near_z, 0.0, 1.0)
    zq = jnp.where(small, (zq * _ZKEY_SCALE).astype(jnp.int32),
                   (1 << _ZKEY_BITS) - 1)
    key = ctile * (1 << _ZKEY_BITS) + zq

    na = attr_corners.shape[1] if attr_corners is not None else 0
    assert GEOM_COLS + na <= PW, "attribute payload exceeds 128-col rows"

    if attr_corners is None:
        # depth path: carry the 12 payload columns through the sort
        key = key[:n_first]
        sorted_ops = jax.lax.sort(
            (key, *[g[:n_first] for g in geom]), num_keys=1
        )
        key_s = sorted_ops[0]
        p_pad = n_first + k_per_range
        payload = jnp.zeros((p_pad, PW), jnp.float32)
        cols = jnp.stack(sorted_ops[1:], axis=-1)  # [n_first, 12]
        payload = payload.at[:n_first, :12].set(cols)
        payload = payload.at[n_first:, 2].set(-1.0)
    else:
        key = key[:n_first]
        key_s, order = jax.lax.sort(
            (key, jnp.arange(n_first, dtype=jnp.int32)), num_keys=1
        )
        full = jnp.concatenate(
            [jnp.stack(geom, axis=-1), jnp.zeros((t2, 4), jnp.float32),
             attr_corners],
            axis=-1,
        )  # [T2, 16+3A]
        full = jnp.pad(full, ((0, 0), (0, PW - GEOM_COLS - na)))
        payload = full[order]  # ONE row gather in sorted order
        payload = jnp.pad(payload, ((0, k_per_range), (0, 0)))
        payload = payload.at[n_first:, 2].set(-1.0)

    tile_s = key_s // (1 << _ZKEY_BITS)
    bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # 3 contiguous ranges per tile: candidate rows of tile rows ty-1..ty+1,
    # columns tx-1..tx+1 (a center-binned triangle spans at most 2x2 tiles,
    # so every tile it overlaps is within +-1 of its center tile)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ttx = tids % tw
    tty = tids // tw
    lo_x = jnp.maximum(ttx - 1, 0)
    hi_x = jnp.minimum(ttx + 1, tw - 1)
    rows = tty[:, None] + jnp.array([-1, 0, 1], jnp.int32)[None, :]
    row_ok = (rows >= 0) & (rows < th)
    rows_c = jnp.clip(rows, 0, th - 1)
    r_start = bounds[rows_c * tw + lo_x[:, None]]
    r_end = bounds[rows_c * tw + hi_x[:, None] + 1]
    r_len = jnp.where(row_ok, r_end - r_start, 0)
    counts3 = jnp.minimum(r_len, k_per_range)
    n_drop = jnp.sum(r_len - counts3)

    # big list: nearest-first, padded to a multiple of 8
    nb = int(min(big_budget, t2))
    nb_pad = max(8, ((nb + 7) // 8) * 8)
    big_key = jnp.where(big, near_z, jnp.inf)
    big_order = jnp.argsort(big_key)[:nb].astype(jnp.int32)
    big_sel = big[big_order]
    if attr_corners is None:
        big_rows = jnp.stack([g[big_order] for g in geom], axis=-1)
        big_rows = jnp.pad(big_rows, ((0, 0), (0, PW - 12)))
    else:
        big_rows = full[big_order]
    big_rows = jnp.where(big_sel[:, None], big_rows, 0.0)
    big_rows = big_rows.at[:, 2].set(jnp.where(big_sel, big_rows[:, 2], -1.0))
    big_rows = jnp.pad(big_rows, ((0, nb_pad - nb), (0, 0)))
    big_rows = big_rows.at[nb:, 2].set(-1.0)
    big_mask = jnp.pad(big_sel.astype(jnp.float32), (0, nb_pad - nb))[:, None]
    n_drop = n_drop + jnp.maximum(jnp.sum(big) - nb, 0)

    ranges = jnp.concatenate(
        [
            jnp.minimum(r_start, n_first).astype(jnp.int32),
            counts3.astype(jnp.int32),
            jnp.zeros((n_tiles, 2), jnp.int32),
        ],
        axis=-1,
    )  # [n_tiles, 8]: starts x3 | counts x3 | pad (ONE SMEM prefetch operand)
    return ranges, payload, big_rows, big_mask, n_drop.astype(jnp.int32), th, tw


def _eval_planes(g, have, px, py):
    """Edge/depth plane eval for an 8-candidate block against all pixels.

    g: [8,PW] payload rows; have: [8,1]; px/py: [1,S^2] absolute pixel
    centers. Returns zm [8,S^2] (depth or +inf where uncovered)."""
    b0 = g[:, 0:1] * px + g[:, 1:2] * py + g[:, 2:3]
    b1 = g[:, 3:4] * px + g[:, 4:5] * py + g[:, 5:6]
    b2 = 1.0 - b0 - b1
    z = g[:, 6:7] * px + g[:, 7:8] * py + g[:, 8:9]
    cov = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (z >= 0) & (z <= 1) & have
    return jnp.where(cov, z, _INF)


def _depth_kernel(tile: int, k: int, nb: int, tw: int):
    s2 = tile * tile

    def kernel(ranges_ref, payload, big_rows, big_mask,
               out_ref, data_s, sems):
        i = pl.program_id(0)
        x0 = (jax.lax.rem(i, tw) * tile).astype(jnp.float32)
        y0 = (jax.lax.div(i, tw) * tile).astype(jnp.float32)
        for r in range(3):
            pltpu.make_async_copy(
                payload.at[pl.ds(ranges_ref[i, r], k)], data_s.at[r],
                sems.at[r],
            ).start()

        p = jax.lax.broadcasted_iota(jnp.int32, (1, s2), 1)
        px = x0 + (p % tile).astype(jnp.float32) + 0.5
        py = y0 + (p // tile).astype(jnp.float32) + 0.5
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        best_z = jnp.full((1, s2), _INF, jnp.float32)
        for r in range(3):
            pltpu.make_async_copy(
                payload.at[pl.ds(ranges_ref[i, r], k)], data_s.at[r],
                sems.at[r],
            ).wait()
            cnt = ranges_ref[i, 3 + r]

            def blk(j, bz, r=r, cnt=cnt):
                g = data_s[r, pl.ds(j * 8, 8), :]
                have = (j * 8 + iota8) < cnt
                zm = _eval_planes(g, have, px, py)
                return jnp.minimum(bz, jnp.min(zm, axis=0, keepdims=True))

            best_z = jax.lax.fori_loop(0, (cnt + 7) // 8, blk, best_z)

        for jb in range(nb // 8):
            g = big_rows[pl.ds(jb * 8, 8), :]
            have = big_mask[pl.ds(jb * 8, 8), :] > 0.5
            zm = _eval_planes(g, have, px, py)
            best_z = jnp.minimum(best_z, jnp.min(zm, axis=0, keepdims=True))

        out_ref[0, 0, :] = jnp.where(best_z[0] >= _INF, 1.0, best_z[0])

    return kernel


def _attr_kernel(tile: int, k: int, nb: int, tw: int, ap: int):
    """Attribute raster kernel. Output per tile [S^2, 2*ap+8]:
    interp | nearest-corner | z | valid | pad."""
    s2 = tile * tile
    used = GEOM_COLS + 3 * ap

    def kernel(ranges_ref, payload, big_rows, big_mask,
               out_ref, data_s, sems):
        i = pl.program_id(0)
        x0 = (jax.lax.rem(i, tw) * tile).astype(jnp.float32)
        y0 = (jax.lax.div(i, tw) * tile).astype(jnp.float32)
        for r in range(3):
            pltpu.make_async_copy(
                payload.at[pl.ds(ranges_ref[i, r], k)], data_s.at[r],
                sems.at[r],
            ).start()

        p = jax.lax.broadcasted_iota(jnp.int32, (1, s2), 1)
        px = x0 + (p % tile).astype(jnp.float32) + 0.5
        py = y0 + (p // tile).astype(jnp.float32) + 0.5
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        best_z = jnp.full((1, s2), _INF, jnp.float32)
        best_i = jnp.full((1, s2), -1, jnp.int32)

        def fold(zm, base, carry):
            bz_c, bi_c = carry
            bz = jnp.min(zm, axis=0, keepdims=True)
            is_min = zm <= bz
            bi = jnp.min(
                jnp.where(is_min, base + iota8, jnp.int32(0x7FFFFFFF)),
                axis=0, keepdims=True,
            )
            upd = bz < bz_c
            return jnp.where(upd, bz, bz_c), jnp.where(upd, bi, bi_c)

        for r in range(3):
            pltpu.make_async_copy(
                payload.at[pl.ds(ranges_ref[i, r], k)], data_s.at[r],
                sems.at[r],
            ).wait()
            cnt = ranges_ref[i, 3 + r]

            def blk(j, carry, r=r, cnt=cnt):
                g = data_s[r, pl.ds(j * 8, 8), :]
                have = (j * 8 + iota8) < cnt
                zm = _eval_planes(g, have, px, py)
                return fold(zm, r * k + j * 8, carry)

            best_z, best_i = jax.lax.fori_loop(
                0, (cnt + 7) // 8, blk, (best_z, best_i)
            )
        for jb in range(nb // 8):
            g = big_rows[pl.ds(jb * 8, 8), :]
            have = big_mask[pl.ds(jb * 8, 8), :] > 0.5
            zm = _eval_planes(g, have, px, py)
            best_z, best_i = fold(zm, 3 * k + jb * 8, (best_z, best_i))

        # winner payload via one-hot MXU selects
        ii = best_i[0][:, None]  # [S^2,1]
        valid = ii >= 0
        kcol = jax.lax.broadcasted_iota(jnp.int32, (s2, k), 1)
        sel = jnp.zeros((s2, used), jnp.float32)
        for r in range(3):
            oh = (ii == (kcol + r * k)).astype(jnp.float32)
            sel = sel + jnp.dot(
                oh, data_s[r, :, 0:used], preferred_element_type=jnp.float32
            )
        bcol = jax.lax.broadcasted_iota(jnp.int32, (s2, nb), 1)
        ohb = (ii == (bcol + 3 * k)).astype(jnp.float32)
        sel = sel + jnp.dot(
            ohb, big_rows[:, 0:used], preferred_element_type=jnp.float32
        )

        # per-pixel interpolation from the winner's planes
        pc = jax.lax.broadcasted_iota(jnp.int32, (s2, 1), 0)
        pxc = x0 + (pc % tile).astype(jnp.float32) + 0.5
        pyc = y0 + (pc // tile).astype(jnp.float32) + 0.5
        b0 = sel[:, 0:1] * pxc + sel[:, 1:2] * pyc + sel[:, 2:3]
        b1 = sel[:, 3:4] * pxc + sel[:, 4:5] * pyc + sel[:, 5:6]
        b2 = 1.0 - b0 - b1
        pb0 = b0 * sel[:, 9:10]
        pb1 = b1 * sel[:, 10:11]
        pb2 = b2 * sel[:, 11:12]
        norm = 1.0 / jnp.maximum(pb0 + pb1 + pb2, 1e-12)
        pb0 = pb0 * norm
        pb1 = pb1 * norm
        pb2 = pb2 * norm
        a0 = sel[:, GEOM_COLS : GEOM_COLS + ap]
        a1 = sel[:, GEOM_COLS + ap : GEOM_COLS + 2 * ap]
        a2 = sel[:, GEOM_COLS + 2 * ap : GEOM_COLS + 3 * ap]
        interp = pb0 * a0 + pb1 * a1 + pb2 * a2
        m01 = pb0 >= pb1
        m = jnp.where(m01, pb0, pb1)
        near = jnp.where(m >= pb2, jnp.where(m01, a0, a1), a2)
        vf = valid.astype(jnp.float32)
        z_out = jnp.where(valid, best_z[0][:, None], 1.0)
        out = jnp.concatenate(
            [interp * vf, near * vf, z_out, vf,
             jnp.zeros((s2, 6), jnp.float32)],
            axis=-1,
        )
        out_ref[0] = out

    return kernel


def _untile(arr, th, tw, tile, height, width):
    extra = arr.shape[2:]
    return (
        arr.reshape((th, tw, tile, tile) + extra)
        .transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(extra))))
        .reshape((th * tile, tw * tile) + extra)[:height, :width]
    )


def _run_depth(ranges, payload, big_rows, big_mask, th, tw, tile, k,
               interpret):
    n_tiles = th * tw
    nb = big_rows.shape[0]
    s2 = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # payload (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s2), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, k, PW), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _depth_kernel(tile, k, nb, tw),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, s2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ranges, payload, big_rows, big_mask)


def _run_attr(ranges, payload, big_rows, big_mask, th, tw, tile, k,
              ap, interpret):
    n_tiles = th * tw
    nb = big_rows.shape[0]
    s2 = tile * tile
    oc = 2 * ap + 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s2, oc), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, k, PW), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _attr_kernel(tile, k, nb, tw, ap),
        out_shape=jax.ShapeDtypeStruct((n_tiles, s2, oc), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ranges, payload, big_rows, big_mask)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile", "k_per_range", "big_budget",
        "cull_backfaces", "interpret",
    ),
)
def rasterize_attributes(
    clip_pos,  # f32[T,3,4]
    tri_active,  # bool[T]
    tri_indices,  # i32[T,3]
    vert_attrs,  # f32[V,A]
    height: int,
    width: int,
    *,
    tile: int = 16,
    k_per_range: int = 256,
    big_budget: int = 64,
    cull_backfaces: bool = True,
    interpret: bool = False,
):
    """Pallas raster with fused attribute interpolation.

    Drop-in analog of raster.rasterize_attributes: returns
    (interp [H,W,A], near [H,W,A], valid [H,W]).
    """
    t = clip_pos.shape[0]
    a_dim = vert_attrs.shape[1]
    clip2, bary2, act2 = clip_triangles_near(clip_pos, tri_active)
    t2 = clip2.shape[0]
    # per-corner attributes of the CLIPPED triangles: bary2-weighted mix of
    # the original corners (slot j's original triangle is j % t)
    vids2 = jnp.concatenate([tri_indices, tri_indices], axis=0)  # [T2,3]
    corner_attrs = vert_attrs[vids2]  # [T2,3,A] (the 3T-row gather)
    attr_c = jnp.einsum("tij,tja->tia", bary2, corner_attrs)
    attr_flat = attr_c.reshape(t2, 3 * a_dim)

    ranges, payload, big_rows, big_mask, n_drop, th, tw = _bin(
        clip2, act2, height, width, tile, k_per_range, big_budget,
        cull_backfaces, attr_flat, n_first=t,
    )
    out = _run_attr(ranges, payload, big_rows, big_mask,
                    th, tw, tile, k_per_range, a_dim, interpret)
    full = _untile(out, th, tw, tile, height, width)
    interp = full[..., 0:a_dim]
    near = full[..., a_dim : 2 * a_dim]
    valid = full[..., 2 * a_dim + 1] > 0.5
    return interp, near, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile", "k_per_range", "big_budget",
        "cull_backfaces", "interpret",
    ),
)
def rasterize_depth(
    clip_pos,  # f32[T,3,4]
    tri_active,  # bool[T]
    height: int,
    width: int,
    *,
    tile: int = 16,
    k_per_range: int = 512,
    big_budget: int = 64,
    cull_backfaces: bool = True,
    interpret: bool = False,
):
    """Pallas depth-only raster (shadow maps). Returns depth f32[H,W].

    The 12-column payload is carried through the binning sort (no gather)."""
    t = clip_pos.shape[0]
    clip2, _, act2 = clip_triangles_near(clip_pos, tri_active)
    ranges, payload, big_rows, big_mask, n_drop, th, tw = _bin(
        clip2, act2, height, width, tile, k_per_range, big_budget,
        cull_backfaces, None, n_first=t,
    )
    out = _run_depth(ranges, payload, big_rows, big_mask,
                     th, tw, tile, k_per_range, interpret)
    return _untile(out[:, 0, :], th, tw, tile, height, width)
