"""Pallas TPU tile rasterizer.

Replaces the XLA tile-binned rasterizer (`raster.py`) on the hot path. The
reference rasterizes on GPU hardware (impact_rendering geometry/shadow passes,
render_command.rs:222-432); the TPU-native design is a screen-tile kernel:

  prologue (XLA):  near-clip -> screen-plane coefficients per triangle ->
                   bin each triangle to the TOP-LEFT tile of its bbox on the
                   FINE (16px) grid, or the COARSE (64px) grid when it spans
                   more than 2x2 fine tiles -> ONE sort by packed
                   (bin << 14 | quantized-z) keys -> per-tile row ranges.
                   The z sub-key only matters under k_per_range overflow
                   (drops farthest-first); the kernel keeps a running z-min.
  kernel (Pallas): per 16x16 tile, DMA the candidate payloads of the 2x2
                   fine AND 2x2 coarse bin neighborhoods (four contiguous,
                   128-aligned column ranges of a LANE-MAJOR [rows, P]
                   payload), evaluate barycentric/depth planes for 128
                   candidates per VPU op with a running (z, payload-index)
                   min, then select the winner's payload per pixel with
                   one-hot MXU matmuls and interpolate attributes
                   in-register.

Measured design rules (v5e, devtools/ benches):
  - lax.sort cost is FLAT in operand count (≤13 ops ≈ 1-op); XLA gathers
    cost ~3 ns per ELEMENT. The depth path therefore carries its 12 payload
    rows THROUGH the sort (free permutation); the attribute path (72 rows —
    a 73-op sort stalls XLA) sorts (key, id) and pays one row gather.
  - Candidates live on LANES: one [S^2, 128] VPU op evaluates a whole
    candidate block against every pixel — per-candidate column extraction
    (the v1 sublane layout) was ~20x slower than the arithmetic.
  - Mosaic cannot DMA at dynamic LANE offsets (memref_slice fails to lower):
    the payload is blocked to [P/128, R, 128] and ranges are floored to
    128-lane block boundaries, so the dynamic slice lands on the LEADING dim
    (the supported pattern); slack lanes are masked in-kernel.
  - Per-pixel attribute fetch is a one-hot [S^2,128] x [rows,128]^T MXU
    matmul per candidate block (take_along_axis lowers to scalar gathers).

Triangles spanning more than 2x2 tiles (ground planes) and the rare second
output of a near-plane quad split go to a 128-lane "big" candidate block
evaluated by every tile.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import _edge, _screen_coords, clip_triangles_near

# payload rows (lane-major f32[R, P]):
#   0:3   Ab0, Bb0, Cb0   barycentric-0 screen plane (b0 = A*px + B*py + C)
#   3:6   Ab1, Bb1, Cb1   barycentric-1 screen plane
#   6:9   ZA, ZB, ZC      NDC-depth screen plane    (z = A*px + B*py + C)
#   9:12  iw0, iw1, iw2   1/clip_w per corner (perspective correction)
#   12:12+3A  per-corner attributes (attribute kernel only)
GEOM_ROWS = 12
_INF = np.float32(3.0e38)
_LANES = 128
_ZKEY_BITS = 14  # quantized-z sub-key: overflow drops farthest-first
_ZKEY_SCALE = float((1 << _ZKEY_BITS) - 2)
# perf-triage toggle (devtools probes only): skip the winner-select phase
_DEBUG_SELECT_OFF = os.environ.get("IMPACT_RASTER_SELECT_OFF", "0") == "1"
# coarse bin class: triangles spanning >2×2 fine tiles but ≤2×2 coarse tiles
# (COARSE_FACTOR× bigger) — e.g. merged flat voxel quads — keep tile-local
# treatment instead of overflowing the global big block
COARSE_FACTOR = 4
_N_WINDOWS = 4  # 2 fine ranges + 2 coarse ranges per tile


# --- SoA (componentwise) prologue -------------------------------------------
# Every [T,3,4]/[T,3,3] intermediate tiles its 3- or 4-wide minor dim to 128
# lanes (a 32-43x memory blowup); clip+plane on those layouts measured ~8.5 ms
# per view at bench scale (devtools/probe_prologue3.py) — the dominant raster
# cost. The SoA path keeps every quantity a flat [T] array.


def _project_soa(tri_pos9, vp):
    """World corner positions [T,9] × vp[4,4] → per-corner clip components
    (four lists of three [T] arrays: x, y, z, w)."""
    vx, vy, vz, vw = [], [], [], []
    for c in range(3):
        px = tri_pos9[:, 3 * c]
        py = tri_pos9[:, 3 * c + 1]
        pz = tri_pos9[:, 3 * c + 2]
        vx.append(vp[0, 0] * px + vp[0, 1] * py + vp[0, 2] * pz + vp[0, 3])
        vy.append(vp[1, 0] * px + vp[1, 1] * py + vp[1, 2] * pz + vp[1, 3])
        vz.append(vp[2, 0] * px + vp[2, 1] * py + vp[2, 2] * pz + vp[2, 3])
        vw.append(vp[3, 0] * px + vp[3, 1] * py + vp[3, 2] * pz + vp[3, 3])
    return vx, vy, vz, vw


def _clip_near_soa(vx, vy, vz, vw, act, eps=1e-6, need_bary=False):
    """Componentwise near-plane clip (same semantics as
    raster.clip_triangles_near). Returns (cx, cy, cz, cw) lists of three
    [2T] arrays, bary[i][c] (3x3 lists of [2T], or None), act2 [2T]."""
    inside = [vz[i] > eps for i in range(3)]
    count = (
        inside[0].astype(jnp.int32)
        + inside[1].astype(jnp.int32)
        + inside[2].astype(jnp.int32)
    )
    # first inside / first outside vertex indices
    k1 = jnp.where(inside[0], 0, jnp.where(inside[1], 1, 2))
    k2 = jnp.where(~inside[0], 0, jnp.where(~inside[1], 1, 2))

    def sel(k, comps, i):
        s = k + i
        s = jnp.where(s >= 3, s - 3, s)
        return jnp.where(
            s == 0, comps[0], jnp.where(s == 1, comps[1], comps[2])
        )

    comps = (vx, vy, vz, vw)

    def rot(k):
        """corner components rotated so vertex k comes first: [4][3] of [T]"""
        return [[sel(k, q, i) for i in range(3)] for q in comps]

    def rot_bary(k):
        """bary[i][c] of the rotated corners (one-hot of source index)."""
        return [
            [
                (jnp.where(k + i >= 3, k + i - 3, k + i) == c).astype(
                    vx[0].dtype
                )
                for c in range(3)
            ]
            for i in range(3)
        ]

    def lerp_t(za, zb):
        d = za - zb
        tt = za / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        return jnp.clip(tt, 0.0, 1.0)

    def mix(a, b, tt):
        return a + tt * (b - a)

    # case count==1: inside vertex first; clip both edges to the near plane
    r1 = rot(k1)
    t_ab = lerp_t(r1[2][0], r1[2][1])
    t_ca = lerp_t(r1[2][0], r1[2][2])
    tri1 = [
        [q[0], mix(q[0], q[1], t_ab), mix(q[0], q[2], t_ca)] for q in r1
    ]

    # case count==2: outside vertex first (a outside; b, c inside)
    r2 = rot(k2)
    t1 = lerp_t(r2[2][1], r2[2][0])  # edge b→a
    t2 = lerp_t(r2[2][2], r2[2][0])  # edge c→a
    jab = [mix(q[1], q[0], t1) for q in r2]
    jca = [mix(q[2], q[0], t2) for q in r2]
    quad1 = [[jab[qi], r2[qi][1], r2[qi][2]] for qi in range(4)]
    quad2 = [[jab[qi], r2[qi][2], jca[qi]] for qi in range(4)]

    c2m = count == 2
    c3m = count == 3
    out1 = [
        [
            jnp.where(
                c3m, comps[qi][i],
                jnp.where(c2m, quad1[qi][i], tri1[qi][i]),
            )
            for i in range(3)
        ]
        for qi in range(4)
    ]
    act1 = act & (count > 0)
    act2_ = act & c2m
    outx = [jnp.concatenate([out1[0][i], quad2[0][i]]) for i in range(3)]
    outy = [jnp.concatenate([out1[1][i], quad2[1][i]]) for i in range(3)]
    outz = [jnp.concatenate([out1[2][i], quad2[2][i]]) for i in range(3)]
    outw = [jnp.concatenate([out1[3][i], quad2[3][i]]) for i in range(3)]
    act_out = jnp.concatenate([act1, act2_])

    bary = None
    if need_bary:
        b1r = rot_bary(k1)
        b2r = rot_bary(k2)
        tri1_b = [
            [
                b1r[0][c],
                mix(b1r[0][c], b1r[1][c], t_ab),
                mix(b1r[0][c], b1r[2][c], t_ca),
            ]
            for c in range(3)
        ]
        jab_b = [mix(b2r[1][c], b2r[0][c], t1) for c in range(3)]
        jca_b = [mix(b2r[2][c], b2r[0][c], t2) for c in range(3)]
        quad1_b = [[jab_b[c], b2r[1][c], b2r[2][c]] for c in range(3)]
        quad2_b = [[jab_b[c], b2r[2][c], jca_b[c]] for c in range(3)]
        eye = [[1.0 if i == c else 0.0 for c in range(3)] for i in range(3)]
        out1_b = [
            [
                jnp.where(
                    c3m,
                    jnp.full_like(vx[0], eye[i][c]),
                    jnp.where(c2m, quad1_b[c][i], tri1_b[c][i]),
                )
                for c in range(3)
            ]
            for i in range(3)
        ]
        bary = [
            [
                jnp.concatenate([out1_b[i][c], quad2_b[c][i]])
                for c in range(3)
            ]
            for i in range(3)
        ]
    return (outx, outy, outz, outw), bary, act_out


def _plane_soa(cx, cy, cz, cw, act2, height, width, cull_backfaces):
    """_plane_coefficients from componentwise clipped corners."""
    sx, sy, z, valid = [], [], [], []
    for i in range(3):
        v = cw[i] > 1e-8
        iw = 1.0 / jnp.where(v, cw[i], 1.0)
        sx.append((cx[i] * iw * 0.5 + 0.5) * width)
        sy.append((0.5 - cy[i] * iw * 0.5) * height)
        z.append(cz[i] * iw)
        valid.append(v)
    act = act2 & valid[0] & valid[1] & valid[2]
    area = _edge(sx[0], sy[0], sx[1], sy[1], sx[2], sy[2])
    if cull_backfaces:
        act = act & (area < -1e-12)
    else:
        act = act & (jnp.abs(area) > 1e-12)

    xmin = jnp.minimum(sx[0], jnp.minimum(sx[1], sx[2]))
    xmax = jnp.maximum(sx[0], jnp.maximum(sx[1], sx[2]))
    ymin = jnp.minimum(sy[0], jnp.minimum(sy[1], sy[2]))
    ymax = jnp.maximum(sy[0], jnp.maximum(sy[1], sy[2]))
    act = act & (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)

    ia = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    ax, ay = sx[0], sy[0]
    bx, by = sx[1], sy[1]
    cx_, cy_ = sx[2], sy[2]
    a0 = -(cy_ - by) * ia
    b0 = (cx_ - bx) * ia
    c0 = (-by * (cx_ - bx) + bx * (cy_ - by)) * ia
    a1 = -(ay - cy_) * ia
    b1 = (ax - cx_) * ia
    c1 = (-cy_ * (ax - cx_) + cx_ * (ay - cy_)) * ia
    za = a0 * (z[0] - z[2]) + a1 * (z[1] - z[2])
    zb = b0 * (z[0] - z[2]) + b1 * (z[1] - z[2])
    zc = c0 * (z[0] - z[2]) + c1 * (z[1] - z[2]) + z[2]
    iws = [1.0 / jnp.maximum(w, 1e-8) for w in cw]

    c0 = jnp.where(act, c0, -1.0)
    a0 = jnp.where(act, a0, 0.0)
    b0 = jnp.where(act, b0, 0.0)

    geom = [a0, b0, c0, a1, b1, c1, za, zb, zc, iws[0], iws[1], iws[2]]
    near_z = jnp.where(
        act, jnp.minimum(z[0], jnp.minimum(z[1], z[2])), jnp.inf
    )
    return geom, act, (xmin, xmax, ymin, ymax), near_z


def _plane_coefficients(clip2, act2, height, width, cull_backfaces):
    """Vectorized per-clipped-triangle screen setup."""
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
    a0 = -(cy - by) * ia
    b0 = (cx - bx) * ia
    c0 = (-by * (cx - bx) + bx * (cy - by)) * ia
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
    """Binning prologue.

    Bins the first ``n_first`` slots to the TOP-LEFT tile of their screen
    bbox (triangles fitting in 2x2 tiles); later slots (near-plane quad
    seconds) and larger triangles go to the 128-lane big block. Returns
    (ranges i32[n_tiles,8], payload_T f32[R, P_pad], big_T f32[R, 128],
    big_mask f32[1,128], n_dropped, th, tw).
    """
    geom, act, bbox, near_z = _plane_coefficients(
        clip2, act2, height, width, cull_backfaces
    )
    return _bin_planes(
        geom, act, bbox, near_z, height, width, tile, k_per_range,
        big_budget, attr_corners, n_first,
    )


def _bin_planes(
    geom, act, bbox, near_z, height, width, tile, k_per_range, big_budget,
    attr_corners, n_first,
):
    """Binning from precomputed screen planes (all flat [T2] arrays)."""
    (xmin, xmax, ymin, ymax) = bbox
    t2 = act.shape[0]
    th = -(-height // tile)
    tw = -(-width // tile)
    n_tiles = th * tw

    tx0 = jnp.clip(jnp.floor(xmin / tile).astype(jnp.int32), 0, tw - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile).astype(jnp.int32), 0, tw - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile).astype(jnp.int32), 0, th - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile).astype(jnp.int32), 0, th - 1)
    # coarse grid (COARSE_FACTOR× bigger tiles): medium triangles — e.g.
    # merged flat quads spanning a few fine tiles — bin there instead of
    # overflowing the 128-lane big block
    ctile = tile * COARSE_FACTOR
    tcw = -(-tw // COARSE_FACTOR)
    tch = -(-th // COARSE_FACTOR)
    n_ctiles = tch * tcw
    cx0 = jnp.clip(jnp.floor(xmin / ctile).astype(jnp.int32), 0, tcw - 1)
    cx1 = jnp.clip(jnp.floor(xmax / ctile).astype(jnp.int32), 0, tcw - 1)
    cy0 = jnp.clip(jnp.floor(ymin / ctile).astype(jnp.int32), 0, tch - 1)
    cy1 = jnp.clip(jnp.floor(ymax / ctile).astype(jnp.int32), 0, tch - 1)

    first = jnp.arange(t2, dtype=jnp.int32) < n_first
    fits_fine = (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
    fits_coarse = (cx1 - cx0 <= 1) & (cy1 - cy0 <= 1)
    small = act & fits_fine & first
    medium = act & ~fits_fine & fits_coarse & first
    big = act & ~small & ~medium

    btile = jnp.where(
        small,
        ty0 * tw + tx0,
        jnp.where(medium, n_tiles + cy0 * tcw + cx0, n_tiles + n_ctiles),
    )

    na = len(attr_corners) if attr_corners is not None else 0
    rows_total = GEOM_ROWS + na
    rows_pad = -(-rows_total // 8) * 8  # Mosaic: slice dims multiple of 8
    # pad so the last range's DMA window (1 + ceil(k/128) blocks from its
    # floored start) stays in bounds
    k_eff = (1 + -(-k_per_range // _LANES)) * _LANES
    p_pad = -(-(n_first + k_eff) // _LANES) * _LANES

    # binning is a PARTITION by bin id; within a bin candidates are ordered
    # nearest-first by a quantized-z sub-key so that k_per_range OVERFLOW
    # drops the FARTHEST candidates (the kernel itself keeps a running z-min,
    # so the order only matters under overflow). 2-op sort (measured:
    # lax.sort cost is flat in operand count ≤13) + one payload row gather.
    zq = jnp.clip(near_z, 0.0, 1.0)
    zq = jnp.where(
        small | medium, (zq * _ZKEY_SCALE).astype(jnp.int32),
        (1 << _ZKEY_BITS) - 1,
    )
    key = (
        btile[:n_first].astype(jnp.uint32) << _ZKEY_BITS
    ) | zq[:n_first].astype(jnp.uint32)
    if attr_corners is None:
        # depth path: carry the 12 geometry rows THROUGH the sort (lax.sort
        # cost is flat in operand count ≤13; a [T,12] row gather costs
        # ~3 ns/ELEMENT on this TPU — the sort permutation is free by
        # comparison) and stack straight into the lane-major layout
        sorted_ops = jax.lax.sort(
            (key, *[g[:n_first] for g in geom]), num_keys=1
        )
        key_s = sorted_ops[0]
        payload = jnp.stack(sorted_ops[1:], axis=0)  # [12, n_first]
        payload = jnp.pad(
            payload, ((0, rows_pad - GEOM_ROWS), (0, p_pad - n_first))
        )
    else:
        # attribute path: sort (key, id), pay ONE row gather for the 72 rows.
        # (Chunked 13-op sorts carrying the rows through would avoid the
        # gather, but each extra multi-operand sort adds ~2 min of XLA compile
        # — measured >15 min for 6 of them — for a few ms of runtime.)
        # ``attr_corners`` is a LIST of 1D [T2] rows (2D column extraction
        # would be a strided relayout).
        key_s, order = jax.lax.sort(
            (key, jnp.arange(n_first, dtype=jnp.int32)), num_keys=1
        )
        full = jnp.stack(list(geom) + list(attr_corners), axis=-1)  # [T2, R]
        payload = full[order].T  # ONE row gather + transpose
        payload = jnp.pad(
            payload, ((0, rows_pad - rows_total), (0, p_pad - n_first))
        )
    tile_s = (key_s >> _ZKEY_BITS).astype(jnp.int32)
    payload = payload.at[2, n_first:].set(-1.0)

    bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + n_ctiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # 4 ranges per tile: fine rows {ty-1, ty} × cols [tx-1, tx], plus the
    # same 2×2 window on the coarse grid (a 2×2-fitting triangle overlapping
    # tile t has its top-left bin within that window)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ttx = tids % tw
    tty = tids // tw
    lo_x = jnp.maximum(ttx - 1, 0)
    rows2 = tty[:, None] + jnp.array([-1, 0], jnp.int32)[None, :]
    row_ok = rows2 >= 0
    rows_c = jnp.maximum(rows2, 0)
    r_start = bounds[rows_c * tw + lo_x[:, None]]
    r_end = bounds[rows_c * tw + ttx[:, None] + 1]
    r_len = jnp.where(row_ok, r_end - r_start, 0)
    # coarse window of this fine tile
    ctx = ttx // COARSE_FACTOR
    cty = tty // COARSE_FACTOR
    lo_cx = jnp.maximum(ctx - 1, 0)
    crows2 = cty[:, None] + jnp.array([-1, 0], jnp.int32)[None, :]
    crow_ok = crows2 >= 0
    crows_c = jnp.maximum(crows2, 0)
    cr_start = bounds[n_tiles + crows_c * tcw + lo_cx[:, None]]
    cr_end = bounds[n_tiles + crows_c * tcw + ctx[:, None] + 1]
    cr_len = jnp.where(crow_ok, cr_end - cr_start, 0)

    starts4 = jnp.concatenate([r_start, cr_start], axis=-1)  # [n_tiles,4]
    lens4 = jnp.concatenate([r_len, cr_len], axis=-1)
    counts4 = jnp.minimum(lens4, k_per_range)
    n_drop = jnp.sum(lens4 - counts4)

    # big block: 128 lanes, nearest-first (top_k, not a full argsort)
    nb = int(min(big_budget, _LANES, t2))
    big_key = jnp.where(big, near_z, jnp.inf)
    _, big_order = jax.lax.top_k(-big_key, nb)
    big_order = big_order.astype(jnp.int32)
    big_sel = big[big_order]
    if attr_corners is None:
        big_rows = jnp.stack([g[big_order] for g in geom], axis=0)  # [12,nb]
    else:
        big_rows = full[big_order].T
    big_rows = jnp.where(big_sel[None, :], big_rows, 0.0)
    big_rows = big_rows.at[2].set(jnp.where(big_sel, big_rows[2], -1.0))
    big_rows = jnp.pad(
        big_rows, ((0, rows_pad - big_rows.shape[0]), (0, _LANES - nb))
    )
    big_rows = big_rows.at[2, nb:].set(-1.0)
    big_mask = jnp.pad(
        big_sel.astype(jnp.float32), (0, _LANES - nb)
    )[None, :]
    n_drop = n_drop + jnp.maximum(jnp.sum(big) - nb, 0)

    ranges = jnp.concatenate(
        [
            jnp.minimum(starts4, n_first).astype(jnp.int32),
            counts4.astype(jnp.int32),
        ],
        axis=-1,
    ).reshape(-1)  # flat [n_tiles*8]: 4 starts then 4 counts per tile (2-D
    # SMEM operands are lane-padded to 128 ints/row — 1-D stays compact)
    # block the lane-major payload to [P/128, R, 128] so the kernel's DMA
    # offset is on the leading dim (Mosaic can't slice at dynamic lane offsets)
    payload_blk = payload.reshape(
        rows_pad, p_pad // _LANES, _LANES
    ).transpose(1, 0, 2)
    return (ranges, payload_blk, big_rows, big_mask,
            n_drop.astype(jnp.int32), th, tw)


def _make_kernel(tile, n_blocks, tw, rows, n_attr, p_pad, skip_empty=True):
    """Kernel factory. ``n_attr`` == 0 -> depth-only.

    Grid steps are SEQUENTIAL on one TensorCore, and the per-step floor (4 DMA
    round trips + loop overhead, ~12 µs measured at tile=16/512²) dominates
    the whole raster at fine tilings. Two mitigations baked in here: candidate
    windows are DOUBLE-BUFFERED (step i starts step i+1's DMAs before waiting
    on its own), and callers use 32-px tiles (4x fewer steps).

    ``skip_empty`` wraps each candidate block in a lax.cond that skips it
    when the range holds no candidates — correctness never depends on it
    (the ``have`` lane masks cover partial blocks)."""
    s2 = tile * tile
    oc = 2 * n_attr + 8 if n_attr else 0

    def maybe(pred, fn, carry):
        if not skip_empty:
            return fn(carry)
        return jax.lax.cond(pred, fn, lambda c: c, carry)

    def kernel(ranges_ref, payload, big_rows, big_mask,
               out_ref, data_s, sems):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)
        x0 = (jax.lax.rem(i, tw) * tile).astype(jnp.float32)
        y0 = (jax.lax.div(i, tw) * tile).astype(jnp.float32)

        def start_dmas(step, buf):
            for r in range(_N_WINDOWS):
                s = ranges_ref[step * 8 + r]
                a = s - jax.lax.rem(s, _LANES)
                pltpu.make_async_copy(
                    payload.at[pl.ds(a // _LANES, n_blocks)],
                    data_s.at[buf, r], sems.at[buf, r],
                ).start()

        @pl.when(i == 0)
        def _():
            start_dmas(i, slot)

        @pl.when(i + 1 < nsteps)
        def _():
            start_dmas(i + 1, nxt)

        aligned = []
        for r in range(_N_WINDOWS):
            s = ranges_ref[i * 8 + r]
            aligned.append(s - jax.lax.rem(s, _LANES))

        pc = jax.lax.broadcasted_iota(jnp.int32, (s2, 1), 0)
        px = x0 + (pc % tile).astype(jnp.float32) + 0.5
        py = y0 + (pc // tile).astype(jnp.float32) + 0.5
        pxy = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1)  # [s2,3]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        def plane(rows3):
            return jax.lax.dot_general(
                pxy, rows3,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [s2, 128]

        def eval_cov(geo, have):
            """(coverage mask, depth) of a [R,128] candidate block. The
            barycentric/depth screen planes are evaluated as MXU matmuls
            (b0 | b1 | z on the lane axis) instead of broadcast VPU
            multiplies — the kernel is eval-bound."""
            b0 = plane(geo[0:3, :])
            b1 = plane(geo[3:6, :])
            z = plane(geo[6:9, :])
            b2 = 1.0 - b0 - b1
            m = jnp.minimum(b0, jnp.minimum(b1, b2))
            cov = (m >= 0) & (z >= 0) & (z <= 1) & have
            return cov, z

        if not n_attr:
            # depth path: plain f32 per-lane running min
            best_z = jnp.full((s2, _LANES), _INF, jnp.float32)
            for r in range(_N_WINDOWS):
                s = ranges_ref[i * 8 + r]
                cnt = ranges_ref[i * 8 + 4 + r]
                a = aligned[r]
                pltpu.make_async_copy(
                    payload.at[pl.ds(a // _LANES, n_blocks)],
                    data_s.at[slot, r], sems.at[slot, r],
                ).wait()
                for j in range(n_blocks):
                    gidx = a + j * _LANES + lane

                    def do(carry, r=r, j=j, gidx=gidx, s=s, cnt=cnt):
                        cov, z = eval_cov(
                            data_s[slot, r, j],
                            (gidx >= s) & (gidx < s + cnt),
                        )
                        return jnp.minimum(carry, jnp.where(cov, z, _INF))

                    best_z = maybe(a + j * _LANES < s + cnt, do, best_z)
            cov, z = eval_cov(big_rows[:, :], big_mask[0:1, :] > 0.5)
            best_z = jnp.minimum(best_z, jnp.where(cov, z, _INF))
            bz = jnp.min(best_z, axis=1, keepdims=True)  # [s2,1]
            out_ref[0, 0, :] = jnp.where(bz[:, 0] >= _INF, 1.0, bz[:, 0])
            return

        # attribute path: the carry is ONE i32 per (pixel, lane) packing
        # (quantized z | window-local candidate position). Carrying a
        # separate winner-index plane measured +24 ms/frame at 1080p (an
        # extra [s2,128] where per block plus a second cross-lane reduce);
        # the packed key costs the same as the depth carry. The z test
        # loses its low 11 mantissa bits (rel. 2.4e-4 — candidates closer
        # in depth than that tie-break by bin order); the OUTPUT depth is
        # re-derived exactly from the winner's plane in the tail.
        # Signed i32 (not u32): Mosaic has no unsigned reductions, and the
        # bitcast of a NON-NEGATIVE f32 (cov requires z >= 0) has sign bit
        # 0, so u32 and i32 order identically here.
        n_parts = _N_WINDOWS * n_blocks + 1
        # window-local positions must fit the key's low bits; larger
        # k_per_range configs pay one more dropped z-test bit per doubling
        pos_bits = max(11, (n_parts * _LANES - 1).bit_length())
        key_inf = jnp.int32(0x7FFFFFFF)
        zmask = jnp.int32((0x7FFFFFFF >> pos_bits) << pos_bits)

        def eval_key(geo, have, part, key):
            cov, z = eval_cov(geo, have)
            zb = jax.lax.bitcast_convert_type(z, jnp.int32)
            k = (zb & zmask) | (jnp.int32(part * _LANES) + lane)
            return jnp.minimum(key, jnp.where(cov, k, key_inf))

        key = jnp.full((s2, _LANES), key_inf, jnp.int32)
        part = 0
        for r in range(_N_WINDOWS):
            s = ranges_ref[i * 8 + r]
            cnt = ranges_ref[i * 8 + 4 + r]
            a = aligned[r]
            pltpu.make_async_copy(
                payload.at[pl.ds(a // _LANES, n_blocks)],
                data_s.at[slot, r], sems.at[slot, r],
            ).wait()
            for j in range(n_blocks):
                gidx = a + j * _LANES + lane

                def do(carry, r=r, j=j, gidx=gidx, s=s, cnt=cnt, part=part):
                    return eval_key(
                        data_s[slot, r, j],
                        (gidx >= s) & (gidx < s + cnt),
                        part, carry,
                    )

                key = maybe(a + j * _LANES < s + cnt, do, key)
                part += 1
        key = eval_key(big_rows[:, :], big_mask[0:1, :] > 0.5, part, key)

        # ONE cross-lane reduce per tile
        bk = jnp.min(key, axis=1, keepdims=True)  # [s2,1] i32
        valid = bk != key_inf
        pos = bk & jnp.int32((1 << pos_bits) - 1)

        def _tail(sel):
            # per-pixel interpolation from the winner's planes
            b0 = sel[:, 0:1] * px + sel[:, 1:2] * py + sel[:, 2:3]
            b1 = sel[:, 3:4] * px + sel[:, 4:5] * py + sel[:, 5:6]
            b2 = 1.0 - b0 - b1
            pb0 = b0 * sel[:, 9:10]
            pb1 = b1 * sel[:, 10:11]
            pb2 = b2 * sel[:, 11:12]
            norm = 1.0 / jnp.maximum(pb0 + pb1 + pb2, 1e-12)
            pb0 = pb0 * norm
            pb1 = pb1 * norm
            pb2 = pb2 * norm
            a0 = sel[:, GEOM_ROWS : GEOM_ROWS + n_attr]
            a1 = sel[:, GEOM_ROWS + n_attr : GEOM_ROWS + 2 * n_attr]
            a2 = sel[:, GEOM_ROWS + 2 * n_attr : GEOM_ROWS + 3 * n_attr]
            interp = pb0 * a0 + pb1 * a1 + pb2 * a2
            m01 = pb0 >= pb1
            m = jnp.where(m01, pb0, pb1)
            near = jnp.where(m >= pb2, jnp.where(m01, a0, a1), a2)
            vf = valid.astype(jnp.float32)
            # exact depth from the winner's plane (the carried key only
            # kept 12 mantissa bits for the z TEST)
            z_exact = sel[:, 6:7] * px + sel[:, 7:8] * py + sel[:, 8:9]
            z_out = jnp.where(valid, z_exact, 1.0)
            out = jnp.concatenate(
                [interp * vf, near * vf, z_out, vf,
                 jnp.zeros((s2, 6), jnp.float32)],
                axis=-1,
            )
            out_ref[0] = out

        if _DEBUG_SELECT_OFF:
            # perf-triage mode: winner payload zeroed (isolates the select
            # phase's cost from the best_i carry + interpolation tail)
            return _tail(jnp.zeros((s2, rows), jnp.float32))
        # ---- winner payload: per-part one-hot MXU selects over the SAME
        # occupied blocks the eval visited, guarded by the SAME block
        # conditions (a part whose block held no candidates cannot own a
        # winner, and most tiles touch few blocks — candidates are z-sorted
        # nearest-first). The one-hot compares the FULL packed position
        # (part·128 + lane): one [s2,128] compare + one [s2,128]x[rows,128]
        # matmul per OCCUPIED part. A monolithic two-level select (one
        # [s2, n_parts·128] matmul over every part) measured ~2x slower at
        # 1080p: it pays for all n_parts regardless of occupancy. ----
        if os.environ.get("IMPACT_RASTER_SELECT_MONO", "0") == "1":
            # A/B-probe variant (devtools only): monolithic two-level select
            parts = []
            for r in range(_N_WINDOWS):
                for j in range(n_blocks):
                    parts.append(
                        jnp.pad(data_s[slot, r, j], ((0, _LANES - rows), (0, 0)))
                    )
            parts.append(jnp.pad(big_rows[:, :], ((0, _LANES - rows), (0, 0))))
            cat2 = jnp.concatenate(parts, axis=0)  # [n_parts·128, 128]
            lane_oh = (jax.lax.rem(pos, _LANES) == lane).astype(jnp.float32)
            t1 = jax.lax.dot_general(
                lane_oh, cat2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [s2, n_parts·128]
            blk = jax.lax.div(pos, _LANES)  # [s2,1] winner part
            sel128 = jnp.zeros((s2, _LANES), jnp.float32)
            for b in range(n_parts):
                inb = (blk == b).astype(jnp.float32)
                sel128 = sel128 + inb * t1[:, b * _LANES : (b + 1) * _LANES]
            return _tail(sel128[:, :rows])
        sel = jnp.zeros((s2, rows), jnp.float32)
        part = 0
        for r in range(_N_WINDOWS):
            s = ranges_ref[i * 8 + r]
            cnt = ranges_ref[i * 8 + 4 + r]
            a = aligned[r]
            for j in range(n_blocks):

                def sel_do(acc, r=r, j=j, part=part):
                    oh = (pos == jnp.int32(part * _LANES) + lane)
                    return acc + jax.lax.dot_general(
                        oh.astype(jnp.float32), data_s[slot, r, j],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                sel = maybe(a + j * _LANES < s + cnt, sel_do, sel)
                part += 1
        ohb = (pos == jnp.int32(part * _LANES) + lane).astype(jnp.float32)
        sel = sel + jax.lax.dot_general(
            ohb, big_rows[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _tail(sel)

    return kernel, oc


def _run(ranges, payload, big_rows, big_mask, th, tw, tile, k_per_range,
         n_attr, interpret, skip_empty=True):
    n_tiles = th * tw
    rows = payload.shape[1]  # payload is blocked [NB, R, 128]
    p_pad = payload.shape[0] * _LANES
    s2 = tile * tile
    # DMA window: a range starts <128 lanes into its first block and holds
    # up to k_per_range candidates
    n_blocks = 1 + -(-k_per_range // _LANES)
    kernel, oc = _make_kernel(tile, n_blocks, tw, rows, n_attr, p_pad,
                              skip_empty)
    if n_attr:
        out_shape = jax.ShapeDtypeStruct((n_tiles, s2, oc), jnp.float32)
        out_spec = pl.BlockSpec((1, s2, oc), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n_tiles, 1, s2), jnp.float32)
        out_spec = pl.BlockSpec((1, 1, s2), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # payload (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # big rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # big mask
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, _N_WINDOWS, n_blocks, rows, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _N_WINDOWS)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(ranges, payload, big_rows, big_mask)


def _untile(arr, th, tw, tile, height, width):
    extra = arr.shape[2:]
    return (
        arr.reshape((th, tw, tile, tile) + extra)
        .transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(extra))))
        .reshape((th * tile, tw * tile) + extra)[:height, :width]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile", "k_per_range", "big_budget",
        "cull_backfaces", "interpret", "corner_major", "return_drops",
    ),
)
def rasterize_attributes(
    clip_pos,  # f32[T,3,4]
    tri_active,  # bool[T]
    tri_indices,  # i32[T,3] (ignored when corner_major)
    vert_attrs,  # f32[V,A]; corner_major: f32[T, 3A], [:, c*A:(c+1)*A] = corner c
    height: int,
    width: int,
    *,
    tile: int = 16,
    k_per_range: int = 128,
    big_budget: int = 128,
    cull_backfaces: bool = True,
    interpret: bool = False,
    corner_major: bool = False,
    return_drops: bool = False,
):
    """Pallas raster with fused attribute interpolation.

    Drop-in analog of raster.rasterize_attributes: returns
    (interp [H,W,A], near [H,W,A], valid [H,W]). With ``corner_major`` the
    vertex attributes are already laid out per triangle corner
    (vert_attrs[3*t + i] = corner i of triangle t) and no gather is needed.
    With ``return_drops`` a fourth output n_drop (i32 scalar) counts raster
    candidates lost to per-tile k_per_range overflow (farthest-first) or
    big-block overflow — callers surface it ("no silent caps").
    """
    t = clip_pos.shape[0]
    clip2, bary2, act2 = clip_triangles_near(clip_pos, tri_active)
    t2 = clip2.shape[0]
    # per-ORIGINAL-corner attrs as three 2D [T2,A] arrays. 3D [T2,3,A]
    # intermediates pad every A-float row to 128 lanes and relayout
    # repeatedly (~150 ms at bench scale, devtools/probe_attr_ops.py) —
    # all ops here stay 2D with ≤1 lane-tile columns.
    if corner_major:
        a_dim = vert_attrs.shape[1] // 3
        ca = [
            jnp.concatenate(
                [vert_attrs[:, c * a_dim : (c + 1) * a_dim]] * 2, axis=0
            )
            for c in range(3)
        ]
    else:
        a_dim = vert_attrs.shape[1]
        ca = [
            jnp.concatenate([vert_attrs[tri_indices[:, c]]] * 2, axis=0)
            for c in range(3)
        ]
    # attrs of the CLIPPED corners as a LIST of 1D rows (sort operands):
    # attr row (i, j) = Σ_c bary2[:,i,c] · corner_c[:,j]
    bw = [[bary2[:, i, c] for c in range(3)] for i in range(3)]
    attr_rows = [
        bw[i][0] * ca[0][:, j] + bw[i][1] * ca[1][:, j] + bw[i][2] * ca[2][:, j]
        for i in range(3)
        for j in range(a_dim)
    ]

    ranges, payload, big_rows, big_mask, n_drop, th, tw = _bin(
        clip2, act2, height, width, tile, k_per_range, big_budget,
        cull_backfaces, attr_rows, n_first=t,
    )
    out = _run(ranges, payload, big_rows, big_mask, th, tw, tile,
               k_per_range, a_dim, interpret)
    full = _untile(out, th, tw, tile, height, width)
    interp = full[..., 0:a_dim]
    near = full[..., a_dim : 2 * a_dim]
    valid = full[..., 2 * a_dim + 1] > 0.5
    if return_drops:
        return interp, near, valid, n_drop
    return interp, near, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile", "k_per_range", "big_budget",
        "cull_backfaces", "interpret", "return_drops",
    ),
)
def rasterize_attributes_pos(
    tri_pos9,  # f32[T,9] world corner positions (corner-major)
    tri_active,  # bool[T]
    vert_attrs,  # f32[T, 3A] corner-major attributes
    vp,  # f32[4,4] view-projection
    height: int,
    width: int,
    *,
    tile: int = 16,
    k_per_range: int = 128,
    big_budget: int = 128,
    cull_backfaces: bool = True,
    interpret: bool = False,
    return_drops: bool = False,
):
    """SoA-prologue attribute raster: projection, near clip, and screen-plane
    setup run on flat [T] component arrays (the [T,3,4] forms tile their
    minor dims to 128 lanes — a 32-43x memory blowup measured at ~8.5 ms per
    view, devtools/probe_prologue3.py). Output identical to
    rasterize_attributes(project_corners(tri_pos9, vp), ...). With
    ``return_drops`` a fourth output n_drop counts candidates lost to
    k_per_range/big-block overflow."""
    t = tri_pos9.shape[0]
    vx, vy, vz, vw = _project_soa(tri_pos9, vp)
    (cx, cy, cz, cw), bary, act2 = _clip_near_soa(
        vx, vy, vz, vw, tri_active, need_bary=True
    )
    a_dim = vert_attrs.shape[1] // 3
    ca = [
        jnp.concatenate([vert_attrs[:, c * a_dim : (c + 1) * a_dim]] * 2,
                        axis=0)
        for c in range(3)
    ]
    attr_rows = [
        bary[i][0] * ca[0][:, j] + bary[i][1] * ca[1][:, j]
        + bary[i][2] * ca[2][:, j]
        for i in range(3)
        for j in range(a_dim)
    ]
    geom, act, bbox, near_z = _plane_soa(
        cx, cy, cz, cw, act2, height, width, cull_backfaces
    )
    ranges, payload, big_rows, big_mask, n_drop, th, tw = _bin_planes(
        geom, act, bbox, near_z, height, width, tile, k_per_range,
        big_budget, attr_rows, n_first=t,
    )
    out = _run(ranges, payload, big_rows, big_mask, th, tw, tile,
               k_per_range, a_dim, interpret)
    full = _untile(out, th, tw, tile, height, width)
    interp = full[..., 0:a_dim]
    near = full[..., a_dim : 2 * a_dim]
    valid = full[..., 2 * a_dim + 1] > 0.5
    if return_drops:
        return interp, near, valid, n_drop
    return interp, near, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile", "k_per_range", "big_budget",
        "cull_backfaces", "interpret", "return_drops",
    ),
)
def rasterize_depth_pos(
    tri_pos9,  # f32[T,9] world corner positions (corner-major)
    tri_active,  # bool[T]
    vp,  # f32[4,4] view-projection
    height: int,
    width: int,
    *,
    tile: int = 16,
    k_per_range: int = 128,
    big_budget: int = 128,
    cull_backfaces: bool = True,
    interpret: bool = False,
    return_drops: bool = False,
):
    """SoA-prologue depth raster (shadow maps). Returns depth f32[H,W]
    (with ``return_drops``: (depth, n_drop))."""
    t = tri_pos9.shape[0]
    vx, vy, vz, vw = _project_soa(tri_pos9, vp)
    (cx, cy, cz, cw), _, act2 = _clip_near_soa(
        vx, vy, vz, vw, tri_active, need_bary=False
    )
    geom, act, bbox, near_z = _plane_soa(
        cx, cy, cz, cw, act2, height, width, cull_backfaces
    )
    ranges, payload, big_rows, big_mask, n_drop, th, tw = _bin_planes(
        geom, act, bbox, near_z, height, width, tile, k_per_range,
        big_budget, None, n_first=t,
    )
    out = _run(ranges, payload, big_rows, big_mask, th, tw, tile,
               k_per_range, 0, interpret)
    depth = _untile(out[:, 0, :], th, tw, tile, height, width)
    if return_drops:
        return depth, n_drop
    return depth


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile", "k_per_range", "big_budget",
        "cull_backfaces", "interpret", "return_drops",
    ),
)
def rasterize_depth(
    clip_pos,  # f32[T,3,4]
    tri_active,  # bool[T]
    height: int,
    width: int,
    *,
    tile: int = 16,
    k_per_range: int = 128,
    big_budget: int = 128,
    cull_backfaces: bool = True,
    interpret: bool = False,
    return_drops: bool = False,
):
    """Pallas depth-only raster (shadow maps). Returns depth f32[H,W]
    (with ``return_drops``: (depth, n_drop)).

    The 12-row payload is carried through the binning sort (no gather)."""
    t = clip_pos.shape[0]
    clip2, _, act2 = clip_triangles_near(clip_pos, tri_active)
    ranges, payload, big_rows, big_mask, n_drop, th, tw = _bin(
        clip2, act2, height, width, tile, k_per_range, big_budget,
        cull_backfaces, None, n_first=t,
    )
    out = _run(ranges, payload, big_rows, big_mask, th, tw, tile,
               k_per_range, 0, interpret)
    depth = _untile(out[:, 0, :], th, tw, tile, height, width)
    if return_drops:
        return depth, n_drop
    return depth
