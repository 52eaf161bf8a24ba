"""Triangle rasterization as fused XLA reductions.

Replaces the reference's wgpu hardware raster passes (ref:
impact_rendering/src/render_command/geometry_pass.rs and the shadow-map update
passes). TPU redesign (SURVEY.md §7.3.4): rasterization is a z-buffered
reduction — triangles are processed in fixed-size chunks against the whole
pixel grid; each chunk computes coverage + depth and folds a (depth, tri_id)
min-reduction into the framebuffer. A second resolve pass recomputes
barycentrics for each pixel's winning triangle and interpolates vertex
attributes. Everything is dense, masked, and static-shaped; XLA pipelines the
chunk loop, and the hot inner product (edge functions over pixels×triangles)
vectorizes on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NO_TRI = np.int32(-1)


class RasterTarget(NamedTuple):
    depth: jnp.ndarray  # f32[H,W] NDC depth in [0,1], 1 = far (cleared)
    tri_id: jnp.ndarray  # i32[H,W] winning triangle slot or −1


def clear_target(height: int, width: int) -> RasterTarget:
    """Clear depth to 1.0 (ref: clearing_pass.rs:20 CLEAR_DEPTH = 1.0)."""
    return RasterTarget(
        depth=jnp.ones((height, width), jnp.float32),
        tri_id=jnp.full((height, width), NO_TRI),
    )


def _edge(ax, ay, bx, by, px, py):
    """2D edge function: cross((b-a), (p-a)); >0 for CCW-left."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def clip_triangles_near(clip_pos, tri_active, eps: float = 1e-6):
    """Clip triangles against the near plane (clip z = 0, wgpu convention).

    Returns (clip2 [2T,3,4], bary2 [2T,3,3], active2 [2T]) where slot t holds
    the first output triangle of input t and slot t+T the second (from the
    quad case). ``bary2[j, i]`` are vertex i's barycentric weights w.r.t. the
    ORIGINAL triangle j % T, so attribute interpolation can keep using the
    original per-vertex data.
    """
    t = clip_pos.shape[0]
    z = clip_pos[..., 2]  # [T,3]
    inside = z > eps
    count = jnp.sum(inside, axis=-1)  # [T]

    eye3 = jnp.eye(3, dtype=clip_pos.dtype)

    def rotated(k):
        """Vertices and identity barys rotated so vertex k comes first.

        One-hot matmul selection: take_along_axis with a lane-broadcast index
        lowers to per-element gathers on TPU (~10x slower)."""
        idx = (k[:, None] + jnp.arange(3)[None, :]) % 3  # [T,3]
        oh = (idx[..., None] == jnp.arange(3)[None, None, :]).astype(
            clip_pos.dtype
        )  # [T,3,3]; row i of oh IS vertex (k+i)%3's bary weights
        v = jnp.einsum("tij,tjc->tic", oh, clip_pos)
        return v, oh

    def lerp(va, ba, vb, bb):
        """Near-plane intersection on edge a→b (in clip + bary space)."""
        za, zb = va[..., 2], vb[..., 2]
        tt = za / jnp.where(jnp.abs(za - zb) < 1e-12, 1e-12, za - zb)
        tt = jnp.clip(tt, 0.0, 1.0)[..., None]
        return va + tt * (vb - va), ba + tt * (bb - ba)

    # case count==1: single inside vertex first
    k1 = jnp.argmax(inside, axis=-1)
    v1, b1 = rotated(k1)
    i_ab_v, i_ab_b = lerp(v1[:, 0], b1[:, 0], v1[:, 1], b1[:, 1])
    i_ca_v, i_ca_b = lerp(v1[:, 0], b1[:, 0], v1[:, 2], b1[:, 2])
    tri1_v = jnp.stack([v1[:, 0], i_ab_v, i_ca_v], axis=1)
    tri1_b = jnp.stack([b1[:, 0], i_ab_b, i_ca_b], axis=1)

    # case count==2: single outside vertex first (a outside, b,c inside)
    k2 = jnp.argmax(~inside, axis=-1)
    v2, b2 = rotated(k2)
    j_ab_v, j_ab_b = lerp(v2[:, 1], b2[:, 1], v2[:, 0], b2[:, 0])  # enters at a→b edge
    j_ca_v, j_ca_b = lerp(v2[:, 2], b2[:, 2], v2[:, 0], b2[:, 0])
    quad_t1_v = jnp.stack([j_ab_v, v2[:, 1], v2[:, 2]], axis=1)
    quad_t1_b = jnp.stack([j_ab_b, b2[:, 1], b2[:, 2]], axis=1)
    quad_t2_v = jnp.stack([j_ab_v, v2[:, 2], j_ca_v], axis=1)
    quad_t2_b = jnp.stack([j_ab_b, b2[:, 2], j_ca_b], axis=1)

    full_b = jnp.broadcast_to(eye3[None], (t, 3, 3))

    c1 = (count == 1)[:, None, None]
    c2 = (count == 2)[:, None, None]
    c3 = (count == 3)[:, None, None]
    out1_v = jnp.where(c3, clip_pos, jnp.where(c2, quad_t1_v, tri1_v))
    out1_b = jnp.where(c3, full_b, jnp.where(c2, quad_t1_b, tri1_b))
    out1_act = tri_active & (count > 0)
    out2_v = quad_t2_v
    out2_b = quad_t2_b
    out2_act = tri_active & (count == 2)

    clip2 = jnp.concatenate([out1_v, out2_v], axis=0)
    bary2 = jnp.concatenate([out1_b, out2_b], axis=0)
    act2 = jnp.concatenate([out1_act, out2_act], axis=0)
    return clip2, bary2, act2


def rasterize(
    clip_pos,  # f32[T,3,4] clip-space vertex positions per triangle
    tri_active,  # bool[T]
    height: int,
    width: int,
    chunk: int = 256,
    cull_backfaces: bool = True,
    method: str = "tiled",
    k_per_tile: int | None = None,
    big_budget: int = 32,
    tiles_per_chunk: int | None = None,
):
    """Z-buffer rasterization of T triangle slots into an H×W target.

    clip positions follow wgpu conventions: x,y ∈ [−w,w] mapping to screen,
    z ∈ [0,w] mapping to depth [0,1], y up. Triangles are clipped against the
    near plane first (2T clipped slots). Returns
    (RasterTarget with tri_id indexing CLIPPED slots, clip2, bary2) —
    feed clip2/bary2 to :func:`resolve_barycentrics`.

    ``method``: "tiled" (default) bins triangles into screen tiles and
    rasterizes each tile against only its binned triangles — the TPU analog of
    the reference's GPU chunk culling + hardware raster; "chunk" is the
    brute-force all-triangles × all-pixels reduction (reference oracle).
    """
    clip2, bary2, act2 = clip_triangles_near(clip_pos, tri_active)
    if method == "tiled":
        target = _rasterize_clipped_tiled(
            clip2, act2, height, width, cull_backfaces=cull_backfaces,
            k_per_tile=k_per_tile, big_budget=big_budget,
            tiles_per_chunk=tiles_per_chunk,
        )
    else:
        target = _rasterize_clipped(clip2, act2, height, width, chunk, cull_backfaces)
    return target, clip2, bary2


def _screen_coords(cp, height: int, width: int):
    """clip [...,4] → (sx, sy, z_ndc, valid). y flipped: row 0 = top."""
    w = cp[..., 3]
    valid = w > 1e-8
    inv_w = 1.0 / jnp.where(valid, w, 1.0)
    x = cp[..., 0] * inv_w
    y = cp[..., 1] * inv_w
    z = cp[..., 2] * inv_w
    sx = (x * 0.5 + 0.5) * width
    sy = (0.5 - y * 0.5) * height
    return sx, sy, z, valid


def _rasterize_clipped_tiled(
    clip_pos,  # f32[T2,3,4] (near-clipped slots)
    tri_active,  # bool[T2]
    height: int,
    width: int,
    tile: int = 32,
    k_per_tile: int | None = None,
    big_budget: int = 32,
    tiles_per_chunk: int | None = None,
    cull_backfaces: bool = True,
) -> RasterTarget:
    """Tile-binned z-buffer raster.

    Small triangles (screen bbox spanning ≤2×2 tiles) are binned into
    (tile, triangle) pairs, sorted by (tile, depth) so each tile keeps its
    nearest ``k_per_tile`` candidates, and rasterized tile-locally. Triangles
    spanning more tiles (ground planes, extreme close-ups — rare) are
    appended to EVERY tile's candidate list through ``big_budget`` global
    slots. Sizes are static; overflow drops the FARTHEST candidates (per tile
    for small ones, globally for big ones), which the z-buffer would almost
    always discard anyway.
    """
    t2 = clip_pos.shape[0]
    th = -(-height // tile)
    tw = -(-width // tile)
    n_tiles = th * tw
    if k_per_tile is None:
        # enough per-tile slots that a dense mesh cannot overflow a tile at
        # low resolutions (few tiles → high triangle density per tile);
        # overflow degrades gracefully (nearest-K kept). At many-tile targets
        # a 512 cap measured faster than 1024 with zero coverage loss even at
        # ~500k active triangles (nearest-K keeps the visible surface).
        cap = 1024 if n_tiles < 256 else 512
        k_per_tile = int(min(cap, max(128, (2 * t2) // max(n_tiles, 1))))
    if tiles_per_chunk is None:
        # fewer, fatter loop iterations amortize per-iteration overhead;
        # bounded so the [TC, K, tile²] intermediates stay ~100 MB
        tiles_per_chunk = max(8, min(128, n_tiles, (1 << 25) // (k_per_tile * tile * tile)))

    sx, sy, z, valid = _screen_coords(clip_pos, height, width)  # [T2,3]
    act = tri_active & jnp.all(valid, axis=-1)
    area = _edge(sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2])
    if cull_backfaces:
        act = act & (area < -1e-12)
    else:
        act = act & (jnp.abs(area) > 1e-12)

    # screen bbox → tile span
    xmin = jnp.min(sx, axis=-1)
    xmax = jnp.max(sx, axis=-1)
    ymin = jnp.min(sy, axis=-1)
    ymax = jnp.max(sy, axis=-1)
    on_screen = (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)
    act = act & on_screen
    tx0 = jnp.clip(jnp.floor(xmin / tile).astype(jnp.int32), 0, tw - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile).astype(jnp.int32), 0, tw - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile).astype(jnp.int32), 0, th - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile).astype(jnp.int32), 0, th - 1)
    small = act & (tx1 - tx0 < 2) & (ty1 - ty0 < 2)
    big = act & ~small

    # --- bin small triangles: up to 4 (tile, tri) pairs each ----------------
    ddx = jnp.array([0, 1, 0, 1], jnp.int32)
    ddy = jnp.array([0, 0, 1, 1], jnp.int32)
    ptx = tx0[:, None] + ddx[None, :]  # [T2,4]
    pty = ty0[:, None] + ddy[None, :]
    pair_ok = (
        small[:, None]
        & (ptx <= tx1[:, None])
        & (pty <= ty1[:, None])
    )
    pair_tile = jnp.where(pair_ok, pty * tw + ptx, n_tiles).reshape(-1)  # [4T2]
    tri_near_z = jnp.min(z, axis=-1)
    pair_depth = jnp.broadcast_to(tri_near_z[:, None], (t2, 4)).reshape(-1)
    pair_tri = jnp.broadcast_to(
        jnp.arange(t2, dtype=jnp.int32)[:, None], (t2, 4)
    ).reshape(-1)
    tile_sorted, _, tri_sorted = jax.lax.sort(
        (pair_tile, pair_depth, pair_tri), num_keys=2
    )
    starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles, dtype=jnp.int32))
    ends = jnp.searchsorted(
        tile_sorted, jnp.arange(n_tiles, dtype=jnp.int32), side="right"
    )
    counts = (ends - starts).astype(jnp.int32)

    # big triangles: nearest-first global candidate list shared by every tile
    nb = min(big_budget, t2)
    big_key = jnp.where(big, tri_near_z, jnp.inf)
    big_order = jnp.argsort(big_key)[:nb].astype(jnp.int32)
    big_sel = big[big_order]  # [B]

    # gather triangle screen data once (flat, reused by every tile chunk)
    ax, ay, az = sx[:, 0], sy[:, 0], z[:, 0]
    bx, by, bz = sx[:, 1], sy[:, 1], z[:, 1]
    cx, cy, cz = sx[:, 2], sy[:, 2], z[:, 2]
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)

    n_chunks = -(-n_tiles // tiles_per_chunk)
    n_tiles_pad = n_chunks * tiles_per_chunk
    starts = jnp.pad(starts, (0, n_tiles_pad - n_tiles))
    counts = jnp.pad(counts, (0, n_tiles_pad - n_tiles))
    tile_x0 = (jnp.arange(n_tiles_pad, dtype=jnp.int32) % tw) * tile
    tile_y0 = (jnp.arange(n_tiles_pad, dtype=jnp.int32) // tw) * tile

    # flat in-tile pixel centers [S²]
    lx = (jnp.arange(tile, dtype=jnp.float32) + 0.5)[None, :]
    ly = (jnp.arange(tile, dtype=jnp.float32) + 0.5)[:, None]
    lx = jnp.broadcast_to(lx, (tile, tile)).reshape(-1)
    ly = jnp.broadcast_to(ly, (tile, tile)).reshape(-1)

    k = k_per_tile
    tc = tiles_per_chunk

    def chunk_body(ci, out):
        depth_out, tri_out = out
        s0 = ci * tc
        st = jax.lax.dynamic_slice(starts, (s0,), (tc,))  # [TC]
        cn = jax.lax.dynamic_slice(counts, (s0,), (tc,))
        x0 = jax.lax.dynamic_slice(tile_x0, (s0,), (tc,)).astype(jnp.float32)
        y0 = jax.lax.dynamic_slice(tile_y0, (s0,), (tc,)).astype(jnp.float32)

        idx = st[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]  # [TC,K]
        have = jnp.arange(k, dtype=jnp.int32)[None, :] < cn[:, None]
        idx = jnp.clip(idx, 0, tri_sorted.shape[0] - 1)
        tri = tri_sorted[idx]  # [TC,K] clipped-slot ids
        # append the global big-triangle candidates to every tile
        tri = jnp.concatenate(
            [tri, jnp.broadcast_to(big_order[None, :], (tc, nb))], axis=1
        )
        have = jnp.concatenate(
            [have, jnp.broadcast_to(big_sel[None, :], (tc, nb))], axis=1
        )

        # per-candidate screen coords relative to tile origin
        rax = ax[tri] - x0[:, None]
        ray = ay[tri] - y0[:, None]
        rbx = bx[tri] - x0[:, None]
        rby = by[tri] - y0[:, None]
        rcx = cx[tri] - x0[:, None]
        rcy = cy[tri] - y0[:, None]
        ia = inv_area[tri]
        z0 = az[tri]
        z1 = bz[tri]
        z2 = cz[tri]

        pxe = lx[None, None, :]  # [1,1,S²]
        pye = ly[None, None, :]
        w0 = _edge(rbx[..., None], rby[..., None], rcx[..., None], rcy[..., None], pxe, pye)
        w1 = _edge(rcx[..., None], rcy[..., None], rax[..., None], ray[..., None], pxe, pye)
        w2 = _edge(rax[..., None], ray[..., None], rbx[..., None], rby[..., None], pxe, pye)
        b0 = w0 * ia[..., None]
        b1 = w1 * ia[..., None]
        b2 = w2 * ia[..., None]
        covered = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & have[..., None]
        zpix = b0 * z0[..., None] + b1 * z1[..., None] + b2 * z2[..., None]
        covered = covered & (zpix >= 0.0) & (zpix <= 1.0)
        zpix = jnp.where(covered, zpix, jnp.inf)  # [TC,K,S²]

        best = jnp.argmin(zpix, axis=1)  # [TC,S²]
        best_z = jnp.take_along_axis(zpix, best[:, None, :], axis=1)[:, 0, :]
        best_tri = jnp.take_along_axis(tri, best, axis=1)  # [TC,S²] clipped ids
        best_tri = jnp.where(jnp.isfinite(best_z), best_tri, NO_TRI)
        best_z = jnp.where(jnp.isfinite(best_z), best_z, 1.0)

        depth_out = jax.lax.dynamic_update_slice(depth_out, best_z, (s0, 0))
        tri_out = jax.lax.dynamic_update_slice(tri_out, best_tri, (s0, 0))
        return depth_out, tri_out

    depth_tiles, tri_tiles = jax.lax.fori_loop(
        0,
        n_chunks,
        chunk_body,
        (
            jnp.ones((n_tiles_pad, tile * tile), jnp.float32),
            jnp.full((n_tiles_pad, tile * tile), NO_TRI),
        ),
    )
    # [n_tiles_pad, S²] → [TH, TW, S, S] → [TH·S, TW·S] → crop
    depth = (
        depth_tiles[:n_tiles]
        .reshape(th, tw, tile, tile)
        .transpose(0, 2, 1, 3)
        .reshape(th * tile, tw * tile)[:height, :width]
    )
    tri_id = (
        tri_tiles[:n_tiles]
        .reshape(th, tw, tile, tile)
        .transpose(0, 2, 1, 3)
        .reshape(th * tile, tw * tile)[:height, :width]
    )
    return RasterTarget(depth=depth, tri_id=tri_id)


def _rasterize_clipped(
    clip_pos, tri_active, height: int, width: int, chunk: int = 256,
    cull_backfaces: bool = True,
) -> RasterTarget:
    t = clip_pos.shape[0]
    n_chunks = -(-t // chunk)
    pad = n_chunks * chunk - t
    clip_pos = jnp.pad(clip_pos, ((0, pad), (0, 0), (0, 0)))
    tri_active = jnp.pad(tri_active, (0, pad))

    # pixel centers in screen space
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (height, width))
    py = jnp.broadcast_to(py, (height, width))

    def screen_coords(cp):
        """clip [...,4] → (sx, sy, z_ndc, valid). y flipped: row 0 = top."""
        w = cp[..., 3]
        valid = w > 1e-8
        inv_w = 1.0 / jnp.where(valid, w, 1.0)
        x = cp[..., 0] * inv_w
        y = cp[..., 1] * inv_w
        z = cp[..., 2] * inv_w
        sx = (x * 0.5 + 0.5) * width
        sy = (0.5 - y * 0.5) * height
        return sx, sy, z, valid

    def chunk_body(i, target):
        depth_buf, tri_buf = target
        cp = jax.lax.dynamic_slice(
            clip_pos, (i * chunk, 0, 0), (chunk, 3, 4)
        )
        act = jax.lax.dynamic_slice(tri_active, (i * chunk,), (chunk,))
        sx, sy, z, valid = screen_coords(cp)  # [chunk,3]
        act = act & jnp.all(valid, axis=-1)

        ax, ay, az = sx[:, 0], sy[:, 0], z[:, 0]
        bx, by, bz = sx[:, 1], sy[:, 1], z[:, 1]
        cx, cy, cz = sx[:, 2], sy[:, 2], z[:, 2]
        area = _edge(ax, ay, bx, by, cx, cy)  # [chunk]
        if cull_backfaces:
            # y is flipped in screen space, so CCW world-facing triangles have
            # negative screen-space area
            act = act & (area < -1e-12)
        else:
            act = act & (jnp.abs(area) > 1e-12)
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)

        # [chunk, H, W] barycentric weights via edge functions
        pxe = px[None]
        pye = py[None]
        w0 = _edge(bx[:, None, None], by[:, None, None], cx[:, None, None], cy[:, None, None], pxe, pye)
        w1 = _edge(cx[:, None, None], cy[:, None, None], ax[:, None, None], ay[:, None, None], pxe, pye)
        w2 = _edge(ax[:, None, None], ay[:, None, None], bx[:, None, None], by[:, None, None], pxe, pye)
        b0 = w0 * inv_area[:, None, None]
        b1 = w1 * inv_area[:, None, None]
        b2 = w2 * inv_area[:, None, None]
        covered = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & act[:, None, None]
        zpix = (
            b0 * az[:, None, None] + b1 * bz[:, None, None] + b2 * cz[:, None, None]
        )
        # pixel-level depth clip (far plane; near handled by triangle clipping)
        covered = covered & (zpix >= 0.0) & (zpix <= 1.0)
        zpix = jnp.where(covered, zpix, jnp.inf)

        # per-chunk winner
        best = jnp.argmin(zpix, axis=0)  # [H,W]
        best_z = jnp.take_along_axis(zpix, best[None], axis=0)[0]
        global_id = (i * chunk + best).astype(jnp.int32)

        closer = best_z < depth_buf
        return (
            jnp.where(closer, best_z, depth_buf),
            jnp.where(closer, global_id, tri_buf),
        )

    depth, tri_id = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.ones((height, width), jnp.float32), jnp.full((height, width), NO_TRI))
    )
    return RasterTarget(depth=depth, tri_id=tri_id)


def resolve_barycentrics(clip2, bary2, target: RasterTarget, n_orig_tris: int):
    """Per-pixel perspective-correct barycentrics w.r.t. ORIGINAL triangles.

    ``clip2``/``bary2`` come from :func:`rasterize` (clipped triangles carrying
    original-barycentric corner weights). Returns (bary [H,W,3], tri [H,W]
    original-slot ids, valid [H,W]).
    """
    h, w = target.depth.shape
    tri = jnp.maximum(target.tri_id, 0)
    cp = clip2[tri]  # [H,W,3,4]
    wclip = cp[..., 3]
    inv_w = 1.0 / jnp.maximum(wclip, 1e-8)
    sx = (cp[..., 0] * inv_w * 0.5 + 0.5) * w
    sy = (0.5 - cp[..., 1] * inv_w * 0.5) * h
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (h, w))
    py = jnp.broadcast_to(py, (h, w))

    ax, ay = sx[..., 0], sy[..., 0]
    bx, by = sx[..., 1], sy[..., 1]
    cx, cy = sx[..., 2], sy[..., 2]
    area = _edge(ax, ay, bx, by, cx, cy)
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    b0 = _edge(bx, by, cx, cy, px, py) * inv_area
    b1 = _edge(cx, cy, ax, ay, px, py) * inv_area
    b2 = 1.0 - b0 - b1
    screen_bary = jnp.stack([b0, b1, b2], axis=-1)
    # perspective correction: weight by 1/w and renormalize
    pb = screen_bary * inv_w
    pb = pb / jnp.maximum(jnp.sum(pb, axis=-1, keepdims=True), 1e-12)
    # map barycentrics of the clipped triangle back to the original triangle
    orig_bary = jnp.einsum("hwi,hwij->hwj", pb, bary2[tri])
    orig_tri = tri % n_orig_tris
    valid = target.tri_id >= 0
    return orig_bary, orig_tri, valid


def interpolate_attribute(attr_per_vertex, tri_indices, tri, bary, valid, fill=0.0):
    """Interpolate a per-vertex attribute [V,K] over the resolved pixels.

    tri_indices i32[T,3] (vertex slots per triangle), tri [H,W], bary [H,W,3].
    """
    vids = tri_indices[tri]  # [H,W,3]
    vals = attr_per_vertex[vids]  # [H,W,3,K]
    out = jnp.einsum("hwv,hwvk->hwk", bary, vals)
    return jnp.where(valid[..., None], out, fill)


def rasterize_attributes(
    clip_pos,  # f32[T,3,4] clip-space vertex positions per triangle
    tri_active,  # bool[T]
    tri_indices,  # i32[T,3] vertex ids per triangle
    vert_attrs,  # f32[V,A] packed per-vertex attributes
    height: int,
    width: int,
    tile: int = 32,
    k_per_tile: int | None = None,
    big_budget: int = 32,
    tiles_per_chunk: int | None = None,
    cull_backfaces: bool = True,
):
    """Tile-binned raster that interpolates vertex attributes IN the tile
    loop. Returns (interp [H,W,A], nearest [H,W,A], valid [H,W]).

    ``interp`` holds perspective-correct barycentric interpolation of
    ``vert_attrs``; ``nearest`` holds the max-weight corner's raw attributes
    (for non-interpolating lanes like material ids). Fusing the fetch into
    the loop gathers attributes once per (tile, candidate) — ~8× fewer
    gather rows than a per-pixel [H,W,3] gather from [V,A], which dominated
    the geometry pass.
    """
    t = clip_pos.shape[0]
    a_dim = vert_attrs.shape[1]
    clip2, bary2, act2 = clip_triangles_near(clip_pos, tri_active)
    t2 = clip2.shape[0]
    th = -(-height // tile)
    tw = -(-width // tile)
    n_tiles = th * tw
    if k_per_tile is None:
        cap = 1024 if n_tiles < 256 else 512
        k_per_tile = int(min(cap, max(128, (2 * t2) // max(n_tiles, 1))))
    if tiles_per_chunk is None:
        tiles_per_chunk = max(
            8, min(128, n_tiles, (1 << 24) // (k_per_tile * tile * tile))
        )

    sx, sy, z, valid_c = _screen_coords(clip2, height, width)  # [T2,3]
    act = act2 & jnp.all(valid_c, axis=-1)
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
    tx0 = jnp.clip(jnp.floor(xmin / tile).astype(jnp.int32), 0, tw - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile).astype(jnp.int32), 0, tw - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile).astype(jnp.int32), 0, th - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile).astype(jnp.int32), 0, th - 1)
    small = act & (tx1 - tx0 < 2) & (ty1 - ty0 < 2)
    big = act & ~small

    ddx = jnp.array([0, 1, 0, 1], jnp.int32)
    ddy = jnp.array([0, 0, 1, 1], jnp.int32)
    ptx = tx0[:, None] + ddx[None, :]
    pty = ty0[:, None] + ddy[None, :]
    pair_ok = small[:, None] & (ptx <= tx1[:, None]) & (pty <= ty1[:, None])
    pair_tile = jnp.where(pair_ok, pty * tw + ptx, n_tiles).reshape(-1)
    tri_near_z = jnp.min(z, axis=-1)
    pair_depth = jnp.broadcast_to(tri_near_z[:, None], (t2, 4)).reshape(-1)
    pair_tri = jnp.broadcast_to(
        jnp.arange(t2, dtype=jnp.int32)[:, None], (t2, 4)
    ).reshape(-1)
    tile_sorted, _, tri_sorted = jax.lax.sort(
        (pair_tile, pair_depth, pair_tri), num_keys=2
    )
    starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles, dtype=jnp.int32))
    ends = jnp.searchsorted(
        tile_sorted, jnp.arange(n_tiles, dtype=jnp.int32), side="right"
    )
    counts = (ends - starts).astype(jnp.int32)

    nb = min(big_budget, t2)
    big_key = jnp.where(big, tri_near_z, jnp.inf)
    big_order = jnp.argsort(big_key)[:nb].astype(jnp.int32)
    big_sel = big[big_order]

    ax, ay, az = sx[:, 0], sy[:, 0], z[:, 0]
    bx, by, bz = sx[:, 1], sy[:, 1], z[:, 1]
    cx, cy, cz = sx[:, 2], sy[:, 2], z[:, 2]
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    inv_w = 1.0 / jnp.maximum(clip2[..., 3], 1e-8)  # [T2,3]
    # per-clipped-slot corner attributes mapped to ORIGINAL corners:
    # attr at clipped corner i = Σ_j bary2[s,i,j] · vert_attrs[vids[s%T, j]]
    vids = tri_indices[jnp.arange(t2) % t]  # [T2,3]

    n_chunks = -(-n_tiles // tiles_per_chunk)
    n_tiles_pad = n_chunks * tiles_per_chunk
    starts = jnp.pad(starts, (0, n_tiles_pad - n_tiles))
    counts = jnp.pad(counts, (0, n_tiles_pad - n_tiles))
    tile_x0 = (jnp.arange(n_tiles_pad, dtype=jnp.int32) % tw) * tile
    tile_y0 = (jnp.arange(n_tiles_pad, dtype=jnp.int32) // tw) * tile

    lx = (jnp.arange(tile, dtype=jnp.float32) + 0.5)[None, :]
    ly = (jnp.arange(tile, dtype=jnp.float32) + 0.5)[:, None]
    lx = jnp.broadcast_to(lx, (tile, tile)).reshape(-1)
    ly = jnp.broadcast_to(ly, (tile, tile)).reshape(-1)

    k = k_per_tile
    tc = tiles_per_chunk
    s2 = tile * tile

    def chunk_body(ci, out):
        interp_out, near_out, valid_out = out
        s0 = ci * tc
        st = jax.lax.dynamic_slice(starts, (s0,), (tc,))
        cn = jax.lax.dynamic_slice(counts, (s0,), (tc,))
        x0 = jax.lax.dynamic_slice(tile_x0, (s0,), (tc,)).astype(jnp.float32)
        y0 = jax.lax.dynamic_slice(tile_y0, (s0,), (tc,)).astype(jnp.float32)

        idx = st[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        have = jnp.arange(k, dtype=jnp.int32)[None, :] < cn[:, None]
        idx = jnp.clip(idx, 0, tri_sorted.shape[0] - 1)
        tri = tri_sorted[idx]
        tri = jnp.concatenate(
            [tri, jnp.broadcast_to(big_order[None, :], (tc, nb))], axis=1
        )
        have = jnp.concatenate(
            [have, jnp.broadcast_to(big_sel[None, :], (tc, nb))], axis=1
        )
        kk = k + nb

        rax = ax[tri] - x0[:, None]
        ray = ay[tri] - y0[:, None]
        rbx = bx[tri] - x0[:, None]
        rby = by[tri] - y0[:, None]
        rcx = cx[tri] - x0[:, None]
        rcy = cy[tri] - y0[:, None]
        ia = inv_area[tri]
        z0 = az[tri]
        z1 = bz[tri]
        z2 = cz[tri]

        pxe = lx[None, None, :]
        pye = ly[None, None, :]
        w0 = _edge(rbx[..., None], rby[..., None], rcx[..., None], rcy[..., None], pxe, pye)
        w1 = _edge(rcx[..., None], rcy[..., None], rax[..., None], ray[..., None], pxe, pye)
        w2 = _edge(rax[..., None], ray[..., None], rbx[..., None], rby[..., None], pxe, pye)
        b0 = w0 * ia[..., None]
        b1 = w1 * ia[..., None]
        b2 = w2 * ia[..., None]
        covered = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & have[..., None]
        zpix = b0 * z0[..., None] + b1 * z1[..., None] + b2 * z2[..., None]
        covered = covered & (zpix >= 0.0) & (zpix <= 1.0)
        zpix = jnp.where(covered, zpix, jnp.inf)

        best = jnp.argmin(zpix, axis=1)  # [TC,S²]
        best_z = jnp.take_along_axis(zpix, best[:, None, :], axis=1)[:, 0, :]
        vmask = jnp.isfinite(best_z)  # [TC,S²]

        def takeK(arr):  # [TC,KK,S²] → [TC,S²]
            return jnp.take_along_axis(arr, best[:, None, :], axis=1)[:, 0, :]

        sb0 = takeK(b0)
        sb1 = takeK(b1)
        sb2 = takeK(b2)

        # winner per-candidate data (gathered per candidate, selected per
        # pixel by ONE-HOT MATMUL — a take_along_axis with a lane-broadcast
        # index lowers to per-element gathers and is ~10× slower on TPU)
        iw_c = inv_w[tri]  # [TC,KK,3]
        b2m_c = bary2[tri]  # [TC,KK,3,3]
        av_c = jnp.einsum(
            "tkij,tkja->tkia", b2m_c, vert_attrs[vids[tri]]
        )  # [TC,KK,3,A] clipped-corner attributes

        payload = jnp.concatenate(
            [iw_c, av_c.reshape(tc, kk, 3 * a_dim)], axis=-1
        )  # [TC,KK,3+3A]
        onehot = (
            best[:, :, None] == jnp.arange(kk, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)  # [TC,S²,KK]
        sel = jnp.einsum("tsk,tkp->tsp", onehot, payload)  # MXU
        iw = sel[..., 0:3]
        av = sel[..., 3:].reshape(tc, s2, 3, a_dim)

        # perspective-correct barycentrics over the winner's clipped corners
        pb = jnp.stack([sb0, sb1, sb2], axis=-1) * iw  # [TC,S²,3]
        pb = pb / jnp.maximum(jnp.sum(pb, axis=-1, keepdims=True), 1e-12)

        interp = jnp.einsum("tsi,tsia->tsa", pb, av)
        nearest = jnp.argmax(pb, axis=-1)  # [TC,S²]
        near = sum(
            jnp.where((nearest == i)[..., None], av[:, :, i, :], 0.0)
            for i in range(3)
        )

        interp = jnp.where(vmask[..., None], interp, 0.0)
        near = jnp.where(vmask[..., None], near, 0.0)

        interp_out = jax.lax.dynamic_update_slice(interp_out, interp, (s0, 0, 0))
        near_out = jax.lax.dynamic_update_slice(near_out, near, (s0, 0, 0))
        valid_out = jax.lax.dynamic_update_slice(valid_out, vmask, (s0, 0))
        return interp_out, near_out, valid_out

    interp_t, near_t, valid_t = jax.lax.fori_loop(
        0,
        n_chunks,
        chunk_body,
        (
            jnp.zeros((n_tiles_pad, s2, a_dim), jnp.float32),
            jnp.zeros((n_tiles_pad, s2, a_dim), jnp.float32),
            jnp.zeros((n_tiles_pad, s2), bool),
        ),
    )

    def untile(arr):
        extra = arr.shape[2:]
        return (
            arr[:n_tiles]
            .reshape((th, tw, tile, tile) + extra)
            .transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(extra))))
            .reshape((th * tile, tw * tile) + extra)[:height, :width]
        )

    return untile(interp_t), untile(near_t), untile(valid_t)
