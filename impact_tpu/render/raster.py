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

NO_TRI = jnp.int32(-1)


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


def rasterize(
    clip_pos,  # f32[T,3,4] clip-space vertex positions per triangle
    tri_active,  # bool[T]
    height: int,
    width: int,
    chunk: int = 256,
    cull_backfaces: bool = True,
) -> RasterTarget:
    """Z-buffer rasterization of T triangle slots into an H×W target.

    clip positions follow wgpu conventions: x,y ∈ [−w,w] mapping to screen,
    z ∈ [0,w] mapping to depth [0,1], y up. Triangles behind the near plane
    (any w ≤ 0) are dropped (no clipping — scenes keep geometry in front of
    the camera; near-plane clipping can be added by splitting).
    """
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
        act = act & jnp.all(valid, axis=-1) & jnp.all(z >= 0.0, axis=-1) & jnp.all(z <= 1.0, axis=-1)

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


def resolve_barycentrics(clip_pos, target: RasterTarget):
    """Per-pixel perspective-correct barycentrics of the winning triangles.

    Returns (bary [H,W,3] perspective-correct, tri [H,W] slot, valid [H,W]).
    """
    h, w = target.depth.shape
    tri = jnp.maximum(target.tri_id, 0)
    cp = clip_pos[tri]  # [H,W,3,4]
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
    valid = target.tri_id >= 0
    return pb, tri, valid


def interpolate_attribute(attr_per_vertex, tri_indices, tri, bary, valid, fill=0.0):
    """Interpolate a per-vertex attribute [V,K] over the resolved pixels.

    tri_indices i32[T,3] (vertex slots per triangle), tri [H,W], bary [H,W,3].
    """
    vids = tri_indices[tri]  # [H,W,3]
    vals = attr_per_vertex[vids]  # [H,W,3,K]
    out = jnp.einsum("hwv,hwvk->hwk", bary, vals)
    return jnp.where(valid[..., None], out, fill)
