"""Surface Nets meshing of voxel SDF grids.

Ref: impact_voxel/src/object/sdf/surface_nets.rs — one vertex per
surface-crossing cell placed at the centroid of the cell's edge
zero-crossings, normals from the SDF gradient, quads emitted for each
sign-changing lattice edge connecting the 4 cells around it.

TPU redesign (SURVEY.md §7.3.3): instead of dynamic vertex/index Vecs with
RangeAllocator bookkeeping, the mesh is FIXED-CAPACITY and slot-addressed:
vertex slot = linear cell index (one potential vertex per cell), triangle
slots = 2 per (lattice point, axis). Inactive slots are masked; masked
triangles are degenerate and cost nothing downstream. No compaction, no
atomics, no data-dependent shapes — the whole mesher is one fused XLA program
over [G,G,G] arrays, vmapped over the object pool.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SurfaceNetsMesh(NamedTuple):
    """Dense slot-addressed mesh for one object (batch via leading axis).

    C = (G-1)³ cells; T = 3·2·C triangle slots.
    Vertex positions are in GRID units (voxel index space); callers scale by
    voxel_extent and offset by origin to reach body-frame coordinates.
    """

    vert_active: jnp.ndarray  # bool[C]
    vert_pos: jnp.ndarray  # f32[C,3] grid units
    vert_normal: jnp.ndarray  # f32[C,3] unit outward normal
    vert_type: jnp.ndarray  # i32[C] dominant material at vertex
    vert_type2: jnp.ndarray  # i32[C] second material (== vert_type when pure)
    vert_blend: jnp.ndarray  # f32[C] weight of vert_type2 in [0, 0.5]
    # full material census of the cell's 8 corner voxels (ref:
    # surface_nets.rs:39-50 — ≤7 weighted vertex materials; here ALL ≤8
    # adjacent materials with their depth weights, so the remesh-time bake
    # is an EXACT weighted blend, a superset of the reference's ≤7)
    vert_ctype: jnp.ndarray  # i32[C,8] corner voxel material
    vert_cweight: jnp.ndarray  # f32[C,8] normalized depth weight (0 outside)
    tri_active: jnp.ndarray  # bool[T]
    tri_indices: jnp.ndarray  # i32[T,3] cell-slot indices


_CORNER_OFFSETS = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
    (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
]

_EDGES = [
    (0, 1), (2, 3), (4, 5), (6, 7),  # x edges
    (0, 2), (1, 3), (4, 6), (5, 7),  # y edges
    (0, 4), (1, 5), (2, 6), (3, 7),  # z edges
]


def surface_nets(sdf, vtype, merge_levels: int = 0):
    """Mesh one [G,G,G] SDF grid (jit/vmap friendly).

    Vertex at cell (i,j,k) uses corners sdf[i..i+1, j..j+1, k..k+1]; it is
    positioned at the mean of the edge zero-crossings (surface_nets.rs:39-50).

    ``merge_levels`` > 0 enables RENDER-EXACT hierarchical quad merging:
    2×2 blocks of adjacent same-axis quads collapse into one quad when the
    block is exactly planar (equal normals, corner/edge-midpoint/center
    vertices bilinear in the outer corners, coplanar corners) with uniform
    materials — true on the flat regions that dominate voxel surfaces, where
    interpolated attributes are affine so the merged triangulation renders
    pixel-identically. Each level halves the quad lattice; level-ℓ quads span
    2^ℓ cells per side. Voxel scenes are locally flat, so this cuts ACTIVE
    triangle counts ~3-10× (the raster prologue sort, scene transforms, and
    tile candidate counts all scale with it). Triangle SLOTS grow by
    Σ 4^-ℓ ≤ 1/3 to hold the per-level lattices.
    """
    g = sdf.shape[0]
    gc = g - 1  # cells per axis

    # [gc,gc,gc,8] corner distances
    corners = jnp.stack(
        [sdf[dx : dx + gc, dy : dy + gc, dz : dz + gc] for (dx, dy, dz) in _CORNER_OFFSETS],
        axis=-1,
    )
    inside = corners < 0.0
    n_inside = jnp.sum(inside, axis=-1)
    cell_active = (n_inside > 0) & (n_inside < 8)

    # edge crossings → vertex position (centroid of crossing points)
    crossings_sum = jnp.zeros((gc, gc, gc, 3), jnp.float32)
    crossings_cnt = jnp.zeros((gc, gc, gc), jnp.float32)
    offsets = jnp.asarray(_CORNER_OFFSETS, jnp.float32)
    for (a, b) in _EDGES:
        da, db = corners[..., a], corners[..., b]
        crossing = (da < 0.0) != (db < 0.0)
        t = da / jnp.where(jnp.abs(da - db) < 1e-12, 1e-12, da - db)
        t = jnp.clip(t, 0.0, 1.0)
        point = offsets[a] + t[..., None] * (offsets[b] - offsets[a])
        crossings_sum = crossings_sum + jnp.where(crossing[..., None], point, 0.0)
        crossings_cnt = crossings_cnt + crossing
    centroid = crossings_sum / jnp.maximum(crossings_cnt, 1.0)[..., None]
    cell_ijk = jnp.stack(
        jnp.meshgrid(*([jnp.arange(gc, dtype=jnp.float32)] * 3), indexing="ij"),
        axis=-1,
    )
    # +0.5: voxel centers sit at (idx + 0.5) in grid units
    vert_pos = cell_ijk + centroid + 0.5

    # normals: average corner-difference gradient over the cell
    gx = jnp.sum(corners * _corner_sign(0), axis=-1)
    gy = jnp.sum(corners * _corner_sign(1), axis=-1)
    gz = jnp.sum(corners * _corner_sign(2), axis=-1)
    normal = jnp.stack([gx, gy, gz], axis=-1)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )

    # material blending: weight each inside corner by its depth (−sdf), sum
    # weights per distinct type, keep the top two (the TPU analog of the
    # reference's ≤7 blended materials per vertex, surface_nets.rs:39-50 —
    # two types cover a boundary cell; pixel-level barycentric blending in the
    # geometry pass smooths across vertices)
    corner_types = jnp.stack(
        [vtype[dx : dx + gc, dy : dy + gc, dz : dz + gc] for (dx, dy, dz) in _CORNER_OFFSETS],
        axis=-1,
    )
    w_corner = jnp.where(inside, jnp.maximum(-corners, 1e-6), 0.0)  # [...,8]
    # per-corner type weight: total weight of corners sharing its type
    same = corner_types[..., :, None] == corner_types[..., None, :]  # [...,8,8]
    w_type = jnp.sum(jnp.where(same, w_corner[..., None, :], 0.0), axis=-1)
    w_type = jnp.where(inside, w_type, -1.0)
    best = jnp.argmax(w_type, axis=-1)
    vert_type = jnp.take_along_axis(corner_types, best[..., None], axis=-1)[..., 0]
    w1 = jnp.take_along_axis(w_type, best[..., None], axis=-1)[..., 0]
    other = corner_types != vert_type[..., None]
    w_other = jnp.where(other & inside, w_type, -1.0)
    best2 = jnp.argmax(w_other, axis=-1)
    w2 = jnp.maximum(
        jnp.take_along_axis(w_other, best2[..., None], axis=-1)[..., 0], 0.0
    )
    vert_type2 = jnp.where(
        w2 > 0.0,
        jnp.take_along_axis(corner_types, best2[..., None], axis=-1)[..., 0],
        vert_type,
    )
    vert_blend = w2 / jnp.maximum(w1 + w2, 1e-9)
    # full census for the exact bake: all 8 corner materials with their
    # normalized depth weights (outside corners weigh 0)
    vert_cweight = w_corner / jnp.maximum(
        jnp.sum(w_corner, axis=-1, keepdims=True), 1e-9
    )

    c = gc * gc * gc
    cell_linear = (
        jnp.arange(c, dtype=jnp.int32).reshape(gc, gc, gc)
    )

    # --- triangles: for each lattice point p in [1..g-1)³ and axis a, the edge
    # p → p+e_a; if it crosses the surface, connect the 4 cells sharing it.
    tris_idx = []
    tris_act = []
    for axis in range(3):
        # lattice points p = (i,j,k) with i,j,k in [1, gc); edge to p+e_a
        d0 = sdf[1:gc, 1:gc, 1:gc]
        shifted = [slice(1, gc)] * 3
        shifted[axis] = slice(2, gc + 1)
        d1 = sdf[tuple(shifted)]
        crossing = (d0 < 0.0) != (d1 < 0.0)
        flip = d0 < 0.0  # winding depends on which side is solid

        # the four cells sharing edge along `axis` at point p: offsets over the
        # other two axes ∈ {-1, 0}. Cyclic order keeps the (u, v) pair
        # right-handed about the edge axis so the winding analysis below holds
        # for every axis.
        others = [(axis + 1) % 3, (axis + 2) % 3]
        offs = []
        for u in (-1, 0):
            for v in (-1, 0):
                off = [0, 0, 0]
                off[others[0]] = u
                off[others[1]] = v
                offs.append(off)

        def at(grid, off):
            sl = tuple(slice(1 + off[a], gc + off[a]) for a in range(3))
            return grid[sl]

        # level-0 quad state: corner cell ids + (for merging) positions,
        # normal, materials, uniformity
        quad = {
            "emit": crossing,
            "flip": flip,
            "c00": at(cell_linear, offs[0]),  # (u-1, v-1)
            "c01": at(cell_linear, offs[1]),  # (u-1, v  )
            "c10": at(cell_linear, offs[2]),  # (u,   v-1)
            "c11": at(cell_linear, offs[3]),  # (u,   v  )
        }
        if merge_levels > 0:
            pos_c = [at(vert_pos, o) for o in offs]
            nrm_c = [at(normal, o) for o in offs]
            t_c = [at(vert_type, o) for o in offs]
            t2_c = [at(vert_type2, o) for o in offs]
            b_c = [at(vert_blend, o) for o in offs]
            ct_c = [at(corner_types, o) for o in offs]
            cw_c = [at(vert_cweight, o) for o in offs]
            eps = 1e-3
            uni = (
                (jnp.linalg.norm(nrm_c[1] - nrm_c[0], axis=-1) < eps)
                & (jnp.linalg.norm(nrm_c[2] - nrm_c[0], axis=-1) < eps)
                & (jnp.linalg.norm(nrm_c[3] - nrm_c[0], axis=-1) < eps)
            )
            for k in (1, 2, 3):
                uni = uni & (t_c[k] == t_c[0]) & (t2_c[k] == t2_c[0])
                uni = uni & (jnp.abs(b_c[k] - b_c[0]) < eps)
                # the exact bake blends the full census, so merged blocks
                # must share it exactly for render-identical attributes
                uni = uni & jnp.all(ct_c[k] == ct_c[0], axis=-1)
                uni = uni & jnp.all(
                    jnp.abs(cw_c[k] - cw_c[0]) < eps, axis=-1
                )
            quad.update(
                mergeable=crossing & uni,
                p00=pos_c[0], p01=pos_c[1], p10=pos_c[2], p11=pos_c[3],
            )

        levels = [quad]
        axis_u, axis_v = others
        for _ in range(merge_levels):
            levels.append(_merge_quads(levels[-1], axis_u, axis_v))

        for q in levels:
            t1 = jnp.where(
                q["flip"][..., None],
                jnp.stack([q["c00"], q["c11"], q["c01"]], axis=-1),
                jnp.stack([q["c00"], q["c01"], q["c11"]], axis=-1),
            )
            t2 = jnp.where(
                q["flip"][..., None],
                jnp.stack([q["c00"], q["c10"], q["c11"]], axis=-1),
                jnp.stack([q["c00"], q["c11"], q["c10"]], axis=-1),
            )
            tris_idx.append(t1.reshape(-1, 3))
            tris_idx.append(t2.reshape(-1, 3))
            tris_act.append(q["emit"].reshape(-1))
            tris_act.append(q["emit"].reshape(-1))

    tri_indices = jnp.concatenate(tris_idx, axis=0)
    tri_active = jnp.concatenate(tris_act, axis=0)

    return SurfaceNetsMesh(
        vert_active=cell_active.reshape(-1),
        vert_pos=vert_pos.reshape(-1, 3),
        vert_normal=normal.reshape(-1, 3),
        vert_type=vert_type.reshape(-1),
        vert_type2=vert_type2.reshape(-1),
        vert_blend=vert_blend.reshape(-1),
        vert_ctype=corner_types.reshape(-1, 8),
        vert_cweight=vert_cweight.reshape(-1, 8),
        tri_active=tri_active,
        tri_indices=tri_indices,
    )


def _merge_quads(child, axis_u, axis_v, eps: float = 1e-3):
    """One 2×2 → 1 quad-merge level over the (axis_u, axis_v) lattice dims.

    Returns the parent quad-state dict (half resolution along u/v, trimmed)
    and clears ``child["emit"]`` where the parent merged. Merging is gated on
    exact planarity/affinity (see surface_nets docstring) so the merged
    triangulation rasterizes identically to the four children."""

    def sub(x, ou, ov):
        nu = (x.shape[axis_u] // 2) * 2
        nv = (x.shape[axis_v] // 2) * 2
        sl = [slice(None)] * x.ndim
        sl[axis_u] = slice(ou, nu, 2)
        sl[axis_v] = slice(ov, nv, 2)
        return x[tuple(sl)]

    A = {k: sub(v, 0, 0) for k, v in child.items()}
    B = {k: sub(v, 0, 1) for k, v in child.items()}
    C = {k: sub(v, 1, 0) for k, v in child.items()}
    D = {k: sub(v, 1, 1) for k, v in child.items()}

    # the 9 lattice corner points of the 2×2 block (shared corners are the
    # same cells structurally, so only one copy of each is needed)
    p00, p02, p20, p22 = A["p00"], B["p01"], C["p10"], D["p11"]

    def on_mid(p, q, r):  # p == (q + r) / 2
        return jnp.linalg.norm(p - 0.5 * (q + r), axis=-1) < eps

    center_ok = (
        jnp.linalg.norm(
            A["p11"] - 0.25 * (p00 + p02 + p20 + p22), axis=-1
        )
        < eps
    )
    n = jnp.cross(p02 - p00, p20 - p00)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    coplanar = jnp.abs(jnp.sum(n * (p22 - p00), axis=-1)) < eps

    merged = (
        A["mergeable"] & B["mergeable"] & C["mergeable"] & D["mergeable"]
        & (A["flip"] == B["flip"]) & (A["flip"] == C["flip"])
        & (A["flip"] == D["flip"])
        & on_mid(A["p01"], p00, p02)
        & on_mid(C["p11"], p20, p22)
        & on_mid(A["p10"], p00, p20)
        & on_mid(B["p11"], p02, p22)
        & center_ok
        & coplanar
    )

    # suppress the children a parent replaced
    ex = jnp.repeat(jnp.repeat(merged, 2, axis=axis_u), 2, axis=axis_v)
    pad = [(0, 0)] * ex.ndim
    pad[axis_u] = (0, child["emit"].shape[axis_u] - ex.shape[axis_u])
    pad[axis_v] = (0, child["emit"].shape[axis_v] - ex.shape[axis_v])
    child["emit"] = child["emit"] & ~jnp.pad(ex, pad)

    return {
        "emit": merged,
        "mergeable": merged,
        "flip": A["flip"],
        "c00": A["c00"], "c01": B["c01"], "c10": C["c10"], "c11": D["c11"],
        "p00": p00, "p01": p02, "p10": p20, "p11": p22,
    }


def _corner_sign(axis):
    """[8] weights (+1 where corner offset along axis is 1, else −1) for the
    corner-difference gradient."""
    return jnp.asarray(
        [1.0 if off[axis] else -1.0 for off in _CORNER_OFFSETS], jnp.float32
    )


surface_nets_batched = jax.vmap(surface_nets)


def make_surface_nets_batched(merge_levels: int):
    """Object-batched surface nets with a static quad-merge level count."""
    import functools

    return jax.vmap(
        functools.partial(surface_nets, merge_levels=merge_levels)
    )


def mesh_counts(mesh: SurfaceNetsMesh):
    return jnp.sum(mesh.vert_active, axis=-1), jnp.sum(mesh.tri_active, axis=-1)


class CompactMesh(NamedTuple):
    """Fixed-capacity compacted mesh: active vertices/triangles packed to the
    front (the analog of the reference's ChunkSubmeshManager buffer packing,
    ref: mesh.rs:50-58 — but recomputed per change instead of incrementally)."""

    vert_active: jnp.ndarray  # bool[Vc]
    vert_pos: jnp.ndarray  # f32[Vc,3] grid units
    vert_normal: jnp.ndarray  # f32[Vc,3]
    vert_type: jnp.ndarray  # i32[Vc]
    vert_type2: jnp.ndarray  # i32[Vc]
    vert_blend: jnp.ndarray  # f32[Vc]
    # full ≤8-material census (see SurfaceNetsMesh) — consumed by
    # ``bake_mesh_materials`` for the exact weighted blend
    vert_ctype: jnp.ndarray  # i32[Vc,8]
    vert_cweight: jnp.ndarray  # f32[Vc,8]
    tri_active: jnp.ndarray  # bool[Tc]
    tri_indices: jnp.ndarray  # i32[Tc,3] into the compacted vertex slots
    # corner-major render layout, built once per remesh so the per-frame
    # render path never gathers by triangle index (TPU gathers cost tens of
    # ns per ROW — a [T,3]-indexed gather at bench scale measured ~150 ms
    # per frame, devtools/probe_attr_ops.py). Layout: [:, 3c:3c+3] (or
    # [:, c]) is corner c of the triangle.
    tri_pos: jnp.ndarray  # f32[Tc,9] grid units
    tri_normal: jnp.ndarray  # f32[Tc,9]
    tri_type: jnp.ndarray  # i32[Tc,3]
    tri_type2: jnp.ndarray  # i32[Tc,3]
    tri_blend: jnp.ndarray  # f32[Tc,3]
    # baked corner materials (two-material blend applied at remesh time via
    # ``bake_mesh_materials`` — per-frame material table gathers measured
    # ~70 ms at bench scale; ref: surface_nets.rs ≤7-material vertex weights
    # reduced to the top-2 blend)
    tri_albedo: jnp.ndarray  # f32[Tc,9]
    tri_f0: jnp.ndarray  # f32[Tc,9]
    tri_rough: jnp.ndarray  # f32[Tc,3]
    tri_emissive: jnp.ndarray  # f32[Tc,9]
    # overflow accounting ("no silent caps"): how many ACTIVE vertices /
    # triangles of the source mesh did not fit the fixed capacities and were
    # dropped. Scalars here; [O] when batched. Surfaced by bench + tests.
    n_dropped_verts: jnp.ndarray  # i32[]
    n_dropped_tris: jnp.ndarray  # i32[]


def compact_mesh(mesh: SurfaceNetsMesh, vert_cap: int, tri_cap: int) -> CompactMesh:
    """Pack active vertices/triangles into fixed-capacity buffers.

    Overflow beyond the caps is dropped (callers size caps for the worst
    expected surface). Stable argsort keeps spatial ordering, which preserves
    locality for downstream gathers.
    """
    v = mesh.vert_active.shape[0]
    vorder = jnp.argsort(~mesh.vert_active, stable=True)  # old ids, actives first
    new_of_old = jnp.zeros(v, jnp.int32).at[vorder].set(
        jnp.arange(v, dtype=jnp.int32)
    )
    vsel = vorder[:vert_cap]
    vact = mesh.vert_active[vsel]

    torder = jnp.argsort(~mesh.tri_active, stable=True)
    tsel = torder[:tri_cap]
    tact = mesh.tri_active[tsel]
    tidx = new_of_old[mesh.tri_indices[tsel]]
    # drop triangles referencing overflowed vertices
    tact = tact & jnp.all(tidx < vert_cap, axis=-1)
    tidx = jnp.clip(tidx, 0, vert_cap - 1)

    vpos = mesh.vert_pos[vsel]
    vnrm = mesh.vert_normal[vsel]
    vtype = mesh.vert_type[vsel]
    vtype2 = mesh.vert_type2[vsel]
    vblend = mesh.vert_blend[vsel]
    vctype = mesh.vert_ctype[vsel]
    vcweight = mesh.vert_cweight[vsel]

    # corner-major gathers (amortized: compact_mesh runs per REMESH of a
    # budgeted object subset, not per frame)
    c0, c1, c2 = tidx[:, 0], tidx[:, 1], tidx[:, 2]
    n_dropped_verts = (
        jnp.sum(mesh.vert_active).astype(jnp.int32)
        - jnp.sum(vact).astype(jnp.int32)
    )
    n_dropped_tris = (
        jnp.sum(mesh.tri_active).astype(jnp.int32)
        - jnp.sum(tact).astype(jnp.int32)
    )
    return CompactMesh(
        vert_active=vact,
        vert_pos=vpos,
        vert_normal=vnrm,
        vert_type=vtype,
        vert_type2=vtype2,
        vert_blend=vblend,
        vert_ctype=vctype,
        vert_cweight=vcweight,
        tri_active=tact,
        tri_indices=tidx,
        tri_pos=jnp.concatenate([vpos[c0], vpos[c1], vpos[c2]], axis=-1),
        tri_normal=jnp.concatenate([vnrm[c0], vnrm[c1], vnrm[c2]], axis=-1),
        tri_type=jnp.stack([vtype[c0], vtype[c1], vtype[c2]], axis=-1),
        tri_type2=jnp.stack([vtype2[c0], vtype2[c1], vtype2[c2]], axis=-1),
        tri_blend=jnp.stack([vblend[c0], vblend[c1], vblend[c2]], axis=-1),
        tri_albedo=jnp.zeros((tri_cap, 9), jnp.float32),
        tri_f0=jnp.zeros((tri_cap, 9), jnp.float32),
        tri_rough=jnp.zeros((tri_cap, 3), jnp.float32),
        tri_emissive=jnp.zeros((tri_cap, 9), jnp.float32),
        n_dropped_verts=n_dropped_verts,
        n_dropped_tris=n_dropped_tris,
    )


def bake_mesh_materials(mesh, material_table):
    """Fill the baked corner-material fields from the packed [T,10] table
    (``material_corner_table``), once per remesh instead of per frame.

    For :class:`CompactMesh` (has the vertex census) the bake is the EXACT
    weighted blend over ALL ≤8 materials adjacent to each vertex — a
    superset of the reference's ≤7 weighted vertex materials
    (surface_nets.rs:39-50): per vertex, Σ_corner w·table[type], then
    gathered corner-major through ``tri_indices``. For census-less pools
    (:class:`~..chunk_mesh.ChunkMeshPool` re-bakes on a live scene) it
    falls back to the stored top-2 blend. Works on single [Tc,...] or
    batched [O,Tc,...] meshes."""
    n_types = material_table.shape[0]
    if hasattr(mesh, "vert_ctype"):
        props = material_table[
            jnp.clip(mesh.vert_ctype, 0, n_types - 1)
        ]  # [...,Vc,8,10]
        w = mesh.vert_cweight[..., None]
        vm = jnp.sum(props * w, axis=-2)  # [...,Vc,10] exact blend
        vc = vm.shape[-2]
        tc3 = mesh.tri_indices.shape[-2] * 3
        lead = vm.shape[:-2]
        idx = mesh.tri_indices.reshape(lead + (tc3, 1))
        m = jnp.take_along_axis(
            vm, jnp.clip(idx, 0, vc - 1), axis=-2
        ).reshape(lead + (tc3 // 3, 3, 10))
    else:
        m1 = material_table[jnp.clip(mesh.tri_type, 0, n_types - 1)]
        m2 = material_table[jnp.clip(mesh.tri_type2, 0, n_types - 1)]
        b = mesh.tri_blend[..., None]
        m = m1 * (1.0 - b) + m2 * b  # [...,3,10]
    lead = m.shape[:-2]  # (..., Tc)
    return mesh._replace(
        tri_albedo=m[..., :, 0:3].reshape(lead + (9,)),
        tri_f0=m[..., :, 3:6].reshape(lead + (9,)),
        tri_rough=m[..., :, 6],
        tri_emissive=m[..., :, 7:10].reshape(lead + (9,)),
    )


compact_mesh_batched = jax.vmap(compact_mesh, in_axes=(0, None, None))
