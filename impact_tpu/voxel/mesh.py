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


def surface_nets(sdf, vtype):
    """Mesh one [G,G,G] SDF grid (jit/vmap friendly).

    Vertex at cell (i,j,k) uses corners sdf[i..i+1, j..j+1, k..k+1]; it is
    positioned at the mean of the edge zero-crossings (surface_nets.rs:39-50).
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

        def cells_at(off):
            sl = [slice(1 + off[a], gc + off[a]) for a in range(3)]
            return cell_linear[tuple(sl)]

        c00 = cells_at(offs[0])  # (-1,-1)
        c01 = cells_at(offs[1])  # (-1, 0)
        c10 = cells_at(offs[2])  # ( 0,-1)
        c11 = cells_at(offs[3])  # ( 0, 0)

        # two triangles per quad, wound consistently with the solid side
        t1 = jnp.where(
            flip[..., None],
            jnp.stack([c00, c11, c01], axis=-1),
            jnp.stack([c00, c01, c11], axis=-1),
        )
        t2 = jnp.where(
            flip[..., None],
            jnp.stack([c00, c10, c11], axis=-1),
            jnp.stack([c00, c11, c10], axis=-1),
        )
        tris_idx.append(t1.reshape(-1, 3))
        tris_idx.append(t2.reshape(-1, 3))
        tris_act.append(crossing.reshape(-1))
        tris_act.append(crossing.reshape(-1))

    tri_indices = jnp.concatenate(tris_idx, axis=0)
    tri_active = jnp.concatenate(tris_act, axis=0)

    return SurfaceNetsMesh(
        vert_active=cell_active.reshape(-1),
        vert_pos=vert_pos.reshape(-1, 3),
        vert_normal=normal.reshape(-1, 3),
        vert_type=vert_type.reshape(-1),
        vert_type2=vert_type2.reshape(-1),
        vert_blend=vert_blend.reshape(-1),
        tri_active=tri_active,
        tri_indices=tri_indices,
    )


def _corner_sign(axis):
    """[8] weights (+1 where corner offset along axis is 1, else −1) for the
    corner-difference gradient."""
    return jnp.asarray(
        [1.0 if off[axis] else -1.0 for off in _CORNER_OFFSETS], jnp.float32
    )


surface_nets_batched = jax.vmap(surface_nets)


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


def bake_mesh_materials(mesh: CompactMesh, material_table) -> CompactMesh:
    """Fill the baked corner-material fields from the packed [T,10] table
    (``material_corner_table``): per-corner top-2 type blend, done once per
    remesh instead of per frame. Works on single [Tc,...] or batched
    [O,Tc,...] meshes."""
    n_types = material_table.shape[0]
    m1 = material_table[jnp.clip(mesh.tri_type, 0, n_types - 1)]  # [...,3,10]
    m2 = material_table[jnp.clip(mesh.tri_type2, 0, n_types - 1)]
    b = mesh.tri_blend[..., None]
    m = m1 * (1.0 - b) + m2 * b  # [...,3,10]
    lead = m.shape[:-2]
    return mesh._replace(
        tri_albedo=m[..., :, 0:3].reshape(lead + (9,)),
        tri_f0=m[..., :, 3:6].reshape(lead + (9,)),
        tri_rough=m[..., :, 6],
        tri_emissive=m[..., :, 7:10].reshape(lead + (9,)),
    )


compact_mesh_batched = jax.vmap(compact_mesh, in_axes=(0, None, None))
