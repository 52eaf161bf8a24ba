"""Chunk-gated incremental voxel meshing.

Ref: impact_voxel/src/object/sdf.rs:156 (``VoxelChunkSignedDistanceField`` —
an 18³ padded SDF window per 16³ chunk, meshed independently) and
mesh.rs:50-58,360 (``ChunkSubmeshManager`` — per-chunk submesh index ranges
in shared buffers, re-meshed only for invalidated chunks).

TPU redesign: a fixed pool of S chunk-submesh slots shared by every object
(the RangeAllocator analog), each slot holding a corner-major triangle
block of fixed capacity. Per step, up to ``budget`` dirty surface chunks
are gathered as 18³ windows (one `lax.dynamic_slice` each from the padded
pool), meshed with the SAME surface-nets kernel as the dense path, packed
to the slot capacity, and scattered into their slots. Per-step remesh cost
is O(budget · 18³) — it tracks the scene's surface-chunk count, never the
grid volume, which is what makes 64³+ objects affordable (the dense path
re-meshes whole [G³] grids).

Quad merging stays chunk-local (a window never sees its neighbor's lattice),
so chunk borders keep level-0 quads where the dense mesher might merge
across — render output is identical (merging is render-exact), triangle
counts are slightly higher.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import is_encoded, sdf_scale
from .mesh import bake_mesh_materials, compact_mesh, surface_nets
from .object import CHUNK_SIZE, VoxelObjectPool, chunk_codes, CHUNK_NON_UNIFORM

WIN = CHUNK_SIZE + 2  # 18³ padded window (ref: sdf.rs VoxelChunkSignedDistanceField)


class ChunkMeshPool(NamedTuple):
    """S shared chunk-submesh slots (corner-major render layout only — the
    per-frame path never gathers by vertex index, mirroring CompactMesh)."""

    owner: jnp.ndarray  # i32[S] object slot (undefined when ~active)
    chunk: jnp.ndarray  # i32[S] flat chunk id within owner
    active: jnp.ndarray  # bool[S]
    slot_of: jnp.ndarray  # i32[O, C] chunk → slot (-1 = unmeshed/empty)
    chunk_dirty: jnp.ndarray  # bool[O, C] remesh pending
    tri_active: jnp.ndarray  # bool[S, ctc]
    tri_pos: jnp.ndarray  # f32[S, ctc, 9] OBJECT grid units
    tri_normal: jnp.ndarray  # f32[S, ctc, 9]
    tri_type: jnp.ndarray  # i32[S, ctc, 3]
    tri_type2: jnp.ndarray  # i32[S, ctc, 3]
    tri_blend: jnp.ndarray  # f32[S, ctc, 3]
    tri_albedo: jnp.ndarray  # f32[S, ctc, 9] (baked)
    tri_f0: jnp.ndarray  # f32[S, ctc, 9]
    tri_rough: jnp.ndarray  # f32[S, ctc, 3]
    tri_emissive: jnp.ndarray  # f32[S, ctc, 9]
    # cumulative overflow counters ("no silent caps"): triangles beyond the
    # slot capacity, verts beyond the per-chunk cap, and dirty chunks that
    # could not get a slot (pool exhausted)
    n_dropped_verts: jnp.ndarray  # i32[]
    n_dropped_tris: jnp.ndarray  # i32[]
    n_dropped_chunks: jnp.ndarray  # i32[]

    @property
    def n_slots(self) -> int:
        return self.active.shape[0]

    @property
    def tri_cap(self) -> int:
        return self.tri_active.shape[1]


def n_chunks_per_object(grid_size: int) -> int:
    return (grid_size // CHUNK_SIZE) ** 3


def empty_chunk_mesh_pool(
    n_slots: int, tri_cap: int, n_objects: int, grid_size: int
) -> ChunkMeshPool:
    c = n_chunks_per_object(grid_size)
    s, t = n_slots, tri_cap
    return ChunkMeshPool(
        owner=jnp.zeros(s, jnp.int32),
        chunk=jnp.zeros(s, jnp.int32),
        active=jnp.zeros(s, bool),
        slot_of=jnp.full((n_objects, c), -1, jnp.int32),
        chunk_dirty=jnp.zeros((n_objects, c), bool),
        tri_active=jnp.zeros((s, t), bool),
        tri_pos=jnp.zeros((s, t, 9), jnp.float32),
        tri_normal=jnp.zeros((s, t, 9), jnp.float32),
        tri_type=jnp.zeros((s, t, 3), jnp.int32),
        tri_type2=jnp.zeros((s, t, 3), jnp.int32),
        tri_blend=jnp.zeros((s, t, 3), jnp.float32),
        tri_albedo=jnp.zeros((s, t, 9), jnp.float32),
        tri_f0=jnp.zeros((s, t, 9), jnp.float32),
        tri_rough=jnp.zeros((s, t, 3), jnp.float32),
        tri_emissive=jnp.zeros((s, t, 9), jnp.float32),
        n_dropped_verts=jnp.int32(0),
        n_dropped_tris=jnp.int32(0),
        n_dropped_chunks=jnp.int32(0),
    )


def _chunk_coords(chunk_idx, nc):
    cz = chunk_idx % nc
    cy = (chunk_idx // nc) % nc
    cx = chunk_idx // (nc * nc)
    return cx, cy, cz


def extract_chunk_windows(pool: VoxelObjectPool, obj_idx, chunk_idx):
    """18³ SDF (f32 WORLD units) + type windows for (object, chunk) pairs.

    One `dynamic_slice` per pair from the 1-voxel-padded pool; the pad is
    far-positive so windows at the grid boundary mesh exactly like the dense
    path does for surfaces that stay inside the grid (ref: sdf.rs:156
    for_each_exposed_chunk_with_sdf builds the same padded window)."""
    g = pool.grid_size
    nc = g // CHUNK_SIZE
    if is_encoded(pool.sdf):
        pad_val = np.int8(127)
    else:
        pad_val = np.float32(1e3)
    sdf_p = jnp.pad(
        pool.sdf, ((0, 0), (1, 1), (1, 1), (1, 1)), constant_values=pad_val
    )
    typ_p = jnp.pad(pool.vtype, ((0, 0), (1, 1), (1, 1), (1, 1)))

    cx, cy, cz = _chunk_coords(chunk_idx, nc)

    def one(o, x, y, z):
        w = jax.lax.dynamic_slice(
            sdf_p[o],
            (x * CHUNK_SIZE, y * CHUNK_SIZE, z * CHUNK_SIZE),
            (WIN, WIN, WIN),
        )
        t = jax.lax.dynamic_slice(
            typ_p[o],
            (x * CHUNK_SIZE, y * CHUNK_SIZE, z * CHUNK_SIZE),
            (WIN, WIN, WIN),
        )
        return w, t

    win_sdf, win_typ = jax.vmap(one)(obj_idx, cx, cy, cz)
    if is_encoded(pool.sdf):
        win_sdf = win_sdf.astype(jnp.float32) * sdf_scale(
            pool.voxel_extent[obj_idx]
        )[:, None, None, None]
    return win_sdf, win_typ


def remesh_chunks(
    cpool: ChunkMeshPool,
    pool: VoxelObjectPool,
    material_table,
    budget: int,
    vert_cap: int,
    merge_levels: int = 0,
):
    """Re-mesh up to ``budget`` dirty chunks (gathered across all objects).

    Chunks whose windows produce triangles get (or keep) a submesh slot;
    chunks gone surface-less free theirs. Returns the updated pool with the
    processed chunks' dirty flags cleared."""
    g = pool.grid_size
    nc = g // CHUNK_SIZE
    c = nc * nc * nc
    o_max = pool.n_objects
    s_max = cpool.n_slots
    ctc = cpool.tri_cap

    budget = min(budget, o_max * c)
    dirty = cpool.chunk_dirty & pool.alive[:, None]
    # only surface (NON_UNIFORM) chunks can produce triangles; void/uniform
    # dirty chunks just free their slots (no window work)
    codes = chunk_codes(pool).reshape(o_max, c)
    is_surface = codes == CHUNK_NON_UNIFORM

    flat_dirty = dirty.reshape(-1)
    _, picks = jax.lax.top_k(
        flat_dirty.astype(jnp.int32)
        # surface chunks first so the budget is spent on real work
        + (flat_dirty & is_surface.reshape(-1)).astype(jnp.int32),
        budget,
    )
    sel = flat_dirty[picks]
    obj_idx = (picks // c).astype(jnp.int32)
    chunk_idx = (picks % c).astype(jnp.int32)
    surf = sel & is_surface.reshape(-1)[picks]

    # mesh the selected windows (non-surface selections mesh too — their
    # windows are cheap and produce no triangles; masking keeps shapes static)
    win_sdf, win_typ = extract_chunk_windows(pool, obj_idx, chunk_idx)
    meshed = jax.vmap(
        lambda s, t: surface_nets(s, t, merge_levels=merge_levels)
    )(win_sdf, win_typ)
    sub = jax.vmap(compact_mesh, in_axes=(0, None, None))(
        meshed, vert_cap, ctc
    )
    sub = bake_mesh_materials(sub, material_table)

    # window grid units → object grid units: window voxel w is global
    # voxel w + 16·chunk − 1
    cx, cy, cz = _chunk_coords(chunk_idx, nc)
    off = (
        jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32) * CHUNK_SIZE
        - 1.0
    )  # [K,3]
    off9 = jnp.tile(off, (1, 3))[:, None, :]  # [K,1,9]
    tri_act = sub.tri_active & sel[:, None]
    tri_pos = jnp.where(tri_act[..., None], sub.tri_pos + off9, 0.0)

    has_tris = jnp.any(tri_act, axis=-1)  # [K]
    existing = cpool.slot_of.reshape(-1)[picks]  # [K]
    need_alloc = sel & has_tris & (existing < 0)
    keep = sel & has_tris & (existing >= 0)
    release = sel & ~has_tris & (existing >= 0)

    # parallel allocation: k-th allocating pair takes the k-th free slot
    free_rank = jnp.cumsum(need_alloc.astype(jnp.int32)) - 1  # [K]
    free_order = jnp.argsort(cpool.active, stable=True).astype(jnp.int32)
    n_free = jnp.sum(~cpool.active)
    can_alloc = need_alloc & (free_rank < n_free)
    new_slot = free_order[jnp.clip(free_rank, 0, s_max - 1)]
    slot = jnp.where(can_alloc, new_slot, jnp.where(keep, existing, -1))
    write = can_alloc | keep
    wslot = jnp.where(write, slot, s_max)  # out-of-range → dropped write

    def put(dst, src):
        # wslot = s_max for non-writes → dropped; valid write slots are
        # pairwise distinct (existing slots are unique per chunk, new ones
        # come from distinct free-list ranks)
        return dst.at[wslot].set(src, mode="drop")

    rel_slot = jnp.where(release, existing, s_max)
    active = cpool.active.at[rel_slot].set(False, mode="drop")
    active = active.at[wslot].set(True, mode="drop")
    owner = cpool.owner.at[wslot].set(obj_idx, mode="drop")
    chunk = cpool.chunk.at[wslot].set(chunk_idx, mode="drop")
    # slot map: processed chunks point at their (new) slot or -1
    processed = sel
    new_map_val = jnp.where(write, slot, -1)
    slot_of = cpool.slot_of.reshape(-1).at[
        jnp.where(processed, picks, o_max * c)
    ].set(new_map_val, mode="drop").reshape(o_max, c)
    # clear processed dirty flags; unprocessed stay pending. A surface chunk
    # that could not get a slot stays DIRTY (and counts as dropped) so it
    # retries when slots free up.
    blocked = need_alloc & ~can_alloc
    cleared = processed & ~blocked
    chunk_dirty = dirty.reshape(-1).at[
        jnp.where(cleared, picks, o_max * c)
    ].set(False, mode="drop").reshape(o_max, c)

    # free slots of dead objects (distance-rule removal etc.)
    dead = active & ~pool.alive[jnp.clip(cpool.owner, 0, o_max - 1)]
    active = active & ~dead

    return cpool._replace(
        owner=owner,
        chunk=chunk,
        active=active,
        slot_of=slot_of,
        chunk_dirty=chunk_dirty,
        tri_active=put(cpool.tri_active, tri_act),
        tri_pos=put(cpool.tri_pos, tri_pos),
        tri_normal=put(cpool.tri_normal, sub.tri_normal),
        tri_type=put(cpool.tri_type, sub.tri_type),
        tri_type2=put(cpool.tri_type2, sub.tri_type2),
        tri_blend=put(cpool.tri_blend, sub.tri_blend),
        tri_albedo=put(cpool.tri_albedo, sub.tri_albedo),
        tri_f0=put(cpool.tri_f0, sub.tri_f0),
        tri_rough=put(cpool.tri_rough, sub.tri_rough),
        tri_emissive=put(cpool.tri_emissive, sub.tri_emissive),
        n_dropped_verts=cpool.n_dropped_verts
        + jnp.sum(jnp.where(sel, sub.n_dropped_verts, 0)),
        n_dropped_tris=cpool.n_dropped_tris
        + jnp.sum(jnp.where(sel, sub.n_dropped_tris, 0)),
        n_dropped_chunks=cpool.n_dropped_chunks
        + jnp.sum(blocked).astype(jnp.int32),
    )


def mark_chunks_dirty(cpool: ChunkMeshPool, chunk_mask):
    """Flag individual chunks for remesh (``chunk_mask`` bool[O,C]) — the
    chunk-granular invalidation used by the chunk-gated absorber carve
    (ref: mesh.rs:360 — only invalidated chunks re-mesh)."""
    return cpool._replace(chunk_dirty=cpool.chunk_dirty | chunk_mask)


def mark_objects_dirty(cpool: ChunkMeshPool, obj_mask):
    """Flag every chunk of the masked objects for remesh (content changed,
    existing submesh slots are kept and rewritten in place)."""
    return cpool._replace(
        chunk_dirty=cpool.chunk_dirty | obj_mask[:, None]
    )


def reset_objects(cpool: ChunkMeshPool, obj_mask):
    """Detach the masked objects from the submesh pool entirely: free their
    slots, clear their slot maps, and mark all their chunks dirty. Required
    when an object SLOT is reused for a new object (fracture fragments,
    split regions) — its old slot_of entries would otherwise alias slots
    that may have been recycled."""
    o_max = cpool.slot_of.shape[0]
    owned = obj_mask[jnp.clip(cpool.owner, 0, o_max - 1)] & cpool.active
    return cpool._replace(
        active=cpool.active & ~owned,
        slot_of=jnp.where(obj_mask[:, None], -1, cpool.slot_of),
        chunk_dirty=cpool.chunk_dirty | obj_mask[:, None],
    )


def chunk_mesh_scene_fields(
    cpool: ChunkMeshPool,
    pool: VoxelObjectPool,
    body_position,
    body_orientation,
    body_position_prev,
    body_orientation_prev,
):
    """Corner-major RenderScene fields from the chunk-submesh pool (the
    chunked analog of assembly.build_render_scene's voxel part). Slots pose
    by their OWNER object's body."""
    from ..math import quaternion as quat

    s, tc, _ = cpool.tri_pos.shape
    o_max = pool.n_objects
    owner = jnp.clip(cpool.owner, 0, o_max - 1)
    ok_slot = cpool.active & pool.alive[owner]

    ext = pool.voxel_extent[owner][:, None, None]
    org = jnp.tile(pool.origin[owner], (1, 3))[:, None, :]
    local9 = cpool.tri_pos * ext + org

    bidx = pool.body_index[owner]
    q = body_orientation[bidx][:, None, :]
    x = jnp.tile(body_position[bidx], (1, 3))[:, None, :]
    qp = body_orientation_prev[bidx][:, None, :]
    xp = jnp.tile(body_position_prev[bidx], (1, 3))[:, None, :]

    def rot9(qq, p9):
        return jnp.concatenate(
            [quat.rotate(qq, p9[..., 3 * c : 3 * c + 3]) for c in range(3)],
            axis=-1,
        )

    world9 = rot9(q, local9) + x
    world9_prev = rot9(qp, local9) + xp
    normal9 = rot9(q, cpool.tri_normal)

    tri_ok = cpool.tri_active & ok_slot[:, None]
    mat3 = jnp.where(tri_ok[..., None], cpool.tri_type, -1)
    shadows = ok_slot & pool.casts_shadows[owner]
    return dict(
        tri_pos=world9.reshape(-1, 9),
        tri_pos_prev=world9_prev.reshape(-1, 9),
        tri_normal=normal9.reshape(-1, 9),
        tri_albedo=cpool.tri_albedo.reshape(-1, 9),
        tri_f0=cpool.tri_f0.reshape(-1, 9),
        tri_roughness=cpool.tri_rough.reshape(-1, 3),
        tri_emissive=cpool.tri_emissive.reshape(-1, 9),
        tri_material=mat3.reshape(-1, 3),
        tri_active=tri_ok.reshape(-1),
        tri_shadow=(cpool.tri_active & shadows[:, None]).reshape(-1),
    )
