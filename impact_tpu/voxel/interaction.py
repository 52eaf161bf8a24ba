"""Voxel deformation: absorption, split detection, region extraction, fracturing.

Ref: impact_voxel/src/interaction/absorption.rs (SDF subtraction of absorber
shapes, incremental inertia, split triggering), object/split_detection.rs
(two-level connected-component labeling), object/extraction.rs (disconnected
region extraction with property transfer), interaction/fracturing.rs (Voronoi
fragmentation seeded around impacts).

TPU redesign (SURVEY.md §7.3.2 — dynamic topology under static shapes):
  * Absorption: one fused grid op — sdf ← max(sdf, −sdf_absorber) per the
    reference's hard subtraction (generation/sdf.rs:79).
  * Split detection: iterative 6-neighbor min-label propagation on the dense
    grid (lax.while_loop to fixpoint) instead of per-chunk disjoint-set
    forests; the grid is small enough that propagation wins on the VPU.
  * Extraction: a disconnected component moves into a FREE pooled object slot
    with masks — no allocation; the rigid-body pool gains a body the same way.
  * Fracturing: the reference samples Voronoi seeds and builds Delaunay →
    Voronoi polyhedra to clip fragments; on a dense grid the Voronoi cell of
    each voxel is simply the argmin-distance seed, so fragmentation is one
    vectorized assignment — no tessellation needed (same geometry, no serial
    host structure).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from .encoding import far_value, is_encoded, encode_sdf_i8, sdf_world
from .object import VoxelObjectPool, occupancy

# --- absorption ----------------------------------------------------------------


class AbsorberPools(NamedTuple):
    """Absorbing spheres/capsules in their parent entity's frame
    (ref: absorption.rs VoxelAbsorbingSphere/Capsule components)."""

    sph_body: jnp.ndarray  # i32[A] parent body slot
    sph_offset: jnp.ndarray  # f32[A,3] center in parent frame
    sph_radius: jnp.ndarray  # f32[A]
    sph_rate: jnp.ndarray  # f32[A] absorption rate (units of sdf shift/step)
    sph_mask: jnp.ndarray  # bool[A]
    # absorbing capsules (ref: absorption.rs VoxelAbsorbingCapsule)
    cap_body: jnp.ndarray  # i32[A]
    cap_start: jnp.ndarray  # f32[A,3] segment start in parent frame
    cap_end: jnp.ndarray  # f32[A,3]
    cap_radius: jnp.ndarray  # f32[A]
    cap_rate: jnp.ndarray  # f32[A]
    cap_mask: jnp.ndarray  # bool[A]


def empty_absorber_pools(cap: int = 8) -> AbsorberPools:
    return AbsorberPools(
        sph_body=jnp.zeros(cap, jnp.int32),
        sph_offset=jnp.zeros((cap, 3), jnp.float32),
        sph_radius=jnp.ones(cap, jnp.float32),
        sph_rate=jnp.ones(cap, jnp.float32),
        sph_mask=jnp.zeros(cap, bool),
        cap_body=jnp.zeros(cap, jnp.int32),
        cap_start=jnp.zeros((cap, 3), jnp.float32),
        cap_end=jnp.zeros((cap, 3), jnp.float32),
        cap_radius=jnp.ones(cap, jnp.float32),
        cap_rate=jnp.ones(cap, jnp.float32),
        cap_mask=jnp.zeros(cap, bool),
    )


def apply_absorption(
    pool: VoxelObjectPool,
    absorbers: AbsorberPools,
    body_position,
    body_orientation,
    gate_cap: int | None = None,
) -> VoxelObjectPool:
    """Subtract absorber SDFs from intersecting objects (ref: absorption.rs:434
    — the reference only visits chunks inside each absorber's AABB).

    With ``gate_cap`` set, a bounding-sphere prefilter picks the ≤gate_cap
    objects that actually overlap an absorber and the dense per-voxel pass
    runs on that gathered sub-pool only — cost O(K·G³·A), not O(O·G³·A)
    (VERDICT-r2 weak item 10). gate_cap=None runs dense over the whole pool.
    """
    if gate_cap is not None and gate_cap < pool.n_objects:
        return _apply_absorption_gated(
            pool, absorbers, body_position, body_orientation, gate_cap
        )
    return _apply_absorption_dense(
        pool, absorbers, body_position, body_orientation
    )


def deferred_absorption_count(
    pool, absorbers, body_position, body_orientation, gate_cap: int
):
    """i32: absorber-overlapping objects beyond ``gate_cap`` — the work the
    gated absorption pass defers to the next step. Deferral is one step of
    lag, not loss (absorbers move continuously), but it must be auditable
    like every other cap in the pipeline ("no silent caps"); callers log or
    assert on this the way they do for mesh/raster drop counters."""
    hit = _absorber_overlap_mask(
        pool, absorbers, body_position, body_orientation
    )
    if gate_cap >= pool.n_objects:
        return jnp.int32(0)  # dense path: nothing is ever deferred
    return jnp.maximum(
        jnp.sum(hit, dtype=jnp.int32) - jnp.int32(gate_cap), 0
    )


def _absorber_overlap_mask(pool, absorbers, body_position, body_orientation):
    """bool[O]: object bounding sphere intersects any active absorber."""
    from .collision import bounding_radii
    from ..geometry.primitives import capsule_sdf

    centers = body_position[pool.body_index]
    radii = bounding_radii(pool)
    c_w = body_position[absorbers.sph_body] + quat.rotate(
        body_orientation[absorbers.sph_body], absorbers.sph_offset
    )
    d_sph = (
        jnp.linalg.norm(centers[:, None, :] - c_w[None, :, :], axis=-1)
        - absorbers.sph_radius[None, :] - radii[:, None]
    )
    hit = jnp.any((d_sph < 0.0) & absorbers.sph_mask[None, :], axis=1)
    a_w = body_position[absorbers.cap_body] + quat.rotate(
        body_orientation[absorbers.cap_body], absorbers.cap_start
    )
    b_w = body_position[absorbers.cap_body] + quat.rotate(
        body_orientation[absorbers.cap_body], absorbers.cap_end
    )
    d_cap = capsule_sdf(
        a_w[None, :, :], b_w[None, :, :], absorbers.cap_radius[None, :],
        centers[:, None, :],
    ) - radii[:, None]
    hit = hit | jnp.any((d_cap < 0.0) & absorbers.cap_mask[None, :], axis=1)
    return hit & pool.alive


def _apply_absorption_gated(
    pool, absorbers, body_position, body_orientation, gate_cap: int
):
    """Gather the ≤gate_cap absorber-overlapping objects, absorb densely on
    the sub-pool, scatter the results back. Overflow beyond the cap is
    deferred: untouched objects keep their SDF and are re-tested next step
    (absorbers move continuously, so deferral is one step of lag, not loss).
    """
    hit = _absorber_overlap_mask(pool, absorbers, body_position, body_orientation)
    order = jnp.argsort(~hit, stable=True)[:gate_cap].astype(jnp.int32)
    sel = hit[order]  # [K]
    sub = jax.tree.map(lambda a: a[order], pool)
    sub2 = _apply_absorption_dense(
        sub, absorbers, body_position, body_orientation
    )
    sdf = pool.sdf.at[order].set(
        jnp.where(sel[:, None, None, None], sub2.sdf, pool.sdf[order])
    )
    dirty = pool.mesh_dirty.at[order].set(
        jnp.where(sel, sub2.mesh_dirty, pool.mesh_dirty[order])
    )
    pending = pool.split_pending.at[order].set(
        jnp.where(sel, sub2.split_pending, pool.split_pending[order])
    )
    return pool._replace(sdf=sdf, mesh_dirty=dirty, split_pending=pending)


def _absorber_sdf_at(absorbers, body_position, body_orientation, pos_world):
    """Min SDF over all active absorbers at world points ``pos_world``
    [...,3] → [...] (+inf where no absorber is active)."""
    from ..geometry.primitives import capsule_sdf

    lead = pos_world.ndim - 1
    exp = (None,) * lead  # broadcast absorber axis behind the point axes

    c_w = body_position[absorbers.sph_body] + quat.rotate(
        body_orientation[absorbers.sph_body], absorbers.sph_offset
    )  # [A,3]
    d = (
        jnp.linalg.norm(
            pos_world[..., None, :] - c_w[exp + (slice(None), slice(None))],
            axis=-1,
        )
        - absorbers.sph_radius[exp + (slice(None),)]
    )
    d = jnp.where(absorbers.sph_mask[exp + (slice(None),)], d, jnp.inf)
    d_abs = jnp.min(d, axis=-1)

    a_w = body_position[absorbers.cap_body] + quat.rotate(
        body_orientation[absorbers.cap_body], absorbers.cap_start
    )
    b_w = body_position[absorbers.cap_body] + quat.rotate(
        body_orientation[absorbers.cap_body], absorbers.cap_end
    )
    d_cap = capsule_sdf(
        a_w[exp + (slice(None), slice(None))],
        b_w[exp + (slice(None), slice(None))],
        absorbers.cap_radius[exp + (slice(None),)],
        pos_world[..., None, :],
    )
    d_cap = jnp.where(
        absorbers.cap_mask[exp + (slice(None),)], d_cap, jnp.inf
    )
    return jnp.minimum(d_abs, jnp.min(d_cap, axis=-1))


def _apply_absorption_dense(
    pool: VoxelObjectPool,
    absorbers: AbsorberPools,
    body_position,
    body_orientation,
) -> VoxelObjectPool:
    """Dense per-voxel absorption over the given (sub-)pool."""
    from .object import voxel_positions_local

    o = pool.n_objects
    g = pool.grid_size
    pos_local = voxel_positions_local(pool)  # [O,G,G,G,3]
    q_b = body_orientation[pool.body_index]
    x_b = body_position[pool.body_index]
    pos_world = (
        quat.rotate(q_b[:, None, None, None, :], pos_local) + x_b[:, None, None, None, :]
    )
    d_abs = _absorber_sdf_at(
        absorbers, body_position, body_orientation, pos_world
    )  # [O,G,G,G]

    if is_encoded(pool.sdf):
        world_sdf = sdf_world(pool.sdf, pool.voxel_extent)
        new_sdf = encode_sdf_i8(
            jnp.maximum(world_sdf, -d_abs), pool.voxel_extent[:, None, None, None]
        )
        changed = jnp.any(new_sdf != pool.sdf, axis=(1, 2, 3))
    else:
        new_sdf = jnp.maximum(pool.sdf, -d_abs)
        changed = jnp.any(jnp.abs(new_sdf - pool.sdf) > 1e-7, axis=(1, 2, 3))
    changed = changed & pool.alive
    return pool._replace(
        sdf=jnp.where(pool.alive[:, None, None, None], new_sdf, pool.sdf),
        mesh_dirty=pool.mesh_dirty | changed,
        split_pending=pool.split_pending | changed,
    )


def _chunk_absorber_hit(pool, absorbers, body_position, body_orientation):
    """bool[O, C]: the chunk's padded 18³ mesh window (core 16³ + 1 voxel)
    may intersect an active absorber, tested by window bounding sphere.

    The PADDED window is the conservative unit: any voxel an absorber can
    change lies in the padded windows of every chunk whose remesh reads it,
    so carving + dirty-marking driven by this mask can never miss a chunk
    whose submesh depends on a changed voxel (ref: absorption.rs:434 — the
    reference visits chunks inside the absorber AABB the same way)."""
    from .object import CHUNK_SIZE

    g = pool.grid_size
    nc = g // CHUNK_SIZE
    r = jnp.arange(nc, dtype=jnp.float32) * CHUNK_SIZE + CHUNK_SIZE / 2.0
    ci, cj, ck = jnp.meshgrid(r, r, r, indexing="ij")
    centers_grid = jnp.stack([ci, cj, ck], axis=-1).reshape(-1, 3)  # [C,3]
    ext = pool.voxel_extent  # [O]
    centers_local = (
        centers_grid[None] * ext[:, None, None] + pool.origin[:, None, :]
    )  # [O,C,3]
    q_b = body_orientation[pool.body_index][:, None, :]
    x_b = body_position[pool.body_index][:, None, :]
    centers_world = quat.rotate(q_b, centers_local) + x_b
    # half-diagonal of the 18³ window (9 voxels per half-axis)
    win_r = 9.0 * jnp.sqrt(3.0) * ext[:, None]  # [O,1]
    d = _absorber_sdf_at(
        absorbers, body_position, body_orientation, centers_world
    )  # [O,C]
    return (d < win_r) & pool.alive[:, None]


def apply_absorption_chunk_gated(
    pool: VoxelObjectPool,
    absorbers: AbsorberPools,
    body_position,
    body_orientation,
    pair_budget: int,
    rotation=0,
):
    """Chunk-gated absorption: carve only the ≤``pair_budget`` (object,
    chunk) 16³ windows whose padded AABBs overlap an active absorber —
    cost O(B·16³·A) independent of the grid volume, the TPU analog of the
    reference's per-chunk absorber visit (absorption.rs:434 visits only
    chunks inside each absorber's AABB; object.rs:75-101 chunked grids).

    ``rotation`` (i32, typically step_count · pair_budget) round-robins the
    selection among overlapped chunks so a slow-moving absorber with more
    overlap than budget cannot starve high-index chunks: the priority
    window advances by ``rotation`` per call, covering every hit within
    ⌈hits/budget⌉ calls.

    Unlike :func:`apply_absorption`, does NOT set ``mesh_dirty`` (the
    caller decides between chunk-granular and whole-object invalidation);
    ``split_pending`` is set on changed objects as usual.

    Returns ``(pool, changed bool[O], dirty_chunks bool[O,C], deferred
    i32)``: ``dirty_chunks`` marks every absorber-overlapped chunk of every
    changed object (conservative: a changed voxel dirties all chunks whose
    18³ mesh window can read it, all of which are overlap-hits by
    construction); ``deferred`` counts overlapped chunks beyond the budget,
    left to later steps (absorbers move continuously — one step of lag,
    not loss, same contract as the object-gated path)."""
    from .encoding import encode_sdf_i8, is_encoded, sdf_scale
    from .object import CHUNK_SIZE

    g = pool.grid_size
    nc = g // CHUNK_SIZE
    c = nc * nc * nc
    o_max = pool.n_objects

    hit = _chunk_absorber_hit(
        pool, absorbers, body_position, body_orientation
    )  # [O,C]
    flat = hit.reshape(-1)
    budget = min(pair_budget, o_max * c)
    n_flat = o_max * c
    rank = (
        jnp.arange(n_flat, dtype=jnp.int32) + jnp.int32(rotation)
    ) % n_flat
    _, picks = jax.lax.top_k(jnp.where(flat, rank + 1, 0), budget)
    sel = flat[picks]  # [B]
    o_idx = (picks // c).astype(jnp.int32)
    ch_idx = (picks % c).astype(jnp.int32)
    cz = ch_idx % nc
    cy = (ch_idx // nc) % nc
    cx = ch_idx // (nc * nc)

    def one(o, x, y, z):
        return jax.lax.dynamic_slice(
            pool.sdf,
            (o, x * CHUNK_SIZE, y * CHUNK_SIZE, z * CHUNK_SIZE),
            (1, CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE),
        )[0]

    win = jax.vmap(one)(o_idx, cx, cy, cz)  # [B,16,16,16]

    # world positions of the window voxels
    ar = jnp.arange(CHUNK_SIZE, dtype=jnp.float32) + 0.5
    wi, wj, wk = jnp.meshgrid(ar, ar, ar, indexing="ij")
    base = (
        jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32) * CHUNK_SIZE
    )  # [B,3]
    grid_pos = (
        jnp.stack([wi, wj, wk], axis=-1)[None] + base[:, None, None, None, :]
    )  # [B,16,16,16,3]
    ext = pool.voxel_extent[o_idx]  # [B]
    origin = pool.origin[o_idx]  # [B,3]
    pos_local = (
        grid_pos * ext[:, None, None, None, None]
        + origin[:, None, None, None, :]
    )
    bidx = pool.body_index[o_idx]
    q_b = body_orientation[bidx][:, None, None, None, :]
    x_b = body_position[bidx][:, None, None, None, :]
    pos_world = quat.rotate(q_b, pos_local) + x_b
    d_abs = _absorber_sdf_at(
        absorbers, body_position, body_orientation, pos_world
    )  # [B,16,16,16]

    if is_encoded(pool.sdf):
        scale = sdf_scale(ext)[:, None, None, None]
        world = win.astype(jnp.float32) * scale
        new_win = encode_sdf_i8(
            jnp.maximum(world, -d_abs), ext[:, None, None, None]
        )
    else:
        new_win = jnp.maximum(win, -d_abs)
    changed_pair = sel & jnp.any(new_win != win, axis=(1, 2, 3))

    # scatter the carved windows back (selected chunks are distinct →
    # disjoint voxel ranges → no write collisions)
    arn = jnp.arange(CHUNK_SIZE, dtype=jnp.int32)
    gx = cx[:, None] * CHUNK_SIZE + arn[None]  # [B,16]
    gy = cy[:, None] * CHUNK_SIZE + arn[None]
    gz = cz[:, None] * CHUNK_SIZE + arn[None]
    idx = (
        (
            (o_idx[:, None, None, None] * g + gx[:, :, None, None]) * g
            + gy[:, None, :, None]
        )
        * g
        + gz[:, None, None, :]
    )  # [B,16,16,16]
    idx = jnp.where(sel[:, None, None, None], idx, o_max * g * g * g)
    sdf = (
        pool.sdf.reshape(-1)
        .at[idx.reshape(-1)]
        .set(new_win.reshape(-1), mode="drop")
        .reshape(pool.sdf.shape)
    )

    changed = (
        jnp.zeros(o_max, bool)
        .at[jnp.where(changed_pair, o_idx, o_max)]
        .set(True, mode="drop")
    )
    dirty_chunks = hit & changed[:, None]
    deferred = jnp.maximum(
        jnp.sum(hit, dtype=jnp.int32) - jnp.sum(sel, dtype=jnp.int32), 0
    )
    return (
        pool._replace(sdf=sdf, split_pending=pool.split_pending | changed),
        changed,
        dirty_chunks,
        deferred,
    )


# --- split detection ----------------------------------------------------------


def connected_component_labels(occ, max_iters: int | None = None):
    """Label occupied voxels of one [G,G,G] grid by min-label propagation.

    Returns i32[G,G,G]: linear-index-based labels, −1 for empty voxels.
    Converges when every component's minimum linear index has flooded it
    (ref algorithm role: split_detection.rs two-level CCL).

    For G ≥ 64 the TWO-LEVEL path runs instead (the reference's own
    chunked design, split_detection.rs:15-35): full-grid propagation needs
    worst-case O(G) sweeps of O(G³) work for components spanning the grid,
    while the two-level pass confines sweeps to 16³ chunks and contracts
    the chunk-boundary label graph with scatter-min + pointer jumping —
    the label table converges in O(log) rounds of O(G³)-bandwidth work.
    """
    g = occ.shape[0]
    if g >= 64 and g % 16 == 0:
        return connected_component_labels_two_level(occ)
    if jax.default_backend() == "tpu":
        # multi-sweep VMEM kernel: one HBM round trip per 16 propagation
        # sweeps instead of per sweep (ops/ccl_pallas.py)
        from ..ops.ccl_pallas import connected_component_labels_pallas

        return connected_component_labels_pallas(occ, max_iters)
    lin = jnp.arange(g * g * g, dtype=jnp.int32).reshape(g, g, g)
    big = jnp.int32(g * g * g)
    labels0 = jnp.where(occ, lin, big)
    if max_iters is None:
        # g³ is the worst-case shortest-path length through the grid (a
        # serpentine component), so the loop provably reaches the fixpoint;
        # the while_loop early-exits at convergence so typical cost is O(g).
        max_iters = g * g * g

    def propagate(labels):
        m = labels
        for axis in range(3):
            fwd = jnp.concatenate(
                [
                    jnp.take(labels, jnp.arange(1, g), axis=axis),
                    jnp.take(labels, jnp.arange(g - 1, g), axis=axis) * 0 + big,
                ],
                axis=axis,
            )
            bwd = jnp.concatenate(
                [
                    jnp.take(labels, jnp.arange(0, 1), axis=axis) * 0 + big,
                    jnp.take(labels, jnp.arange(0, g - 1), axis=axis),
                ],
                axis=axis,
            )
            m = jnp.minimum(m, jnp.minimum(fwd, bwd))
        return jnp.where(occ, m, big)

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = propagate(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.asarray(True), jnp.asarray(0))
    )
    return jnp.where(occ, labels, -1)


def connected_component_labels_two_level(occ):
    """Two-level CCL: per-chunk min-label propagation, then chunk-boundary
    label-graph contraction (ref: split_detection.rs:15-35 — per-chunk
    disjoint-set forests merged across chunk faces).

    Phase 1 confines the 6-neighbor sweeps to 16³ chunks (fixpoint in ≤16
    typical sweeps regardless of G); phase 2 treats each chunk-component
    label as a graph node, relaxes the cross-boundary edges with
    scatter-min, and pointer-jumps the label table to its fixpoint. Labels
    are identical to :func:`connected_component_labels`: the component's
    minimum linear index, −1 for empty voxels."""
    from .object import CHUNK_SIZE

    g = occ.shape[0]
    nc = g // CHUNK_SIZE
    ch = CHUNK_SIZE
    n = g * g * g
    big = jnp.int32(n)
    lin = jnp.arange(n, dtype=jnp.int32).reshape(g, g, g)
    labels0 = jnp.where(occ, lin, big)
    occ6 = occ.reshape(nc, ch, nc, ch, nc, ch)

    def chunk_propagate(labels):
        l6 = labels.reshape(nc, ch, nc, ch, nc, ch)
        m = l6
        for axis in (1, 3, 5):
            fwd = jnp.concatenate(
                [
                    jnp.take(l6, jnp.arange(1, ch), axis=axis),
                    jnp.take(l6, jnp.arange(ch - 1, ch), axis=axis) * 0
                    + big,
                ],
                axis=axis,
            )
            bwd = jnp.concatenate(
                [
                    jnp.take(l6, jnp.arange(0, 1), axis=axis) * 0 + big,
                    jnp.take(l6, jnp.arange(0, ch - 1), axis=axis),
                ],
                axis=axis,
            )
            m = jnp.minimum(m, jnp.minimum(fwd, bwd))
        return jnp.where(occ6, m, big).reshape(g, g, g)

    def cond1(state):
        _, changed, it = state
        # ch³ is the provable within-chunk fixpoint bound (serpentine);
        # the early exit makes typical cost ~ch sweeps
        return changed & (it < ch * ch * ch)

    def body1(state):
        labels, _, it = state
        new = chunk_propagate(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond1, body1, (labels0, jnp.asarray(True), jnp.asarray(0))
    )

    # phase 2: cross-boundary edges (la, lb) between chunk-component labels
    edges_a, edges_b = [], []
    for axis in range(3):
        hi = jnp.take(labels, jnp.arange(ch - 1, g - 1, ch), axis=axis)
        lo = jnp.take(labels, jnp.arange(ch, g, ch), axis=axis)
        edges_a.append(hi.reshape(-1))
        edges_b.append(lo.reshape(-1))
    la = jnp.concatenate(edges_a)
    lb = jnp.concatenate(edges_b)
    both = (la < big) & (lb < big)
    la = jnp.where(both, la, big)
    lb = jnp.where(both, lb, big)

    t0 = jnp.arange(n, dtype=jnp.int32)

    def body2(state):
        t, _, it = state
        m = jnp.minimum(t[jnp.minimum(la, n - 1)], t[jnp.minimum(lb, n - 1)])
        m = jnp.where(both, m, big)
        t2 = t.at[la].min(m, mode="drop")
        t2 = t2.at[lb].min(m, mode="drop")
        t2 = jnp.minimum(t2, t2[t2])  # pointer jumping
        return t2, jnp.any(t2 != t), it + 1

    def cond2(state):
        _, changed, it = state
        # scatter-min + pointer jumping halves representative distances each
        # round; n is a loose safety bound, the early exit fires in O(log)
        return changed & (it < n)

    table, _, _ = jax.lax.while_loop(
        cond2, body2, (t0, jnp.asarray(True), jnp.asarray(0))
    )
    final = table[jnp.minimum(labels, n - 1)]
    return jnp.where(occ, final, -1)


def split_off_disconnected_region(pool: VoxelObjectPool, obj_index, free_slot):
    """If object ``obj_index`` has >1 connected component, move the smallest
    into ``free_slot`` (ref: extraction.rs:78 extract_any_disconnected_region /
    :121 extract_smallest_region...). Jit-safe: no-ops when connected or when
    free_slot < 0. Returns (pool, did_split, disconnected) — ``disconnected``
    is reported separately so a split blocked on pool capacity stays pending."""
    occ = occupancy(pool)[obj_index]
    labels = connected_component_labels(occ)
    root = jnp.max(jnp.where(occ, labels, -1))  # any existing label
    min_label = jnp.min(jnp.where(occ, labels, jnp.int32(1 << 30)))
    # count voxels per label: smallest component = label with fewer voxels.
    # With ≤2 components expected per event (reference splits one at a time),
    # compare the min-label component vs the rest.
    in_min = occ & (labels == min_label)
    n_min = jnp.sum(in_min)
    n_tot = jnp.sum(occ)
    disconnected = (n_min > 0) & (n_min < n_tot)
    can = disconnected & (free_slot >= 0) & ~pool.alive[jnp.maximum(free_slot, 0)]

    move_min = n_min <= (n_tot - n_min)
    region = jnp.where(move_min, in_min, occ & ~in_min)

    src_sdf = pool.sdf[obj_index]
    far = far_value(pool.sdf.dtype, pool.voxel_extent[obj_index])
    # source keeps complement; extracted region gets the values
    new_src_sdf = jnp.where(region, far, src_sdf)
    new_dst_sdf = jnp.where(region, src_sdf, far)

    slot = jnp.maximum(free_slot, 0)
    pool = pool._replace(
        split_pending=pool.split_pending.at[obj_index]
        .set(jnp.where(can, True, pool.split_pending[obj_index]))
        .at[slot]
        .set(jnp.where(can, True, pool.split_pending[slot])),
        sdf=pool.sdf.at[obj_index].set(jnp.where(can, new_src_sdf, src_sdf)).at[
            slot
        ].set(jnp.where(can, new_dst_sdf, pool.sdf[slot])),
        vtype=pool.vtype.at[slot].set(
            jnp.where(can, pool.vtype[obj_index], pool.vtype[slot])
        ),
        voxel_extent=pool.voxel_extent.at[slot].set(
            jnp.where(can, pool.voxel_extent[obj_index], pool.voxel_extent[slot])
        ),
        origin=pool.origin.at[slot].set(
            jnp.where(can, pool.origin[obj_index], pool.origin[slot])
        ),
        alive=pool.alive.at[slot].set(jnp.where(can, True, pool.alive[slot])),
        mesh_dirty=pool.mesh_dirty.at[obj_index]
        .set(jnp.where(can, True, pool.mesh_dirty[obj_index]))
        .at[slot]
        .set(jnp.where(can, True, pool.mesh_dirty[slot])),
    )
    return pool, can, disconnected


def split_off_disconnected_regions(pool: VoxelObjectPool, obj_index, free_slots):
    """Extract up to ``len(free_slots)`` disconnected regions of object
    ``obj_index`` in ONE labeling pass (ref: extraction.rs:78 — the
    reference extracts regions as it finds them; extraction order here is
    by component label rather than smallest-first, which only affects
    which fragment keeps the source's slot/body).

    ``free_slots``: i32[R] distinct free pool slots (-1 = unavailable).
    Each extracted region is one connected component, so new slots are NOT
    marked split-pending. Returns (pool, n_split i32, disconnected_after
    bool — components still remain in the source, e.g. blocked on slots)."""
    occ = occupancy(pool)[obj_index]
    labels = connected_component_labels(occ)
    src_sdf = pool.sdf[obj_index]
    far = far_value(pool.sdf.dtype, pool.voxel_extent[obj_index])
    big = jnp.int32(1 << 30)
    n_regions = free_slots.shape[0]

    remaining = occ
    new_src_sdf = src_sdf
    n_split = jnp.int32(0)
    sdf = pool.sdf
    vtype = pool.vtype
    voxel_extent = pool.voxel_extent
    origin = pool.origin
    alive = pool.alive
    mesh_dirty = pool.mesh_dirty
    split_pending = pool.split_pending

    for r in range(n_regions):
        lab = jnp.where(remaining, labels, big)
        lmin = jnp.min(lab)
        lmax = jnp.max(jnp.where(remaining, labels, -1))
        has_two = lmin < lmax  # >1 component still in the source
        slot = free_slots[r]
        slotc = jnp.maximum(slot, 0)
        can = has_two & (slot >= 0) & ~alive[slotc]
        region = remaining & (labels == lmin)
        dst_sdf = jnp.where(region, new_src_sdf, far)
        sdf = sdf.at[slotc].set(jnp.where(can, dst_sdf, sdf[slotc]))
        vtype = vtype.at[slotc].set(
            jnp.where(can, pool.vtype[obj_index], vtype[slotc])
        )
        voxel_extent = voxel_extent.at[slotc].set(
            jnp.where(can, pool.voxel_extent[obj_index], voxel_extent[slotc])
        )
        origin = origin.at[slotc].set(
            jnp.where(can, pool.origin[obj_index], origin[slotc])
        )
        alive = alive.at[slotc].set(jnp.where(can, True, alive[slotc]))
        mesh_dirty = mesh_dirty.at[slotc].set(
            jnp.where(can, True, mesh_dirty[slotc])
        )
        split_pending = split_pending.at[slotc].set(
            jnp.where(can, False, split_pending[slotc])
        )
        new_src_sdf = jnp.where(can & region, far, new_src_sdf)
        remaining = jnp.where(can, remaining & ~region, remaining)
        n_split = n_split + can.astype(jnp.int32)

    did_any = n_split > 0
    lab = jnp.where(remaining, labels, big)
    disconnected_after = jnp.min(lab) < jnp.max(
        jnp.where(remaining, labels, -1)
    )
    sdf = sdf.at[obj_index].set(
        jnp.where(did_any, new_src_sdf, sdf[obj_index])
    )
    mesh_dirty = mesh_dirty.at[obj_index].set(
        jnp.where(did_any, True, mesh_dirty[obj_index])
    )
    # the source's pending flag reflects whether components remain (the
    # connectivity check just ran — a confirmed-connected source clears)
    split_pending = split_pending.at[obj_index].set(disconnected_after)
    return (
        pool._replace(
            sdf=sdf, vtype=vtype, voxel_extent=voxel_extent, origin=origin,
            alive=alive, mesh_dirty=mesh_dirty, split_pending=split_pending,
        ),
        n_split,
        disconnected_after,
    )


# --- fracturing -----------------------------------------------------------------


def sample_fracture_seeds(
    rng_key,
    impact_point_local,
    inward_dir,
    fracture_radius,
    n_seeds: int,
    boundary_polar_grid_size: int = 3,
    boundary_azimuthal_grid_size: int = 6,
    boundary_angular_jitter: float = 0.8,
    boundary_radial_jitter: float = 0.2,
    radial_falloff_power: float = 2.0,
    angular_falloff_power: float = 0.5,
):
    """Voronoi seed positions around an impact (body frame) [S,3].

    Ref: fracturing.rs:42-45,878-935 — seeds on jittered polar/azimuthal
    boundary grids about the impact direction, with radial and angular
    falloff powers concentrating fragments near the impact. The grid indices
    tile (polar × azimuthal) across the seed count; jitter and power-law
    radii come from the seeded PRNG (deterministic per event).
    """
    kt, kp, kr = jax.random.split(rng_key, 3)
    i = jnp.arange(n_seeds)
    npol = max(1, boundary_polar_grid_size)
    nazi = max(1, boundary_azimuthal_grid_size)
    pol = (i % npol).astype(jnp.float32)
    azi = ((i // npol) % nazi).astype(jnp.float32)

    ju = jax.random.uniform(kt, (n_seeds,), minval=-0.5, maxval=0.5)
    jv = jax.random.uniform(kp, (n_seeds,), minval=-0.5, maxval=0.5)
    # polar angle from the inward axis with angular falloff
    u_theta = jnp.clip((pol + 0.5 + boundary_angular_jitter * ju) / npol, 0.0, 1.0)
    theta = (0.5 * jnp.pi) * u_theta ** (1.0 / (1.0 + angular_falloff_power))
    phi = (azi + 0.5 + boundary_angular_jitter * jv) / nazi * (2.0 * jnp.pi)
    # radius with radial falloff (higher power → nearer the impact)
    u_r = jax.random.uniform(kr, (n_seeds,))
    u_r = jnp.clip(u_r * (1.0 + boundary_radial_jitter), 0.0, 1.0)
    r = fracture_radius * u_r ** ((1.0 + radial_falloff_power) / 3.0)

    # orthonormal frame about the inward direction
    z = inward_dir / jnp.maximum(jnp.linalg.norm(inward_dir), 1e-9)
    helper = jnp.where(
        jnp.abs(z[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
    )
    x = jnp.cross(helper, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    dirs = (
        st[:, None] * jnp.cos(phi)[:, None] * x[None]
        + st[:, None] * jnp.sin(phi)[:, None] * y[None]
        + ct[:, None] * z[None]
    )
    return impact_point_local[None, :] + r[:, None] * dirs


def fracture_object(
    pool: VoxelObjectPool,
    obj_index,
    impact_point_local,
    rng_key,
    free_slots,
    fracture_radius,
    n_seeds: int,
    impact_cfg=None,
):
    """Voronoi-fragment the region of ``obj_index`` within ``fracture_radius``
    of the impact point (body frame). Fragment s>0 moves into free_slots[s-1];
    fragment 0 stays in the source object.

    Ref: fracturing.rs:338-935 — seeds sampled on jittered boundary grids
    with radial/angular falloff, Voronoi cells extracted per seed (via
    Delaunay → polyhedron clipping there). On a dense grid the Voronoi cell
    of each voxel is the argmin-distance seed, so fragmentation is one
    vectorized assignment; all fragments are carved in the same step.
    ``free_slots`` i32[n_seeds-1]: pool slots for fragments (−1 = unavailable;
    those fragments stay with the source).
    """
    from .object import voxel_positions_local

    occ = occupancy(pool)[obj_index]
    pos = voxel_positions_local(pool)[obj_index]  # [G,G,G,3] body frame

    inward = -impact_point_local  # toward the object interior (COM at origin)
    kw = {}
    if impact_cfg is not None:
        kw = dict(
            boundary_polar_grid_size=impact_cfg.boundary_polar_grid_size,
            boundary_azimuthal_grid_size=impact_cfg.boundary_azimuthal_grid_size,
            boundary_angular_jitter=impact_cfg.boundary_angular_jitter,
            boundary_radial_jitter=impact_cfg.boundary_radial_jitter,
            radial_falloff_power=impact_cfg.radial_falloff_power,
            angular_falloff_power=impact_cfg.angular_falloff_power,
        )
    seeds = sample_fracture_seeds(
        rng_key, impact_point_local, inward, fracture_radius, n_seeds, **kw
    )  # [S,3]

    d2 = jnp.sum(
        (pos[:, :, :, None, :] - seeds[None, None, None, :, :]) ** 2, axis=-1
    )  # [G,G,G,S]
    assignment = jnp.argmin(d2, axis=-1)  # [G,G,G]

    in_radius = (
        jnp.linalg.norm(pos - impact_point_local[None, None, None, :], axis=-1)
        <= fracture_radius
    )
    frag_region = occ & in_radius

    src_sdf = pool.sdf[obj_index]
    far = far_value(pool.sdf.dtype, pool.voxel_extent[obj_index])

    # [S-1,G,G,G] per-fragment regions, vectorized over fragments
    frag_ids = jnp.arange(1, n_seeds)
    region_s = frag_region[None] & (
        assignment[None] == frag_ids[:, None, None, None]
    )
    any_s = jnp.any(region_s, axis=(1, 2, 3))  # [S-1]
    ok = (free_slots >= 0) & ~pool.alive[jnp.maximum(free_slots, 0)] & any_s
    # disabled fragments scatter to an out-of-range slot (mode="drop") so
    # clamped -1 entries can never collide with a genuine fragment write
    slots = jnp.where(ok, jnp.maximum(free_slots, 0), pool.n_objects)

    frag_sdf = jnp.where(region_s, src_sdf[None], far)
    sdf_all = pool.sdf.at[slots].set(frag_sdf, mode="drop")
    vt_all = pool.vtype.at[slots].set(
        jnp.broadcast_to(pool.vtype[obj_index][None], region_s.shape),
        mode="drop",
    )
    origin = pool.origin.at[slots].set(
        jnp.broadcast_to(pool.origin[obj_index][None], (n_seeds - 1, 3)),
        mode="drop",
    )
    extent = pool.voxel_extent.at[slots].set(
        jnp.broadcast_to(pool.voxel_extent[obj_index], (n_seeds - 1,)),
        mode="drop",
    )
    alive = pool.alive.at[slots].set(True, mode="drop")
    dirty = pool.mesh_dirty.at[slots].set(True, mode="drop")

    moved = jnp.any(region_s & ok[:, None, None, None], axis=0)  # [G,G,G]
    new_src = jnp.where(moved, far, src_sdf)
    sdf_all = sdf_all.at[obj_index].set(new_src)
    dirty = dirty.at[obj_index].set(True)
    pending = pool.split_pending | (dirty & alive)
    return pool._replace(
        sdf=sdf_all, vtype=vt_all, alive=alive, mesh_dirty=dirty,
        split_pending=pending, origin=origin, voxel_extent=extent,
    )
