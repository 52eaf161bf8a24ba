"""Voxel-object collision: probe points vs analytic shapes and other voxels.

Ref: impact_voxel/src/collidable.rs — the reference derives collision probes
from surface mesh vertices (one per 4³ voxel block, :85-101), generates
contacts by testing probes against the other collidable: plane/sphere/capsule
analytically (:1051-1210) and voxel-vs-voxel by probing the other object's SDF
(:791).

TPU redesign: probes are a fixed [O, B³] pool (B = G/4 blocks per axis), each
block contributing its surface voxel of minimal |sdf| (mask when none). All
probe-vs-shape tests are dense masked ops; voxel-vs-voxel contacts sample the
other object's SDF grid by trilinear interpolation after transforming probes
between body frames. Contacts merge into the physics ContactBuffer with keys
above the analytic ranges so warm-start joins stay sorted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import quaternion as quat
from ..physics.collision import CollidablePools, ContactBuffer, compact_contacts
from .object import VoxelObjectPool, surface_mask, occupancy, voxel_positions_local

PROBE_BLOCK = 4  # ref: collidable.rs:85 probe per 4³ block
VOXEL_KEY_BASE = np.uint32(0x40000000)


class VoxelProbes(NamedTuple):
    active: jnp.ndarray  # bool[O,P]
    pos_local: jnp.ndarray  # f32[O,P,3] body-frame probe positions
    response: jnp.ndarray  # f32[O,P,3] (restitution, sf, df) — per object


def extract_probes(pool: VoxelObjectPool, response_params) -> VoxelProbes:
    """Pick one probe per 4³ block: the most convex surface voxel.

    The reference picks the max-convex-curvature mesh vertex per block
    (collidable.rs:85-101); the grid analog is the surface voxel with the
    fewest occupied neighbors (corners beat face centers), tie-broken by
    |sdf|. Correct support polygons (e.g. a resting box's bottom corners)
    depend on this choice.

    response_params: f32[O,3] per-object contact response.
    """
    o = pool.n_objects
    g = pool.grid_size
    b = g // PROBE_BLOCK
    occ = occupancy(pool)
    surf = surface_mask(occ)
    from .object import adjacency_masks

    adj = adjacency_masks(occ)
    n_neighbors = sum(adj.values()).astype(jnp.float32)
    score = jnp.where(
        surf, n_neighbors * 10.0 + jnp.abs(pool.sdf.astype(jnp.float32)), jnp.inf
    )
    score_b = score.reshape(o, b, PROBE_BLOCK, b, PROBE_BLOCK, b, PROBE_BLOCK)
    score_b = jnp.transpose(score_b, (0, 1, 3, 5, 2, 4, 6)).reshape(
        o, b, b, b, PROBE_BLOCK**3
    )
    best = jnp.argmin(score_b, axis=-1)
    best_score = jnp.min(score_b, axis=-1)
    active = jnp.isfinite(best_score)

    pos = voxel_positions_local(pool)
    pos_b = pos.reshape(o, b, PROBE_BLOCK, b, PROBE_BLOCK, b, PROBE_BLOCK, 3)
    pos_b = jnp.transpose(pos_b, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        o, b, b, b, PROBE_BLOCK**3, 3
    )
    probe_pos = jnp.take_along_axis(
        pos_b, best[..., None, None], axis=-2
    )[..., 0, :]

    p = b * b * b
    return VoxelProbes(
        active=(active & pool.alive[:, None, None, None]).reshape(o, p),
        pos_local=probe_pos.reshape(o, p, 3),
        response=jnp.broadcast_to(response_params[:, None, :], (o, p, 3)),
    )


def sample_sdf_trilinear(sdf, pts_grid):
    """Trilinearly sample one [G,G,G] SDF at grid-space points [...,3]
    (grid space: voxel centers at idx + 0.5). Out-of-range clamps to edge."""
    g = sdf.shape[0]
    q = pts_grid - 0.5
    q0 = jnp.floor(q)
    f = q - q0
    q0 = q0.astype(jnp.int32)

    def at(dx, dy, dz):
        idx = jnp.clip(
            q0 + jnp.array([dx, dy, dz]), 0, g - 1
        )
        return sdf[idx[..., 0], idx[..., 1], idx[..., 2]]

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx
    c10 = at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx
    c01 = at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx
    c11 = at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


# --- packed-corner sampling (the TPU-fast voxel-voxel path) ----------------
# TPU gather cost is per ROW: the pointwise trilinear sampler pays 8 gather
# rows per sample (16 ms of the 22 ms step at bench scale,
# devtools/probe_voxel_contacts.py), and multi-dim slice-gathers (slice_sizes
# (2,2,2)) lower to SCALAR loads (measured 285 ms — 18x WORSE). The fast
# shape: pack each cell's 8 i8 corners into two i32 words (elementwise
# shifts, VPU-cheap, done per step), then ONE flat gather row of 2 lanes per
# sample + bit unpacking.


def pack_cell_corners_i8(sdf_i8):
    """[..., G, G, G] i8 → [..., (G-1)³, 2] i32 packed cell-corner words.

    word0 = corners (dx,dy,0) at byte dx+2·dy, word1 = corners (dx,dy,1)."""
    g = sdf_i8.shape[-1]
    u = sdf_i8.astype(jnp.uint8).astype(jnp.uint32)

    def corner(dx, dy, dz):
        return u[
            ...,
            dx : g - 1 + dx,
            dy : g - 1 + dy,
            dz : g - 1 + dz,
        ]

    def word(dz):
        return (
            corner(0, 0, dz)
            | (corner(1, 0, dz) << 8)
            | (corner(0, 1, dz) << 16)
            | (corner(1, 1, dz) << 24)
        ).astype(jnp.int32)

    w = jnp.stack([word(0), word(1)], axis=-1)  # [..., g-1,g-1,g-1, 2]
    return w.reshape(*sdf_i8.shape[:-3], (g - 1) ** 3, 2)


def _unpack_byte_i8(word, k):
    """Byte k of an i32 word → f32 value of the stored i8."""
    b = (word >> (8 * k)) & 0xFF
    return jnp.where(b >= 128, b - 256, b).astype(jnp.float32)


def sample_packed_sdf_pairs(packed_flat, obj_idx, pts_grid, g: int):
    """(value, unit gradient) of the trilinear interpolant, from packed
    corner words. ``packed_flat``: [O·(G-1)³, 2] i32 (pack_cell_corners_i8
    flattened over objects); ``obj_idx``: [...] object slot per sample;
    ``pts_grid``: [..., 3] grid-space points in that object's grid.

    ONE gather row (2 lanes) per sample. Cell starts clamp to [0, G-2]
    (out-of-grid samples extrapolate the edge cell — they are far-positive
    either way). Gradient is analytic from the same 8 corners."""
    c3 = (g - 1) ** 3
    q = pts_grid - 0.5
    q0f = jnp.floor(q)
    f = q - q0f
    cell = jnp.clip(q0f.astype(jnp.int32), 0, g - 2)
    flat = (
        obj_idx * c3
        + (cell[..., 0] * (g - 1) + cell[..., 1]) * (g - 1)
        + cell[..., 2]
    )
    w = packed_flat[flat]  # [..., 2] — the single gather
    w0, w1 = w[..., 0], w[..., 1]
    c000, c100 = _unpack_byte_i8(w0, 0), _unpack_byte_i8(w0, 1)
    c010, c110 = _unpack_byte_i8(w0, 2), _unpack_byte_i8(w0, 3)
    c001, c101 = _unpack_byte_i8(w1, 0), _unpack_byte_i8(w1, 1)
    c011, c111 = _unpack_byte_i8(w1, 2), _unpack_byte_i8(w1, 3)
    return _trilinear_from_corners(
        c000, c100, c010, c110, c001, c101, c011, c111, f
    )


def _trilinear_from_corners(c000, c100, c010, c110, c001, c101, c011, c111, f):
    """(value, unit gradient) of the trilinear form given its 8 corners."""
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    # interpolate along x
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    value = c0 * (1 - fz) + c1 * fz

    # analytic partials of the trilinear form
    dx00, dx10 = c100 - c000, c110 - c010
    dx01, dx11 = c101 - c001, c111 - c011
    gx = (dx00 * (1 - fy) + dx10 * fy) * (1 - fz) + (
        dx01 * (1 - fy) + dx11 * fy
    ) * fz
    gy = ((c10 - c00) * (1 - fz)) + ((c11 - c01) * fz)
    gz = c1 - c0
    grad = jnp.stack([gx, gy, gz], axis=-1)
    grad = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return value, grad


def sample_sdf_trilinear_with_gradient(sdf, pts_grid):
    """(value, unit gradient) of the trilinear interpolant at grid-space
    points [...,3]. The gradient is ANALYTIC — differences of the same 8
    gathered corners — so it costs no extra gathers (vs 6 more trilinear
    samples for central differences: 7× fewer gather rows, the hot cost of
    voxel-voxel contact sampling on TPU)."""
    g = sdf.shape[0]
    q = pts_grid - 0.5
    q0f = jnp.floor(q)
    f = q - q0f
    q0 = q0f.astype(jnp.int32)

    def at(dx, dy, dz):
        idx = jnp.clip(q0 + jnp.array([dx, dy, dz]), 0, g - 1)
        # f32 BEFORE differencing: the gradient partials below overflow in
        # i8 for corner jumps > 127 codes (wrapped normals on steep SDFs)
        return sdf[idx[..., 0], idx[..., 1], idx[..., 2]].astype(jnp.float32)

    c000, c100 = at(0, 0, 0), at(1, 0, 0)
    c010, c110 = at(0, 1, 0), at(1, 1, 0)
    c001, c101 = at(0, 0, 1), at(1, 0, 1)
    c011, c111 = at(0, 1, 1), at(1, 1, 1)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    # interpolate along x
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    value = c0 * (1 - fz) + c1 * fz

    # analytic partials of the trilinear form
    dx00, dx10 = c100 - c000, c110 - c010
    dx01, dx11 = c101 - c001, c111 - c011
    gx = (dx00 * (1 - fy) + dx10 * fy) * (1 - fz) + (
        dx01 * (1 - fy) + dx11 * fy
    ) * fz
    gy = ((c10 - c00) * (1 - fz)) + ((c11 - c01) * fz)
    gz = c1 - c0
    grad = jnp.stack([gx, gy, gz], axis=-1)
    grad = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return value, grad


def sample_sdf_gradient(sdf, pts_grid, eps=0.5):
    """Unit SDF gradient at grid-space points (analytic trilinear partials)."""
    return sample_sdf_trilinear_with_gradient(sdf, pts_grid)[1]


def bounding_radii(pool: VoxelObjectPool):
    """Conservative per-object bounding-sphere radius about the body origin
    (the grid box diagonal — cheap, never under-estimates)."""
    g = pool.grid_size
    half = 0.5 * g * pool.voxel_extent
    center_off = jnp.linalg.norm(pool.origin + half[:, None], axis=-1)
    return center_off + half * jnp.sqrt(3.0)


# grid broad phase engages above this pool size; below it the dense
# all-pairs mask is cheaper than the cell sorts
GRID_BROAD_PHASE_MIN_OBJECTS = 64
# kept as an alias for older callers/tests
MORTON_BROAD_PHASE_MIN_OBJECTS = GRID_BROAD_PHASE_MIN_OBJECTS


def broad_phase_pairs(
    centers, radii, alive, max_pairs: int,
    window: int = 32, large_count: int = 4, margin=0.0,
):
    """CONSERVATIVE candidate object pairs for narrow-phase SDF probing.

    Ref: impact_intersection/src/bounding_volume/hierarchy.rs:14-26 — the
    reference walks a Morton-built BVH whose pair queries return *all*
    intersecting pairs. The TPU shape with the same guarantee: a shifted
    uniform grid. Cell size c = 2·d_max where d_max bounds the center
    distance of any overlapping small-small pair; 8 passes offset by
    {0, c/2}³ — an interval of length ≤ c/2 per axis cannot straddle a cell
    boundary of BOTH offset grids, so every overlapping pair shares a cell
    in ≥1 pass. Within a pass, objects are sorted by packed cell key and
    each object is tested against its ``window`` successors; a same-cell
    run longer than the window is COUNTED (returned as ``n_overflow``) —
    "no silent caps". The ``large_count`` largest objects leave the grid
    (they would blow up the cell size) and are tested densely against
    everyone. Candidate generation is O(8·N·window + large_count·N), not
    O(N²); pairs are DIRECTIONAL (both (a,b) and (b,a) emitted — voxel
    narrow phase probes A against B's SDF).

    Returns (pair_a i32[max_pairs], pair_b i32[max_pairs],
    valid bool[max_pairs], n_overflow i32 scalar). ``n_overflow > 0`` means
    some cell run exceeded the window and pairs MAY have been missed —
    callers log/assert it (it is 0 for physically plausible scenes: a run
    of >window objects inside one 2·d_max cell means >32 bodies packed
    within each other's collision reach)."""
    n = centers.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    m_obj = (
        jnp.broadcast_to(jnp.asarray(margin, jnp.float32), (n,))
        if jnp.ndim(margin) == 0
        else margin
    )

    def overlap(a, b):
        sep = jnp.linalg.norm(centers[a] - centers[b], axis=-1)
        return sep < radii[a] + radii[b] + 0.5 * (m_obj[a] + m_obj[b])

    # --- large lane: biggest alive objects vs everyone (dense) --------------
    k_large = min(large_count, n)
    _, large_idx = jax.lax.top_k(jnp.where(alive, radii, -jnp.inf), k_large)
    is_large = jnp.zeros(n, bool).at[large_idx].set(alive[large_idx])
    la = jnp.broadcast_to(large_idx[:, None], (k_large, n))
    lb = jnp.broadcast_to(i[None, :], (k_large, n))
    # a large-large pair would appear in BOTH large rows (duplicate keys →
    # double impulses); keep only the la<lb representative
    dup = is_large[lb] & (lb < la)
    ok_l = (
        alive[la] & alive[lb] & (la != lb) & ~dup & overlap(la, lb)
    )

    # --- shifted-grid lane over the small objects ----------------------------
    small = alive & ~is_large
    big = jnp.float32(3.0e38)
    r_small_max = jnp.max(jnp.where(small, radii, 0.0))
    m_small_max = jnp.max(jnp.where(small, m_obj, 0.0))
    d_max = 2.0 * r_small_max + m_small_max  # max overlapping-pair distance
    c = jnp.maximum(2.0 * d_max, 1e-6) * (1.0 + 1e-6)

    # exact cell coords per pass [8, N, 3] + packed u32 sort keys [8, N].
    # Key collisions (coords equal mod 1024) only interleave FOREIGN objects
    # into a run (eating window capacity, caught by the overflow counter);
    # the emit test below compares exact coords, so they never create false
    # pairs.
    offs = jnp.asarray(
        [[(x & 1), (x >> 1) & 1, (x >> 2) & 1] for x in range(8)],
        jnp.float32,
    ) * 0.5  # [8,3] in units of c
    cells = jnp.floor(
        (centers[None, :, :] / c + offs[:, None, :])
    ).astype(jnp.int32)  # [8,N,3]
    key = (
        ((cells[..., 0] & 0x3FF).astype(jnp.uint32) << 20)
        | ((cells[..., 1] & 0x3FF).astype(jnp.uint32) << 10)
        | (cells[..., 2] & 0x3FF).astype(jnp.uint32)
    )
    key = jnp.where(small[None, :], key, jnp.uint32(0xFFFFFFFF))  # [8,N]

    def same_cell(p, a, b):
        return jnp.all(cells[p, a] == cells[p, b], axis=-1) & small[a] & small[b]

    w = min(window, max(n - 1, 1))
    d = jnp.arange(1, w + 1, dtype=jnp.int32)
    pair_as, pair_bs, pair_ok = [], [], []
    n_overflow = jnp.int32(0)
    for p in range(8):
        order = jnp.argsort(key[p]).astype(jnp.int32)  # rank → object
        ai = jnp.broadcast_to(i[:, None], (n, w))
        bi = ai + d[None, :]
        in_range = bi < n
        a_obj = order[ai]
        b_obj = order[jnp.minimum(bi, n - 1)]
        here = same_cell(p, a_obj, b_obj)
        # dedup across passes: emit only in the FIRST pass where the pair
        # shares a cell
        seen_before = jnp.zeros_like(here)
        for q in range(p):
            seen_before |= same_cell(q, a_obj, b_obj)
        ok = in_range & here & ~seen_before & overlap(a_obj, b_obj)
        pair_as.append(a_obj.reshape(-1))
        pair_bs.append(b_obj.reshape(-1))
        pair_ok.append(ok.reshape(-1))
        # run-overflow: rank i and rank i+w sharing a key means a same-cell
        # run longer than the window → pairs beyond the scan MAY be missed
        if n > w:
            n_overflow = n_overflow + jnp.sum(
                (key[p][order[: n - w]] == key[p][order[w:]])
                & (key[p][order[: n - w]] != jnp.uint32(0xFFFFFFFF))
            ).astype(jnp.int32)

    ga = jnp.concatenate(pair_as)
    gb = jnp.concatenate(pair_bs)
    gv = jnp.concatenate(pair_ok)
    va = jnp.concatenate([ga, gb, la.reshape(-1), lb.reshape(-1)])
    vb = jnp.concatenate([gb, ga, lb.reshape(-1), la.reshape(-1)])
    vv = jnp.concatenate([gv, gv, ok_l.reshape(-1), ok_l.reshape(-1)])

    take = jnp.argsort(~vv, stable=True)[:max_pairs]
    return (
        va[take].astype(jnp.int32),
        vb[take].astype(jnp.int32),
        vv[take],
        n_overflow,
    )


INTERLOCK_ALIGNMENT_THRESHOLD = 0.1  # ref: contact.rs:611


def separating_contacts_for_interlocked(
    pos,  # f32[MP,P,3] manifold contact positions (world)
    normal,  # f32[MP,P,3] surface normals
    depth,  # f32[MP,P] penetration depths
    active,  # bool[MP,P] contact mask
    com_a,  # f32[MP,3] body A center of mass
    com_b,  # f32[MP,3]
):
    """Interlock analysis per contact manifold, batched over pairs.

    Ref: contact.rs:610-780 — a manifold whose penetration vectors strongly
    cancel (alignment = |Σ d·n|²/(Σ d)² < 0.1) keeps the objects interlocked:
    positional corrections fight along opposing directions. The reference then
    substitutes the manifold with ONE synthetic contact separating along the
    axis of least contact-point extent (minor of three diameter-derived axes),
    oriented to push A's COM away from B's, with restitution 0 and infinite
    friction.

    Divergence from the reference: the max-displacement (diameter) direction
    uses the standard 2-pass farthest-point approximation instead of the exact
    O(k²) pairwise scan — exact pairwise over [MP,P,P] at P≈512 would
    materialize ~270 MB per buffer; the 2-pass result differs only on
    degenerate point sets.

    Returns (interlocked bool[MP], sep_pos f32[MP,3], sep_axis f32[MP,3],
    sep_depth f32[MP])."""
    mp, p = depth.shape
    pen = jnp.where(active & (depth > 0.0), depth, 0.0)  # [MP,P]
    pen_sum = jnp.sum(pen, axis=-1)
    vec_sum = jnp.sum(pen[..., None] * normal, axis=1)  # [MP,3]
    alignment = jnp.sum(vec_sum * vec_sum, axis=-1) / jnp.maximum(
        pen_sum * pen_sum, 1e-12
    )
    interlocked = (pen_sum >= 1e-6) & (
        alignment < INTERLOCK_ALIGNMENT_THRESHOLD
    )

    big = jnp.float32(3e38)
    inval = ~active

    def farthest_from(ref_pt, pts):
        d2 = jnp.sum((pts - ref_pt[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(inval, -big, d2)
        i = jnp.argmax(d2, axis=-1)
        return jnp.take_along_axis(pts, i[:, None, None], axis=1)[:, 0], i

    def diameter_axis(pts):
        """2-pass farthest-point diameter direction of the active points."""
        w = active.astype(jnp.float32)
        centroid = jnp.sum(pts * w[..., None], axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1.0
        )[..., None]
        p1, _ = farthest_from(centroid, pts)
        p2, _ = farthest_from(p1, pts)
        return p2 - p1

    def normalized_if_above(v, eps):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.where(n > eps, v / jnp.maximum(n, 1e-12), 0.0), (
            n[..., 0] > eps
        )

    major_v = diameter_axis(pos)
    major, has_major = normalized_if_above(major_v, 1e-6)
    proj = pos - jnp.sum(pos * major[:, None, :], axis=-1, keepdims=True) * (
        major[:, None, :]
    )
    middle_v = diameter_axis(proj)
    middle, has_middle = normalized_if_above(middle_v, 1e-6)
    minor, has_minor = normalized_if_above(
        jnp.cross(major, middle), 1e-4
    )

    def contact_along(axis):
        """(valid, pos, depth) separating along ``axis`` (oriented A←B)."""
        flip = jnp.sum(axis * (com_a - com_b), axis=-1) < 0.0
        ax = jnp.where(flip[:, None], -axis, axis)
        disp = jnp.sum(pos * ax[:, None, :], axis=-1)  # [MP,P]
        dmin = jnp.min(jnp.where(inval, big, disp), axis=-1)
        dmax = jnp.max(jnp.where(inval, -big, disp), axis=-1)
        sep = dmax - dmin
        imin = jnp.argmin(jnp.where(inval, big, disp), axis=-1)
        cpos = jnp.take_along_axis(pos, imin[:, None, None], axis=1)[:, 0]
        return sep > 1e-6, cpos, ax, sep

    ok_mi, pos_mi, ax_mi, sep_mi = contact_along(minor)
    ok_md, pos_md, ax_md, sep_md = contact_along(middle)
    ok_ma, pos_ma, ax_ma, sep_ma = contact_along(major)
    ok_mi = ok_mi & has_minor & has_middle & has_major
    ok_md = ok_md & has_middle & has_major
    ok_ma = ok_ma & has_major

    # first valid of minor → middle → major (ref fallback chain)
    def pick(a_ok, a_val, b_val):
        return jnp.where(
            a_ok[:, None] if a_val.ndim == 2 else a_ok, a_val, b_val
        )

    sep_pos = pick(ok_md, pos_md, pos_ma)
    sep_ax = pick(ok_md, ax_md, ax_ma)
    sep_dep = pick(ok_md, sep_md, sep_ma)
    sep_pos = pick(ok_mi, pos_mi, sep_pos)
    sep_ax = pick(ok_mi, ax_mi, sep_ax)
    sep_dep = pick(ok_mi, sep_mi, sep_dep)
    any_ok = ok_mi | ok_md | ok_ma
    return interlocked & any_ok, sep_pos, sep_ax, sep_dep


def voxel_contacts(
    pool: VoxelObjectPool,
    probes: VoxelProbes,
    collidables: CollidablePools,
    body_position,
    body_orientation,
    max_contacts: int,
    max_pairs: int | None = None,
) -> ContactBuffer:
    """Generate voxel contacts: probes vs planes, spheres, and other voxel
    objects. Returns a compacted ContactBuffer with keys ≥ VOXEL_KEY_BASE.

    Voxel-vs-voxel sampling is broad-phase prefiltered: only object pairs
    whose bounding spheres overlap are SDF-probed, compacted to a static
    ``max_pairs`` budget (ref: the reference delegates its broad phase to the
    scene BVH, collision.rs:215-245; a bounding-sphere prefilter is the
    masked-pool analog — O(O²) cheap mask math, O(max_pairs·P) expensive
    gathers instead of O(O²·P))."""
    o, p = probes.active.shape
    if max_pairs is None:
        max_pairs = min(o * o, max(16, 4 * o))

    # world-space probes
    body_idx = pool.body_index  # i32[O]
    q_b = body_orientation[body_idx]  # [O,4]
    x_b = body_position[body_idx]  # [O,3]
    probe_world = (
        quat.rotate(q_b[:, None, :], probes.pos_local) + x_b[:, None, :]
    )  # [O,P,3]

    keys, actives, bas, bbs, poss, nrms, deps, resps = [], [], [], [], [], [], [], []
    key_cursor = VOXEL_KEY_BASE

    def emit(key, active, ba, bb, pos, nrm, dep, resp):
        keys.append(key.reshape(-1).astype(jnp.uint32))
        actives.append(active.reshape(-1))
        bas.append(ba.reshape(-1).astype(jnp.int32))
        bbs.append(bb.reshape(-1).astype(jnp.int32))
        poss.append(pos.reshape(-1, 3))
        nrms.append(nrm.reshape(-1, 3))
        deps.append(dep.reshape(-1))
        resps.append(resp.reshape(-1, 3))

    # --- probes vs planes (A=voxel object, B=plane) -------------------------
    npl = collidables.pln_mask.shape[0]
    pn = quat.rotate(
        body_orientation[collidables.pln_body], collidables.pln_normal
    )  # [Npl,3] world normal
    pd = collidables.pln_disp + jnp.sum(
        pn * body_position[collidables.pln_body], axis=-1
    )
    sd = (
        jnp.einsum("opc,lc->opl", probe_world, pn) - pd[None, None, :]
    )  # [O,P,Npl]
    half_vox = 0.5 * pool.voxel_extent[:, None, None]
    dep = half_vox - sd
    active = (
        probes.active[:, :, None]
        & collidables.pln_mask[None, None, :]
        & (dep >= 0.0)
    )
    nrm = jnp.broadcast_to(pn[None, None], (o, p, npl, 3))
    pos = probe_world[:, :, None, :] - sd[..., None] * nrm
    resp_pl = jnp.broadcast_to(collidables.pln_response[None, None], (o, p, npl, 3))
    resp = _combine(probes.response[:, :, None, :], resp_pl)
    key = key_cursor + (
        jnp.arange(o * p * npl, dtype=jnp.uint32).reshape(o, p, npl)
    )
    ba = jnp.broadcast_to(body_idx[:, None, None], (o, p, npl))
    bb = jnp.broadcast_to(collidables.pln_body[None, None, :], (o, p, npl))
    emit(key, active, ba, bb, pos, nrm, dep, resp)
    key_cursor = key_cursor + o * p * npl

    # --- probes vs spheres (A=voxel object, B=sphere) -----------------------
    ns = collidables.sph_mask.shape[0]
    sc = body_position[collidables.sph_body] + quat.rotate(
        body_orientation[collidables.sph_body], collidables.sph_center
    )  # [Ns,3]
    disp = probe_world[:, :, None, :] - sc[None, None, :, :]
    dist = jnp.linalg.norm(disp, axis=-1)
    nrm = disp / jnp.maximum(dist, 1e-9)[..., None]
    dep = collidables.sph_radius[None, None, :] + 0.5 * pool.voxel_extent[:, None, None] - dist
    active = (
        probes.active[:, :, None]
        & collidables.sph_mask[None, None, :]
        & (dep >= 0.0)
        & (body_idx[:, None, None] != collidables.sph_body[None, None, :])
    )
    pos = sc[None, None] + collidables.sph_radius[None, None, :, None] * nrm
    resp_s = jnp.broadcast_to(collidables.sph_response[None, None], (o, p, ns, 3))
    resp = _combine(probes.response[:, :, None, :], resp_s)
    key = key_cursor + jnp.arange(o * p * ns, dtype=jnp.uint32).reshape(o, p, ns)
    ba = jnp.broadcast_to(body_idx[:, None, None], (o, p, ns))
    bb = jnp.broadcast_to(collidables.sph_body[None, None, :], (o, p, ns))
    emit(key, active, ba, bb, pos, nrm, dep, resp)
    key_cursor = key_cursor + o * p * ns

    # --- probes vs other voxel objects (A=probe owner, B=sampled object) ----
    # Transform every object's probes into every other object's grid space and
    # sample the SDF (ref: collidable.rs:791 voxel-voxel probing).
    q_inv = quat.conjugate(q_b)

    def to_grid_of(b_obj, pts_world):
        local = quat.rotate(q_inv[b_obj][None], pts_world - x_b[b_obj][None])
        return (local - pool.origin[b_obj][None]) / pool.voxel_extent[b_obj]

    from .encoding import QUANTIZATION_STEP_SIZE, is_encoded

    # storage units → world units: i8 codes carry extent·step per code; the
    # f32 pool already stores world-unit distances
    encoded = is_encoded(pool.sdf)
    if encoded:
        sdf_unit = pool.voxel_extent * QUANTIZATION_STEP_SIZE  # [O]
        # pack each cell's 8 corners into 2 i32 words so the pair sampling
        # below costs ONE gather row per probe instead of 8 (16 ms → ~2 ms
        # of the step at bench scale, devtools/probe_voxel_contacts.py)
        grid = pool.sdf.shape[-1]
        packed_flat = pack_cell_corners_i8(pool.sdf).reshape(-1, 2)
    else:
        sdf_unit = jnp.ones_like(pool.voxel_extent)

    def sample_pair(a_obj, b_obj):
        pts = to_grid_of(b_obj, probe_world[a_obj])  # [P,3] grid coords of B
        if encoded:
            d, g_local = sample_packed_sdf_pairs(
                packed_flat, b_obj, pts, grid
            )
        else:
            d, g_local = sample_sdf_trilinear_with_gradient(
                pool.sdf[b_obj], pts
            )
        d = d * sdf_unit[b_obj]
        n_world = quat.rotate(q_b[b_obj][None], g_local)
        return d, n_world

    # broad phase: bounding-sphere overlap → static pair budget. Small pools
    # use the dense all-pairs mask; large pools switch to conservative
    # shifted-grid candidate generation (O(8·N·window), ref:
    # hierarchy.rs:14-26 BVH pair queries return ALL intersecting pairs) so
    # neither the [O,O] mask nor its O²-element argsort scales quadratically
    # at pod sizes. Run overflow is auditable host-side via
    # HeadlessRuntime.broad_phase_overflow() (no silent caps).
    radii = bounding_radii(pool)
    if o >= GRID_BROAD_PHASE_MIN_OBJECTS:
        pair_a, pair_b, pair_valid, _overflow = broad_phase_pairs(
            x_b, radii, pool.alive, max_pairs,
            margin=pool.voxel_extent,
        )
        # warm-start joins need the contact buffer key-ascending; grid
        # candidates arrive in rank order, so re-sort the (small) selected
        # pair list by its (a,b) key
        pkey = jnp.where(
            pair_valid,
            pair_a.astype(jnp.uint32) * o + pair_b.astype(jnp.uint32),
            jnp.uint32(0xFFFFFFFF),
        )
        reorder = jnp.argsort(pkey)
        pair_a = pair_a[reorder]
        pair_b = pair_b[reorder]
        pair_valid = pair_valid[reorder]
    else:
        sep = jnp.linalg.norm(
            x_b[:, None, :] - x_b[None, :, :], axis=-1
        )  # [O,O] body-origin distances
        margin = 0.5 * (
            pool.voxel_extent[:, None] + pool.voxel_extent[None, :]
        )
        overlap = sep < radii[:, None] + radii[None, :] + margin
        valid_pair = (
            pool.alive[:, None]
            & pool.alive[None, :]
            & (jnp.arange(o)[:, None] != jnp.arange(o)[None, :])
            & overlap
        )
        flat_valid = valid_pair.reshape(-1)
        order = jnp.argsort(~flat_valid, stable=True)[:max_pairs]
        pair_valid = flat_valid[order]
        pair_a = (order // o).astype(jnp.int32)
        pair_b = (order % o).astype(jnp.int32)

    d_ab, n_ab = jax.vmap(sample_pair)(pair_a, pair_b)  # [MP,P], [MP,P,3]
    dep = 0.5 * pool.voxel_extent[pair_a][:, None] - d_ab
    active = probes.active[pair_a] & pair_valid[:, None] & (dep >= 0.0)
    pos = probe_world[pair_a]  # [MP,P,3]
    resp = _combine(
        probes.response[pair_a],
        jnp.broadcast_to(probes.response[pair_b][:, :1, :], (max_pairs, p, 3)),
    )
    # stable warm-start keys derived from the (a,b) pair, not the slot
    key = (
        key_cursor
        + (pair_a.astype(jnp.uint32) * o + pair_b.astype(jnp.uint32))[:, None] * p
        + jnp.arange(p, dtype=jnp.uint32)[None, :]
    )
    ba = jnp.broadcast_to(body_idx[pair_a][:, None], (max_pairs, p))
    bb = jnp.broadcast_to(body_idx[pair_b][:, None], (max_pairs, p))

    # interlock analysis (ref: constraint.rs:241 — an interlocked manifold is
    # REPLACED by one synthetic separating contact)
    interlocked, sep_pos, sep_ax, sep_dep = separating_contacts_for_interlocked(
        pos, n_ab, dep, active, x_b[pair_a], x_b[pair_b]
    )
    active = active & ~interlocked[:, None]
    emit(key, active, ba, bb, pos, n_ab, dep, resp)

    key_cursor = key_cursor + np.uint32(o * o * p)
    sep_key = key_cursor + (
        pair_a.astype(jnp.uint32) * o + pair_b.astype(jnp.uint32)
    )
    # restitution 0, "infinite" friction: the synthetic contact exists for
    # positional correction; velocity response just kills relative motion
    # (ref: contact.rs:644 ContactResponseParameters::new(0.0, INF, INF))
    sep_resp = jnp.broadcast_to(
        jnp.asarray([0.0, 1e9, 1e9], jnp.float32), (max_pairs, 3)
    )
    emit(
        sep_key, interlocked, body_idx[pair_a], body_idx[pair_b],
        sep_pos, sep_ax, sep_dep, sep_resp,
    )

    return compact_contacts(
        jnp.concatenate(keys),
        jnp.concatenate(actives),
        jnp.concatenate(bas),
        jnp.concatenate(bbs),
        jnp.concatenate(poss),
        jnp.concatenate(nrms),
        jnp.concatenate(deps),
        jnp.concatenate(resps),
        max_contacts,
    )


def _combine(ra, rb):
    rest = jnp.maximum(ra[..., 0], rb[..., 0])
    sf = jnp.sqrt(ra[..., 1] * rb[..., 1])
    df = jnp.sqrt(ra[..., 2] * rb[..., 2])
    return jnp.stack([rest, sf, df], axis=-1)


def merge_contact_buffers(a: ContactBuffer, b: ContactBuffer, max_contacts: int) -> ContactBuffer:
    """Merge two compacted buffers preserving key order (a's keys < b's)."""
    return compact_contacts(
        jnp.concatenate([a.key, b.key]),
        jnp.concatenate([a.active, b.active]),
        jnp.concatenate([a.body_a, b.body_a]),
        jnp.concatenate([a.body_b, b.body_b]),
        jnp.concatenate([a.position, b.position]),
        jnp.concatenate([a.normal, b.normal]),
        jnp.concatenate([a.depth, b.depth]),
        jnp.concatenate([a.response, b.response]),
        max_contacts,
    )
