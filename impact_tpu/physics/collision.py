"""Collision world: collidable pools, narrow phase, contact compaction.

Ref: impact_physics/src/collision.rs (CollisionWorld, Collidable kinds
Dynamic/Static/Phantom) + collision/collidable/{sphere,plane,capsule}.rs
analytic contact generation. Contact geometry conventions match the reference
exactly (contact.rs:48-62): ``position`` is the deepest point on body B,
``surface_normal`` is B's outward normal at that point, ``penetration_depth``
≥ 0 along the normal, and response parameters combine as max(restitution),
sqrt(product) for frictions (material.rs:43-51).

TPU redesign (SURVEY.md §7.0): instead of BVH broad phase + per-pair manifold
Vecs, every candidate pair is evaluated in one dense masked op and the active
contacts are compacted into a fixed-capacity contact buffer by a stable
argsort. Each candidate pair has a deterministic integer key, which makes
warm-start matching across frames a sorted join (§7.3.5) instead of the
reference's ContactID hash map.

Voxel-object contacts are appended by impact_tpu.voxel.collision via the same
ContactBuffer structure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..math import quaternion as quat

KIND_DYNAMIC_COLLIDABLE = 0
KIND_STATIC_COLLIDABLE = 1
KIND_PHANTOM_COLLIDABLE = 2


class CollidablePools(NamedTuple):
    """Fixed-capacity collidable pools, local-frame geometry + body binding."""

    sph_body: jnp.ndarray  # i32[Ns]
    sph_center: jnp.ndarray  # f32[Ns,3] body-frame center
    sph_radius: jnp.ndarray  # f32[Ns]
    sph_kind: jnp.ndarray  # i32[Ns]
    sph_response: jnp.ndarray  # f32[Ns,3] (restitution, static_f, dynamic_f)
    sph_mask: jnp.ndarray  # bool[Ns]

    pln_body: jnp.ndarray  # i32[Np]
    pln_normal: jnp.ndarray  # f32[Np,3] body-frame unit normal
    pln_disp: jnp.ndarray  # f32[Np]
    pln_kind: jnp.ndarray  # i32[Np]
    pln_response: jnp.ndarray  # f32[Np,3]
    pln_mask: jnp.ndarray  # bool[Np]

    cap_body: jnp.ndarray  # i32[Nc]
    cap_start: jnp.ndarray  # f32[Nc,3] body-frame segment start
    cap_end: jnp.ndarray  # f32[Nc,3]
    cap_radius: jnp.ndarray  # f32[Nc]
    cap_kind: jnp.ndarray  # i32[Nc]
    cap_response: jnp.ndarray  # f32[Nc,3]
    cap_mask: jnp.ndarray  # bool[Nc]


def empty_collidable_pools(n_spheres=64, n_planes=8, n_capsules=16) -> CollidablePools:
    z3 = lambda c: jnp.zeros((c, 3), jnp.float32)  # noqa: E731
    return CollidablePools(
        sph_body=jnp.zeros(n_spheres, jnp.int32),
        sph_center=z3(n_spheres),
        sph_radius=jnp.ones(n_spheres, jnp.float32),
        sph_kind=jnp.zeros(n_spheres, jnp.int32),
        sph_response=z3(n_spheres),
        sph_mask=jnp.zeros(n_spheres, bool),
        pln_body=jnp.zeros(n_planes, jnp.int32),
        pln_normal=jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (n_planes, 1)),
        pln_disp=jnp.zeros(n_planes, jnp.float32),
        pln_kind=jnp.ones(n_planes, jnp.int32),
        pln_response=z3(n_planes),
        pln_mask=jnp.zeros(n_planes, bool),
        cap_body=jnp.zeros(n_capsules, jnp.int32),
        cap_start=z3(n_capsules),
        cap_end=z3(n_capsules),
        cap_radius=jnp.ones(n_capsules, jnp.float32),
        cap_kind=jnp.zeros(n_capsules, jnp.int32),
        cap_response=z3(n_capsules),
        cap_mask=jnp.zeros(n_capsules, bool),
    )


class WorldCollidables(NamedTuple):
    """World-space collidable geometry for one substep
    (ref: collision.rs synchronize_collidables_with_rigid_bodies)."""

    sph_center: jnp.ndarray  # f32[Ns,3]
    sph_radius: jnp.ndarray
    pln_normal: jnp.ndarray  # f32[Np,3]
    pln_disp: jnp.ndarray  # f32[Np]
    cap_start: jnp.ndarray  # f32[Nc,3]
    cap_end: jnp.ndarray
    cap_radius: jnp.ndarray


def synchronize_collidables(pools: CollidablePools, position, orientation) -> WorldCollidables:
    """Transform local collidable geometry into world space using each bound
    body's position[N,3] / orientation[N,4]."""
    sph_c = position[pools.sph_body] + quat.rotate(
        orientation[pools.sph_body], pools.sph_center
    )
    n_w = quat.rotate(orientation[pools.pln_body], pools.pln_normal)
    d_w = pools.pln_disp + jnp.sum(n_w * position[pools.pln_body], axis=-1)
    cap_s = position[pools.cap_body] + quat.rotate(
        orientation[pools.cap_body], pools.cap_start
    )
    cap_e = position[pools.cap_body] + quat.rotate(
        orientation[pools.cap_body], pools.cap_end
    )
    return WorldCollidables(
        sph_center=sph_c,
        sph_radius=pools.sph_radius,
        pln_normal=n_w,
        pln_disp=d_w,
        cap_start=cap_s,
        cap_end=cap_e,
        cap_radius=pools.cap_radius,
    )


class ContactBuffer(NamedTuple):
    """Fixed-capacity compacted contact set for one substep.

    ``key`` is the deterministic pair key used for warm-start joins; keys are
    strictly increasing over active slots.
    """

    active: jnp.ndarray  # bool[C]
    key: jnp.ndarray  # u32[C]
    body_a: jnp.ndarray  # i32[C]
    body_b: jnp.ndarray  # i32[C]
    position: jnp.ndarray  # f32[C,3] deepest point on B (world)
    normal: jnp.ndarray  # f32[C,3] B's surface normal (world)
    depth: jnp.ndarray  # f32[C]
    response: jnp.ndarray  # f32[C,3] combined (restitution, sf, df)


def _combine_response(ra, rb):
    """(max restitution, sqrt-product frictions) (ref: material.rs:43-51)."""
    rest = jnp.maximum(ra[..., 0], rb[..., 0])
    sf = jnp.sqrt(ra[..., 1] * rb[..., 1])
    df = jnp.sqrt(ra[..., 2] * rb[..., 2])
    return jnp.stack([rest, sf, df], axis=-1)


def _phantom_or_static_pair(kind_a, kind_b):
    """Pairs with a phantom member or two non-dynamic members produce no
    solver contacts (ref: collision.rs Dynamic/Static/Phantom semantics)."""
    phantom = (kind_a == KIND_PHANTOM_COLLIDABLE) | (kind_b == KIND_PHANTOM_COLLIDABLE)
    both_static = (kind_a == KIND_STATIC_COLLIDABLE) & (kind_b == KIND_STATIC_COLLIDABLE)
    return phantom | both_static


def narrow_phase(
    pools: CollidablePools, world: WorldCollidables, max_contacts: int
) -> ContactBuffer:
    """All-pairs narrow phase over the collidable pools → compacted contacts.

    Pair types and their key ranges (A is the first-named type):
      sphere-sphere (i<j), sphere-plane, capsule-plane, capsule-sphere,
      capsule-capsule (i<j). Matches the reference's dispatch
      (collision/collidable/basic.rs:57-140); contact math per shape pair
      matches collidable/{sphere,capsule}.rs.
    """
    ns = pools.sph_mask.shape[0]
    npl = pools.pln_mask.shape[0]
    nc = pools.cap_mask.shape[0]
    eps = 1e-8

    keys, actives, bas, bbs, poss, nrms, deps, resps = [], [], [], [], [], [], [], []
    key_base = 0

    def emit(key, active, ba, bb, pos, nrm, dep, resp):
        keys.append(key.reshape(-1).astype(jnp.uint32))
        actives.append(active.reshape(-1))
        bas.append(ba.reshape(-1).astype(jnp.int32))
        bbs.append(bb.reshape(-1).astype(jnp.int32))
        poss.append(pos.reshape(-1, 3))
        nrms.append(nrm.reshape(-1, 3))
        deps.append(dep.reshape(-1))
        resps.append(resp.reshape(-1, 3))

    # --- sphere-sphere (A=i, B=j, i<j) ---------------------------------------
    ci = world.sph_center[:, None, :]
    cj = world.sph_center[None, :, :]
    disp = ci - cj  # from B to A
    d2 = jnp.sum(disp * disp, axis=-1)
    rsum = world.sph_radius[:, None] + world.sph_radius[None, :]
    iu = jnp.triu(jnp.ones((ns, ns), bool), k=1)
    pair_ok = (
        iu
        & pools.sph_mask[:, None]
        & pools.sph_mask[None, :]
        & ~_phantom_or_static_pair(pools.sph_kind[:, None], pools.sph_kind[None, :])
        & (pools.sph_body[:, None] != pools.sph_body[None, :])
    )
    touching = d2 <= rsum * rsum
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    nrm = jnp.where(
        (dist > eps)[..., None],
        disp / jnp.maximum(dist, eps)[..., None],
        jnp.array([0.0, 0.0, 1.0]),
    )
    pos = cj + world.sph_radius[None, :, None] * nrm
    dep = jnp.maximum(0.0, rsum - dist)
    resp = _combine_response(pools.sph_response[:, None, :], pools.sph_response[None, :, :])
    key = key_base + (
        jnp.arange(ns, dtype=jnp.uint32)[:, None] * ns
        + jnp.arange(ns, dtype=jnp.uint32)[None, :]
    )
    emit(
        key,
        pair_ok & touching,
        pools.sph_body[:, None] * jnp.ones((1, ns), jnp.int32),
        pools.sph_body[None, :] * jnp.ones((ns, 1), jnp.int32),
        pos,
        nrm,
        dep,
        resp,
    )
    key_base += ns * ns

    # --- sphere-plane (A=sphere, B=plane) ------------------------------------
    sd = (
        jnp.sum(world.sph_center[:, None, :] * world.pln_normal[None, :, :], axis=-1)
        - world.pln_disp[None, :]
    )
    dep = world.sph_radius[:, None] - sd
    pair_ok = (
        pools.sph_mask[:, None]
        & pools.pln_mask[None, :]
        & ~_phantom_or_static_pair(pools.sph_kind[:, None], pools.pln_kind[None, :])
    )
    nrm = jnp.broadcast_to(world.pln_normal[None, :, :], (ns, npl, 3))
    pos = world.sph_center[:, None, :] - sd[..., None] * nrm
    resp = _combine_response(pools.sph_response[:, None, :], pools.pln_response[None, :, :])
    key = key_base + (
        jnp.arange(ns, dtype=jnp.uint32)[:, None] * npl
        + jnp.arange(npl, dtype=jnp.uint32)[None, :]
    )
    emit(
        key,
        pair_ok & (dep >= 0.0),
        pools.sph_body[:, None] * jnp.ones((1, npl), jnp.int32),
        pools.pln_body[None, :] * jnp.ones((ns, 1), jnp.int32),
        pos,
        nrm,
        dep,
        resp,
    )
    key_base += ns * npl

    # --- capsule-plane (A=capsule, B=plane) -----------------------------------
    sd_s = (
        jnp.sum(world.cap_start[:, None, :] * world.pln_normal[None, :, :], axis=-1)
        - world.pln_disp[None, :]
    )
    sd_e = (
        jnp.sum(world.cap_end[:, None, :] * world.pln_normal[None, :, :], axis=-1)
        - world.pln_disp[None, :]
    )
    use_start = sd_s <= sd_e
    lowest_sd = jnp.where(use_start, sd_s, sd_e)
    closest = jnp.where(
        use_start[..., None], world.cap_start[:, None, :], world.cap_end[:, None, :]
    )
    dep = world.cap_radius[:, None] - lowest_sd
    nrm = jnp.broadcast_to(world.pln_normal[None, :, :], (nc, npl, 3))
    pos = closest - lowest_sd[..., None] * nrm
    pair_ok = (
        pools.cap_mask[:, None]
        & pools.pln_mask[None, :]
        & ~_phantom_or_static_pair(pools.cap_kind[:, None], pools.pln_kind[None, :])
    )
    resp = _combine_response(pools.cap_response[:, None, :], pools.pln_response[None, :, :])
    key = key_base + (
        jnp.arange(nc, dtype=jnp.uint32)[:, None] * npl
        + jnp.arange(npl, dtype=jnp.uint32)[None, :]
    )
    emit(
        key,
        pair_ok & (dep >= 0.0),
        pools.cap_body[:, None] * jnp.ones((1, npl), jnp.int32),
        pools.pln_body[None, :] * jnp.ones((nc, 1), jnp.int32),
        pos,
        nrm,
        dep,
        resp,
    )
    key_base += nc * npl

    # --- capsule-sphere (A=capsule, B=sphere) ----------------------------------
    from ..geometry.primitives import closest_point_on_segment

    cp, _ = closest_point_on_segment(
        world.cap_start[:, None, :],
        world.cap_end[:, None, :],
        world.sph_center[None, :, :],
    )
    disp = world.sph_center[None, :, :] - cp  # toward sphere center
    d2 = jnp.sum(disp * disp, axis=-1)
    rsum = world.cap_radius[:, None] + world.sph_radius[None, :]
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    cap_nrm = jnp.where(
        (dist > eps)[..., None],
        disp / jnp.maximum(dist, eps)[..., None],
        jnp.array([0.0, 0.0, 1.0]),
    )
    nrm = -cap_nrm  # B=sphere surface normal points from sphere toward capsule
    pos = world.sph_center[None, :, :] + world.sph_radius[None, :, None] * nrm
    dep = jnp.maximum(0.0, rsum - dist)
    pair_ok = (
        pools.cap_mask[:, None]
        & pools.sph_mask[None, :]
        & ~_phantom_or_static_pair(pools.cap_kind[:, None], pools.sph_kind[None, :])
        & (pools.cap_body[:, None] != pools.sph_body[None, :])
    )
    resp = _combine_response(pools.cap_response[:, None, :], pools.sph_response[None, :, :])
    key = key_base + (
        jnp.arange(nc, dtype=jnp.uint32)[:, None] * ns
        + jnp.arange(ns, dtype=jnp.uint32)[None, :]
    )
    emit(
        key,
        pair_ok & (d2 <= rsum * rsum),
        pools.cap_body[:, None] * jnp.ones((1, ns), jnp.int32),
        pools.sph_body[None, :] * jnp.ones((nc, 1), jnp.int32),
        pos,
        nrm,
        dep,
        resp,
    )
    key_base += nc * ns

    # --- capsule-capsule (A=i, B=j, i<j) ---------------------------------------
    from ..geometry.primitives import segment_segment_closest_points

    c1, c2 = segment_segment_closest_points(
        world.cap_start[:, None, :],
        world.cap_end[:, None, :],
        world.cap_start[None, :, :],
        world.cap_end[None, :, :],
    )
    disp = c1 - c2  # from B's segment point to A's
    d2 = jnp.sum(disp * disp, axis=-1)
    rsum = world.cap_radius[:, None] + world.cap_radius[None, :]
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    nrm = jnp.where(
        (dist > eps)[..., None],
        disp / jnp.maximum(dist, eps)[..., None],
        jnp.array([0.0, 0.0, 1.0]),
    )
    pos = c2 + world.cap_radius[None, :, None] * nrm
    dep = jnp.maximum(0.0, rsum - dist)
    iu = jnp.triu(jnp.ones((nc, nc), bool), k=1)
    pair_ok = (
        iu
        & pools.cap_mask[:, None]
        & pools.cap_mask[None, :]
        & ~_phantom_or_static_pair(pools.cap_kind[:, None], pools.cap_kind[None, :])
        & (pools.cap_body[:, None] != pools.cap_body[None, :])
    )
    resp = _combine_response(pools.cap_response[:, None, :], pools.cap_response[None, :, :])
    key = key_base + (
        jnp.arange(nc, dtype=jnp.uint32)[:, None] * nc
        + jnp.arange(nc, dtype=jnp.uint32)[None, :]
    )
    emit(
        key,
        pair_ok & (d2 <= rsum * rsum),
        pools.cap_body[:, None] * jnp.ones((1, nc), jnp.int32),
        pools.cap_body[None, :] * jnp.ones((nc, 1), jnp.int32),
        pos,
        nrm,
        dep,
        resp,
    )

    # --- compact ------------------------------------------------------------
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


def compact_contacts(
    key, active, body_a, body_b, position, normal, depth, response, max_contacts: int
) -> ContactBuffer:
    """Stable-compact active contacts into a fixed-size buffer, keys ascending.

    Uses argsort of ~active (stable), so active entries keep their flatten
    order — which is ascending key order. Overflow beyond ``max_contacts`` is
    dropped (deepest-first would be better; the reference's TinyVec manifolds
    cap at 32 per pair similarly, contact.rs:20).
    """
    order = jnp.argsort(~active, stable=True)
    take = order[:max_contacts]
    sel_active = active[take]
    return ContactBuffer(
        active=sel_active,
        key=jnp.where(sel_active, key[take], jnp.uint32(0xFFFFFFFF)),
        body_a=jnp.where(sel_active, body_a[take], 0),
        body_b=jnp.where(sel_active, body_b[take], 0),
        position=jnp.where(sel_active[:, None], position[take], 0.0),
        normal=jnp.where(
            sel_active[:, None], normal[take], jnp.array([0.0, 0.0, 1.0])
        ),
        depth=jnp.where(sel_active, depth[take], 0.0),
        response=jnp.where(sel_active[:, None], response[take], 0.0),
    )
