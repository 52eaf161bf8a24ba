"""Impulse-based contact/constraint solver.

Ref: impact_physics/src/constraint/solver.rs (sequential impulses with
warm-started accumulated impulses, velocity iterations, then split-impulse
positional correction) and constraint/contact.rs:233-520 (contact preparation,
impulse computation, Coulomb clamping, positional pseudo-impulses). The math
here reproduces those semantics exactly; constants NORMAL_SPEED_FOR_BOUNCE=0.4
and the slip-speed threshold come from contact.rs:236-238.

Two execution modes (SURVEY.md §7.3.1 — sequential impulses are inherently
serial):
  * ``scan``   — lax.scan over contact slots inside each iteration: true
    Gauss-Seidel order, bitwise-deterministic, used for reference parity.
  * ``jacobi`` — all contacts compute impulses in parallel from the same
    velocities, deltas scatter-add with under-relaxation; needs more
    iterations but runs at full VPU width for pod-scale contact counts.

Warm starting replaces the reference's ContactID hash map with a sorted join
on contact keys (both frames' compacted buffers are key-ascending).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from ..utils.config import ConstraintSolverConfig
from .collision import ContactBuffer
from .state import BodyState, compute_velocities, synchronize_momenta, world_inv_inertia

NORMAL_SPEED_FOR_BOUNCE = 0.4  # ref: contact.rs:236
SQUARED_SLIP_SPEED_FOR_DYNAMIC_FRICTION = 1e-4  # ref: contact.rs:238
WARM_START_DIRECTION_THRESHOLD = 1e-2  # ref: contact.rs:318
# jacobi accumulation strategy switch: below this body count the one-hot
# [C,N] matmul is an MXU-microsecond op; at/above it the sorted segment-sum
# path keeps memory O(C) (the pod config has ~100k bodies)
SEGMENT_ACCUMULATION_MIN_BODIES = 128


class SolverCache(NamedTuple):
    """Cross-step persistent solver state (warm-start impulses). Also exposes
    the last solve's contact bodies/positions so downstream systems (voxel
    fracturing, ref: fracturing.rs:508 handle_fracturing_impacts reading
    cached collision impulses) can react to impact strength."""

    key: jnp.ndarray  # u32[C] ascending; 0xFFFFFFFF = empty
    impulses: jnp.ndarray  # f32[C,3] accumulated (normal, tangent, bitangent)
    normal: jnp.ndarray  # f32[C,3]
    tangent: jnp.ndarray  # f32[C,3]
    active: jnp.ndarray  # bool[C]
    body_a: jnp.ndarray  # i32[C]
    body_b: jnp.ndarray  # i32[C]
    position: jnp.ndarray  # f32[C,3] contact point (world, at prepare time)


def empty_solver_cache(max_contacts: int) -> SolverCache:
    return SolverCache(
        key=jnp.full(max_contacts, 0xFFFFFFFF, jnp.uint32),
        impulses=jnp.zeros((max_contacts, 3), jnp.float32),
        normal=jnp.zeros((max_contacts, 3), jnp.float32),
        tangent=jnp.zeros((max_contacts, 3), jnp.float32),
        active=jnp.zeros(max_contacts, bool),
        body_a=jnp.zeros(max_contacts, jnp.int32),
        body_b=jnp.zeros(max_contacts, jnp.int32),
        position=jnp.zeros((max_contacts, 3), jnp.float32),
    )


class PreparedContacts(NamedTuple):
    active: jnp.ndarray  # bool[C]
    body_a: jnp.ndarray  # i32[C]
    body_b: jnp.ndarray  # i32[C]
    normal: jnp.ndarray  # f32[C,3]
    tangent: jnp.ndarray  # f32[C,3]
    bitangent: jnp.ndarray  # f32[C,3]
    disp_a: jnp.ndarray  # f32[C,3] contact point − COM_a (world, at prepare)
    disp_b: jnp.ndarray  # f32[C,3]
    local_a: jnp.ndarray  # f32[C,3] deepest point on A in A's body frame
    local_b: jnp.ndarray  # f32[C,3] deepest point on B in B's body frame
    eff_mass: jnp.ndarray  # f32[C,3] effective masses (n, t, b)
    friction_coef: jnp.ndarray  # f32[C]
    target_sep_vel: jnp.ndarray  # f32[C]
    warm_impulses: jnp.ndarray  # f32[C,3]
    key: jnp.ndarray  # u32[C]


def _construct_tangents(normal):
    """Vectorized tangent-basis construction (ref: contact.rs:813-830)."""
    inv_sqrt3 = 0.57735
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    t_yz = jnp.stack([jnp.zeros_like(nx), nz, -ny], axis=-1)
    t_xy = jnp.stack([ny, -nx, jnp.zeros_like(nx)], axis=-1)
    t1 = jnp.where((jnp.abs(nx) < inv_sqrt3)[..., None], t_yz, t_xy)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(normal, t1)
    return t1, t2


def _effective_mass(inv_mass_a, inv_mass_b, inv_in_a, inv_in_b, disp_a, disp_b, direction):
    """1 / (mA⁻¹ + mB⁻¹ + (rA×d)ᵀIA⁻¹(rA×d) + (rB×d)ᵀIB⁻¹(rB×d))
    (ref: contact.rs:788-810)."""
    ca = jnp.cross(disp_a, direction)
    cb = jnp.cross(disp_b, direction)
    denom = (
        inv_mass_a
        + inv_mass_b
        + jnp.sum(ca * jnp.einsum("...ij,...j->...i", inv_in_a, ca), axis=-1)
        + jnp.sum(cb * jnp.einsum("...ij,...j->...i", inv_in_b, cb), axis=-1)
    )
    return 1.0 / jnp.maximum(denom, 1e-12)


def prepare_contacts(
    bodies: BodyState,
    contacts: ContactBuffer,
    cache: SolverCache,
    config: ConstraintSolverConfig,
) -> PreparedContacts:
    """Contact preparation (ref: contact.rs:233-316) + warm-start join.

    Must run on PRE-force-advancement velocities (ref: lib.rs:57-73 prepares
    constraints before advance_momenta) — the restitution target and
    static-vs-dynamic friction choice depend on it.
    """
    v, w = compute_velocities(bodies)
    inv_inertia = world_inv_inertia(bodies)
    ia, ib = contacts.body_a, contacts.body_b

    disp_a = contacts.position - bodies.position[ia]
    disp_b = contacts.position - bodies.position[ib]
    normal = contacts.normal
    t1, t2 = _construct_tangents(normal)

    pos_on_a = contacts.position - contacts.depth[:, None] * normal
    local_a = quat.inverse_rotate(bodies.orientation[ia], pos_on_a - bodies.position[ia])
    local_b = quat.inverse_rotate(
        bodies.orientation[ib], contacts.position - bodies.position[ib]
    )

    em = jnp.stack(
        [
            _effective_mass(
                bodies.inv_mass[ia], bodies.inv_mass[ib],
                inv_inertia[ia], inv_inertia[ib], disp_a, disp_b, d,
            )
            for d in (normal, t1, t2)
        ],
        axis=-1,
    )

    vel_a = v[ia] + jnp.cross(w[ia], disp_a)
    vel_b = v[ib] + jnp.cross(w[ib], disp_b)
    rel_vel = vel_a - vel_b
    sep_vel = jnp.sum(normal * rel_vel, axis=-1)
    restitution = contacts.response[:, 0]
    target_sep_vel = jnp.where(
        jnp.abs(sep_vel) >= NORMAL_SPEED_FOR_BOUNCE, -restitution * sep_vel, 0.0
    )
    slip2 = (
        jnp.sum(t1 * rel_vel, axis=-1) ** 2 + jnp.sum(t2 * rel_vel, axis=-1) ** 2
    )
    friction = jnp.where(
        slip2 >= SQUARED_SLIP_SPEED_FOR_DYNAMIC_FRICTION,
        contacts.response[:, 2],
        contacts.response[:, 1],
    )

    # warm-start join: both key arrays ascend, so searchsorted finds matches
    idx = jnp.searchsorted(cache.key, contacts.key)
    idx = jnp.clip(idx, 0, cache.key.shape[0] - 1)
    matched = (cache.key[idx] == contacts.key) & contacts.active
    can_warm = (
        (jnp.sum(normal * cache.normal[idx], axis=-1) > 1.0 - WARM_START_DIRECTION_THRESHOLD)
        & (jnp.sum(t1 * cache.tangent[idx], axis=-1) > 1.0 - WARM_START_DIRECTION_THRESHOLD)
    )
    warm = jnp.where(
        (matched & can_warm)[:, None],
        cache.impulses[idx] * config.old_impulse_weight,
        0.0,
    )

    return PreparedContacts(
        active=contacts.active,
        body_a=ia,
        body_b=ib,
        normal=normal,
        tangent=t1,
        bitangent=t2,
        disp_a=disp_a,
        disp_b=disp_b,
        local_a=local_a,
        local_b=local_b,
        eff_mass=em,
        friction_coef=friction,
        target_sep_vel=target_sep_vel,
        warm_impulses=warm,
        key=contacts.key,
    )


def _clamp_impulses(imp, friction_coef):
    """Unilateral normal + Coulomb cone clamp (ref: contact.rs:371-397)."""
    n = jnp.maximum(0.0, imp[..., 0])
    max_t = friction_coef * n
    t_mag = jnp.sqrt(imp[..., 1] ** 2 + imp[..., 2] ** 2)
    scale = jnp.where(t_mag > max_t, max_t / jnp.maximum(t_mag, 1e-12), 1.0)
    return jnp.stack([n, imp[..., 1] * scale, imp[..., 2] * scale], axis=-1)


def _momentum_change(prep: PreparedContacts, imp):
    return (
        imp[..., 0:1] * prep.normal
        + imp[..., 1:2] * prep.tangent
        + imp[..., 2:3] * prep.bitangent
    )


def solve_contacts(
    bodies: BodyState,
    prep: PreparedContacts,
    config: ConstraintSolverConfig,
    mode: str = "scan",
    jacobi_relaxation: float = 0.8,
):
    """Velocity iterations + positional correction; returns (bodies, cache).

    Follows solver.rs:296 compute_and_apply_constrained_state: velocities are
    synchronized post-force-advancement, warm impulses pre-applied, then
    n_iterations of impulse solving, n_positional_correction_iterations of
    pseudo-impulse correction, and the result written back to the bodies.
    """
    v, w = compute_velocities(bodies)
    inv_inertia = world_inv_inertia(bodies)
    inv_mass = bodies.inv_mass
    ia, ib = prep.body_a, prep.body_b
    act = prep.active

    def apply_all(v, w, imp):
        """Scatter impulse set to bodies (vectorized, for warm start / jacobi)."""
        dp = _momentum_change(prep, imp) * act[:, None]
        v = v.at[ia].add(inv_mass[ia, None] * dp)
        v = v.at[ib].add(-inv_mass[ib, None] * dp)
        w = w.at[ia].add(
            jnp.einsum("cij,cj->ci", inv_inertia[ia], jnp.cross(prep.disp_a, dp))
        )
        w = w.at[ib].add(
            -jnp.einsum("cij,cj->ci", inv_inertia[ib], jnp.cross(prep.disp_b, dp))
        )
        return v, w

    # warm start (ref: solver.rs apply_warm_impulses_...)
    acc = prep.warm_impulses * act[:, None]
    v, w = apply_all(v, w, acc)

    if mode == "scan":
        def one_contact(carry, c):
            v, w = carry
            (a, b, active, normal, t1, t2, da, db, em, fric, tsv, acc_c) = c
            vel_a = v[a] + jnp.cross(w[a], da)
            vel_b = v[b] + jnp.cross(w[b], db)
            rel = vel_a - vel_b
            imp = jnp.stack(
                [
                    -em[0] * (jnp.dot(normal, rel) - tsv),
                    -em[1] * jnp.dot(t1, rel),
                    -em[2] * jnp.dot(t2, rel),
                ]
            )
            new_acc = _clamp_impulses(acc_c + imp, fric)
            delta = (new_acc - acc_c) * active
            dp = delta[0] * normal + delta[1] * t1 + delta[2] * t2
            v = v.at[a].add(inv_mass[a] * dp)
            v = v.at[b].add(-inv_mass[b] * dp)
            w = w.at[a].add(inv_inertia[a] @ jnp.cross(da, dp))
            w = w.at[b].add(-(inv_inertia[b] @ jnp.cross(db, dp)))
            return (v, w), jnp.where(active, new_acc, acc_c)

        contact_data = (
            ia, ib, act.astype(jnp.float32), prep.normal, prep.tangent,
            prep.bitangent, prep.disp_a, prep.disp_b, prep.eff_mass,
            prep.friction_coef, prep.target_sep_vel,
        )

        def iteration(_, state):
            v, w, acc = state
            (v, w), acc = jax.lax.scan(
                one_contact, (v, w), contact_data + (acc,)
            )
            return v, w, acc

        v, w, acc = jax.lax.fori_loop(
            0, config.n_iterations, iteration, (v, w, acc)
        )
    else:  # jacobi
        n = bodies.n
        if n < SEGMENT_ACCUMULATION_MIN_BODIES:
            # contact→body accumulation as one-hot matmuls: TPU scatters
            # serialize (each .at[].add over [C]→[N] costs ~ms), while
            # [C,N]×[C,3] contractions ride the MXU in microseconds. The
            # one-hot incidence matrices are built once per solve.
            body_ids = jnp.arange(n, dtype=ia.dtype)
            oh_a = ((ia[:, None] == body_ids[None, :]) & act[:, None]).astype(
                jnp.float32
            )  # [C,N]
            oh_b = ((ib[:, None] == body_ids[None, :]) & act[:, None]).astype(
                jnp.float32
            )

            def accumulate(dp):
                """[C,3] world momentum changes → (dv [N,3], dw [N,3])."""
                lin = jnp.einsum("cn,ck->nk", oh_a, dp) - jnp.einsum(
                    "cn,ck->nk", oh_b, dp
                )
                ang = jnp.einsum(
                    "cn,ck->nk", oh_a, jnp.cross(prep.disp_a, dp)
                ) - jnp.einsum("cn,ck->nk", oh_b, jnp.cross(prep.disp_b, dp))
                dv = inv_mass[:, None] * lin
                dw = jnp.einsum("nij,nj->ni", inv_inertia, ang)
                return dv, dw
        else:
            # pod-scale accumulation: the [C,N] incidence would be ~10⁹
            # elements at 100k bodies, so contacts are split into 2C sided
            # (body, ±Δp) entries sorted by body ONCE per solve, and every
            # iteration reduces with prefix-sum + per-body boundary
            # differences — O(C) work/memory, deterministic, no scatter.
            sentinel = jnp.asarray(n, ia.dtype)
            sid = jnp.concatenate(
                [jnp.where(act, ia, sentinel), jnp.where(act, ib, sentinel)]
            )
            order = jnp.argsort(sid)
            sid_sorted = sid[order]
            body_ids = jnp.arange(n, dtype=sid.dtype)
            seg_start = jnp.searchsorted(sid_sorted, body_ids, side="left")
            seg_end = jnp.searchsorted(sid_sorted, body_ids, side="right")

            def accumulate(dp):
                """[C,3] world momentum changes → (dv [N,3], dw [N,3])."""
                vals = jnp.concatenate(
                    [
                        jnp.concatenate([dp, jnp.cross(prep.disp_a, dp)], -1),
                        -jnp.concatenate([dp, jnp.cross(prep.disp_b, dp)], -1),
                    ]
                )[order]  # [2C,6] sorted by body
                csum = jnp.concatenate(
                    [jnp.zeros((1, 6), vals.dtype), jnp.cumsum(vals, axis=0)]
                )
                seg = csum[seg_end] - csum[seg_start]  # [N,6]
                dv = inv_mass[:, None] * seg[:, :3]
                dw = jnp.einsum("nij,nj->ni", inv_inertia, seg[:, 3:])
                return dv, dw

        def iteration(_, state):
            v, w, acc = state
            vel_a = v[ia] + jnp.cross(w[ia], prep.disp_a)
            vel_b = v[ib] + jnp.cross(w[ib], prep.disp_b)
            rel = vel_a - vel_b
            imp = jnp.stack(
                [
                    -prep.eff_mass[:, 0]
                    * (jnp.sum(prep.normal * rel, axis=-1) - prep.target_sep_vel),
                    -prep.eff_mass[:, 1] * jnp.sum(prep.tangent * rel, axis=-1),
                    -prep.eff_mass[:, 2] * jnp.sum(prep.bitangent * rel, axis=-1),
                ],
                axis=-1,
            )
            new_acc = _clamp_impulses(acc + jacobi_relaxation * imp, prep.friction_coef)
            delta = jnp.where(act[:, None], new_acc - acc, 0.0)
            dv, dw = accumulate(_momentum_change(prep, delta))
            return v + dv, w + dw, jnp.where(act[:, None], new_acc, acc)

        v, w, acc = jax.lax.fori_loop(
            0, max(config.n_iterations, 1) * 4, iteration, (v, w, acc)
        )

    # positional correction (ref: contact.rs:440-520), sequential in scan mode
    pos, ori = bodies.position, bodies.orientation
    corr = config.positional_correction_factor

    if mode == "jacobi":
        # parallel pseudo-impulse correction with the same matmul accumulation
        # (under-relaxed; the scan path below is the sequential parity oracle)
        def corr_iteration_j(_, state):
            pos, ori = state
            pa = pos[ia] + quat.rotate(ori[ia], prep.local_a)
            pb = pos[ib] + quat.rotate(ori[ib], prep.local_b)
            depth = jnp.sum(prep.normal * (pb - pa), axis=-1)
            da = pb - pos[ia]
            db = pb - pos[ib]
            em = _effective_mass(
                inv_mass[ia], inv_mass[ib], inv_inertia[ia], inv_inertia[ib],
                da, db, prep.normal,
            )
            pseudo = (
                em * corr * depth * (act & (depth > 0.0)) * jacobi_relaxation
            )
            dp = pseudo[:, None] * prep.normal
            dpos, dw = accumulate(dp)
            pos = pos + dpos
            ori = quat.integrate_angular_velocity(ori, dw, 1.0)
            return pos, ori

        pos, ori = jax.lax.fori_loop(
            0,
            config.n_positional_correction_iterations,
            corr_iteration_j,
            (pos, ori),
        )
        return _finalize(
            bodies, prep, v, w, acc, act, ia, ib, pos, ori
        )

    def one_correction(carry, c):
        pos, ori = carry
        a, b, active, normal, la, lb = c
        pa = pos[a] + quat.rotate(ori[a], la)
        pb = pos[b] + quat.rotate(ori[b], lb)
        depth = jnp.dot(normal, pb - pa)
        da = pb - pos[a]
        db = pb - pos[b]
        em = _effective_mass(
            inv_mass[a], inv_mass[b], inv_inertia[a], inv_inertia[b], da, db, normal
        )
        do_it = active * (depth > 0.0)
        pseudo = em * corr * depth * do_it
        dp = pseudo * normal
        pos = pos.at[a].add(inv_mass[a] * dp)
        pos = pos.at[b].add(-inv_mass[b] * dp)
        dwa = inv_inertia[a] @ jnp.cross(da, dp)
        dwb = -(inv_inertia[b] @ jnp.cross(db, dp))
        ori = ori.at[a].set(quat.integrate_angular_velocity(ori[a], dwa, 1.0))
        ori = ori.at[b].set(quat.integrate_angular_velocity(ori[b], dwb, 1.0))
        return (pos, ori), None

    corr_data = (ia, ib, act.astype(jnp.float32), prep.normal, prep.local_a, prep.local_b)

    def corr_iteration(_, state):
        pos, ori = state
        (pos, ori), _ = jax.lax.scan(one_correction, (pos, ori), corr_data)
        return pos, ori

    pos, ori = jax.lax.fori_loop(
        0, config.n_positional_correction_iterations, corr_iteration, (pos, ori)
    )
    return _finalize(bodies, prep, v, w, acc, act, ia, ib, pos, ori)


def _finalize(bodies, prep, v, w, acc, act, ia, ib, pos, ori):
    # Only bodies participating in ≥1 active constraint are written back —
    # the reference's ConstrainedBodyManager holds exactly those bodies
    # (solver.rs apply_constrained_body_velocities_...), and an unconditional
    # L → ω → L round trip would numerically drift momenta of free bodies.
    part = jnp.zeros(bodies.n, dtype=bool)
    part = part.at[ia].max(act)
    part = part.at[ib].max(act)
    pm = part[:, None]
    bodies = bodies._replace(
        position=jnp.where(pm, pos, bodies.position),
        orientation=jnp.where(pm, ori, bodies.orientation),
    )
    synced = synchronize_momenta(bodies, v, w)
    bodies = bodies._replace(
        momentum=jnp.where(pm, synced.momentum, bodies.momentum),
        angular_momentum=jnp.where(pm, synced.angular_momentum, bodies.angular_momentum),
        velocity=jnp.where(pm, synced.velocity, bodies.velocity),
        angular_velocity=jnp.where(pm, synced.angular_velocity, bodies.angular_velocity),
    )

    cache = SolverCache(
        key=prep.key,
        impulses=acc,
        normal=prep.normal,
        tangent=prep.tangent,
        active=act,
        body_a=ia,
        body_b=ib,
        # contact point (on B) at prepare time: COM_b + disp_b
        position=bodies.position[ib] + prep.disp_b,
    )
    return bodies, cache


# --- spherical joints (ref: impact_physics/src/constraint/spherical_joint.rs) --


class JointPools(NamedTuple):
    """Ball joints: body-frame anchors that must coincide."""

    body_a: jnp.ndarray  # i32[J]
    body_b: jnp.ndarray  # i32[J]
    anchor_a: jnp.ndarray  # f32[J,3] body frame
    anchor_b: jnp.ndarray  # f32[J,3]
    mask: jnp.ndarray  # bool[J]


def empty_joint_pools(cap: int = 16) -> JointPools:
    return JointPools(
        body_a=jnp.zeros(cap, jnp.int32),
        body_b=jnp.zeros(cap, jnp.int32),
        anchor_a=jnp.zeros((cap, 3), jnp.float32),
        anchor_b=jnp.zeros((cap, 3), jnp.float32),
        mask=jnp.zeros(cap, bool),
    )


def _skew(v):
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ],
        -2,
    )


def solve_joints(bodies: BodyState, joints: JointPools, config: ConstraintSolverConfig):
    """Velocity + positional solve for ball joints (3D unclamped impulses,
    matching the prepared-spherical-joint semantics: anchors coincide).

    Run after contact solving each step; joint counts are small so a few
    vectorized Jacobi iterations converge.
    """
    if joints is None or joints.mask.shape[0] == 0:
        return bodies
    from .state import compute_velocities, synchronize_momenta

    v, w = compute_velocities(bodies)
    inv_inertia = world_inv_inertia(bodies)
    inv_mass = bodies.inv_mass
    ia, ib = joints.body_a, joints.body_b
    act = joints.mask

    def anchors(pos, ori):
        pa = pos[ia] + quat.rotate(ori[ia], joints.anchor_a)
        pb = pos[ib] + quat.rotate(ori[ib], joints.anchor_b)
        return pa, pb

    def k_inv(pos, ori):
        pa, pb = anchors(pos, ori)
        ra = pa - pos[ia]
        rb = pb - pos[ib]
        sa, sb = _skew(ra), _skew(rb)
        k = (
            (inv_mass[ia] + inv_mass[ib])[:, None, None] * jnp.eye(3)
            + jnp.einsum("jik,jkl,jml->jim", sa, inv_inertia[ia], sa)
            + jnp.einsum("jik,jkl,jml->jim", sb, inv_inertia[ib], sb)
        )
        return jnp.linalg.inv(k + jnp.eye(3) * 1e-9), ra, rb

    kinv, ra, rb = k_inv(bodies.position, bodies.orientation)

    def vel_iter(_, state):
        v, w = state
        va = v[ia] + jnp.cross(w[ia], ra)
        vb = v[ib] + jnp.cross(w[ib], rb)
        imp = -jnp.einsum("jik,jk->ji", kinv, va - vb) * act[:, None]
        v = v.at[ia].add(inv_mass[ia, None] * imp)
        v = v.at[ib].add(-inv_mass[ib, None] * imp)
        w = w.at[ia].add(jnp.einsum("jik,jk->ji", inv_inertia[ia], jnp.cross(ra, imp)))
        w = w.at[ib].add(-jnp.einsum("jik,jk->ji", inv_inertia[ib], jnp.cross(rb, imp)))
        return v, w

    v, w = jax.lax.fori_loop(0, config.n_iterations, vel_iter, (v, w))

    # positional correction: pull anchors together by the configured factor
    pos, ori = bodies.position, bodies.orientation

    def pos_iter(_, state):
        pos, ori = state
        kinv_c, ra_c, rb_c = k_inv(pos, ori)
        pa, pb = anchors(pos, ori)
        err = pa - pb
        pseudo = -jnp.einsum("jik,jk->ji", kinv_c, err) * (
            config.positional_correction_factor * act
        )[:, None]
        pos = pos.at[ia].add(inv_mass[ia, None] * pseudo)
        pos = pos.at[ib].add(-inv_mass[ib, None] * pseudo)
        dwa = jnp.einsum("jik,jk->ji", inv_inertia[ia], jnp.cross(ra_c, pseudo))
        dwb = -jnp.einsum("jik,jk->ji", inv_inertia[ib], jnp.cross(rb_c, pseudo))
        ori = ori.at[ia].set(
            quat.integrate_angular_velocity(ori[ia], dwa * act[:, None], 1.0)
        )
        ori = ori.at[ib].set(
            quat.integrate_angular_velocity(ori[ib], dwb * act[:, None], 1.0)
        )
        return pos, ori

    pos, ori = jax.lax.fori_loop(
        0, config.n_positional_correction_iterations, pos_iter, (pos, ori)
    )

    part = jnp.zeros(bodies.n, bool).at[ia].max(act).at[ib].max(act)
    pm = part[:, None]
    bodies = bodies._replace(
        position=jnp.where(pm, pos, bodies.position),
        orientation=jnp.where(pm, ori, bodies.orientation),
    )
    synced = synchronize_momenta(bodies, v, w)
    return bodies._replace(
        momentum=jnp.where(pm, synced.momentum, bodies.momentum),
        angular_momentum=jnp.where(pm, synced.angular_momentum, bodies.angular_momentum),
        velocity=jnp.where(pm, v, bodies.velocity),
        angular_velocity=jnp.where(pm, w, bodies.angular_velocity),
    )
