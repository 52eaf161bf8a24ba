"""Force and torque generators.

Ref: impact_physics/src/force.rs:24-32 — the reference's
``ForceGeneratorManager`` holds 7 generator registries (constant acceleration,
local force, dyn-dyn spring, dyn-kin spring, detailed drag, dynamic gravity,
alignment torque), each applied at the end of every substep to fill the bodies'
force/torque accumulators for the next substep (lib.rs:102-108).

TPU redesign: each generator kind is a fixed-capacity SoA pool
(:class:`ForcePools`) plus one vectorized ``apply`` that scatter-adds into the
accumulators. The whole force pass is a handful of fused XLA ops regardless of
generator count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from .state import BodyState, compute_velocities, reset_forces_and_torques


class ForcePools(NamedTuple):
    """All force-generator pools. Leading dims are static capacities."""

    # Constant acceleration (gravity): per-entry body + acceleration
    # (ref: force/constant_acceleration.rs)
    const_accel_body: jnp.ndarray  # i32[Ca]
    const_accel: jnp.ndarray  # f32[Ca,3]
    const_accel_mask: jnp.ndarray  # bool[Ca]
    # Local force at body-fixed point (ref: force/local_force.rs)
    local_force_body: jnp.ndarray  # i32[Cl]
    local_force: jnp.ndarray  # f32[Cl,3] world-space force
    local_point: jnp.ndarray  # f32[Cl,3] body-frame application point
    local_force_mask: jnp.ndarray  # bool[Cl]
    # Springs (covers dyn-dyn and dyn-kin; ref: force/spring_force.rs)
    spring_body_a: jnp.ndarray  # i32[Cs]
    spring_body_b: jnp.ndarray  # i32[Cs]
    spring_attach_a: jnp.ndarray  # f32[Cs,3] body-frame attachment on a
    spring_attach_b: jnp.ndarray  # f32[Cs,3]
    spring_stiffness: jnp.ndarray  # f32[Cs]
    spring_damping: jnp.ndarray  # f32[Cs]
    spring_rest_length: jnp.ndarray  # f32[Cs]
    spring_mask: jnp.ndarray  # bool[Cs]
    # Dynamic N-body gravity (ref: force/dynamic_gravity.rs)
    gravity_participant: jnp.ndarray  # bool[N] per body
    gravitational_constant: jnp.ndarray  # f32 scalar
    # Alignment torque: aligns a body-fixed axis with a world direction
    # (ref: force/alignment_torque.rs FixedDirectionAlignmentTorque)
    align_body: jnp.ndarray  # i32[Ct]
    align_axis: jnp.ndarray  # f32[Ct,3] body-frame axis to align
    align_target: jnp.ndarray  # f32[Ct,3] world target direction
    align_strength: jnp.ndarray  # f32[Ct]
    align_damping: jnp.ndarray  # f32[Ct]
    align_mask: jnp.ndarray  # bool[Ct]
    # Quadratic drag vs the uniform medium (analytic fallback when a body has
    # no precomputed map; ref: force/detailed_drag.rs)
    drag_coef: jnp.ndarray  # f32[N] per body (0 = no drag)
    drag_area: jnp.ndarray  # f32[N] reference area
    medium_density: jnp.ndarray  # f32 scalar
    medium_velocity: jnp.ndarray  # f32[3]
    # Precomputed drag-load maps (ref: DragLoadMap/EquirectangularMap):
    # per-shape [T,P,6] body-frame force+torque coefficient tables
    drag_map_table: jnp.ndarray  # f32[M, T, P, 6]
    drag_map_index: jnp.ndarray  # i32[N] map slot per body, −1 = analytic


def empty_force_pools(
    n_bodies: int, cap_accel: int = 64, cap_local: int = 16, cap_springs: int = 64,
    cap_align: int = 16,
) -> ForcePools:
    z3 = lambda c: jnp.zeros((c, 3), jnp.float32)  # noqa: E731
    return ForcePools(
        const_accel_body=jnp.zeros(cap_accel, jnp.int32),
        const_accel=z3(cap_accel),
        const_accel_mask=jnp.zeros(cap_accel, bool),
        local_force_body=jnp.zeros(cap_local, jnp.int32),
        local_force=z3(cap_local),
        local_point=z3(cap_local),
        local_force_mask=jnp.zeros(cap_local, bool),
        spring_body_a=jnp.zeros(cap_springs, jnp.int32),
        spring_body_b=jnp.zeros(cap_springs, jnp.int32),
        spring_attach_a=z3(cap_springs),
        spring_attach_b=z3(cap_springs),
        spring_stiffness=jnp.zeros(cap_springs, jnp.float32),
        spring_damping=jnp.zeros(cap_springs, jnp.float32),
        spring_rest_length=jnp.zeros(cap_springs, jnp.float32),
        spring_mask=jnp.zeros(cap_springs, bool),
        align_body=jnp.zeros(cap_align, jnp.int32),
        align_axis=jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (cap_align, 1)),
        align_target=jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (cap_align, 1)),
        align_strength=jnp.zeros(cap_align, jnp.float32),
        align_damping=jnp.zeros(cap_align, jnp.float32),
        align_mask=jnp.zeros(cap_align, bool),
        gravity_participant=jnp.zeros(n_bodies, bool),
        gravitational_constant=jnp.asarray(6.674e-11, jnp.float32),
        drag_coef=jnp.zeros(n_bodies, jnp.float32),
        drag_area=jnp.ones(n_bodies, jnp.float32),
        drag_map_table=jnp.zeros((1, 2, 2, 6), jnp.float32),
        drag_map_index=jnp.full(n_bodies, -1, jnp.int32),
        medium_density=jnp.asarray(0.0, jnp.float32),
        medium_velocity=jnp.zeros(3, jnp.float32),
    )


def apply_forces_and_torques(bodies: BodyState, pools: ForcePools) -> BodyState:
    """Reset and refill the force/torque accumulators
    (ref: impact_physics/src/lib.rs:102-108)."""
    bodies = reset_forces_and_torques(bodies)
    n = bodies.n
    force = jnp.zeros((n, 3), jnp.float32)
    torque = jnp.zeros((n, 3), jnp.float32)
    vel, ang_vel = compute_velocities(bodies)
    dyn = bodies.is_dynamic

    # constant acceleration: F = m a
    ca_f = (
        bodies.mass[pools.const_accel_body][:, None]
        * pools.const_accel
        * pools.const_accel_mask[:, None]
    )
    force = force.at[pools.const_accel_body].add(ca_f)

    # local forces: world force at body point → force + torque
    lp_world = quat.rotate(
        bodies.orientation[pools.local_force_body], pools.local_point
    )
    lf = pools.local_force * pools.local_force_mask[:, None]
    force = force.at[pools.local_force_body].add(lf)
    torque = torque.at[pools.local_force_body].add(jnp.cross(lp_world, lf))

    # springs between attachment points
    ia, ib = pools.spring_body_a, pools.spring_body_b
    ra = quat.rotate(bodies.orientation[ia], pools.spring_attach_a)
    rb = quat.rotate(bodies.orientation[ib], pools.spring_attach_b)
    pa = bodies.position[ia] + ra
    pb = bodies.position[ib] + rb
    dvec = pb - pa
    dist = jnp.linalg.norm(dvec, axis=-1)
    direction = dvec / jnp.maximum(dist, 1e-12)[:, None]
    va = vel[ia] + jnp.cross(ang_vel[ia], ra)
    vb = vel[ib] + jnp.cross(ang_vel[ib], rb)
    rel_speed = jnp.sum((vb - va) * direction, axis=-1)
    f_mag = (
        pools.spring_stiffness * (dist - pools.spring_rest_length)
        + pools.spring_damping * rel_speed
    ) * pools.spring_mask
    f_on_a = f_mag[:, None] * direction
    force = force.at[ia].add(f_on_a)
    force = force.at[ib].add(-f_on_a)
    torque = torque.at[ia].add(jnp.cross(ra, f_on_a))
    torque = torque.at[ib].add(jnp.cross(rb, -f_on_a))

    # alignment torque: τ = k · (R·axis × target) − c·ω (ref: alignment_torque.rs)
    ab = pools.align_body
    axis_w = quat.rotate(bodies.orientation[ab], pools.align_axis)
    tgt = pools.align_target / jnp.maximum(
        jnp.linalg.norm(pools.align_target, axis=-1, keepdims=True), 1e-9
    )
    t_align = (
        pools.align_strength[:, None] * jnp.cross(axis_w, tgt)
        - pools.align_damping[:, None] * ang_vel[ab]
    ) * pools.align_mask[:, None]
    torque = torque.at[ab].add(t_align)

    # dynamic N-body gravity: pairwise masked O(N²) (ref: dynamic_gravity.rs)
    gp = pools.gravity_participant & bodies.alive
    diff = bodies.position[None, :, :] - bodies.position[:, None, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    pair_mask = gp[:, None] & gp[None, :] & ~jnp.eye(n, dtype=bool)
    inv_r3 = jnp.where(pair_mask, 1.0 / jnp.maximum(r2, 1e-12) ** 1.5, 0.0)
    mm = bodies.mass[:, None] * bodies.mass[None, :]
    g_force = pools.gravitational_constant * jnp.sum(
        (mm * inv_r3)[..., None] * diff, axis=1
    )
    force = force + jnp.where(gp[:, None], g_force, 0.0)

    # detailed drag (ref: force/detailed_drag.rs): bodies with a precomputed
    # DragLoadMap sample it by body-frame flow direction; others fall back to
    # the analytic quadratic model
    v_rel = vel - pools.medium_velocity
    speed = jnp.linalg.norm(v_rel, axis=-1, keepdims=True)
    drag_on = (pools.drag_coef > 0) & (pools.medium_density > 0)
    f_drag = -0.5 * pools.medium_density * pools.drag_coef[:, None] * pools.drag_area[:, None] * speed * v_rel
    t_drag = -0.5 * pools.medium_density * pools.drag_coef[:, None] * pools.drag_area[:, None] * jnp.linalg.norm(ang_vel, axis=-1, keepdims=True) * ang_vel

    has_map = drag_on & (pools.drag_map_index >= 0)
    if pools.drag_map_table.shape[0] > 0:
        from .drag_map import sample_drag_load

        flow_world = -v_rel  # incoming-flow direction: fluid motion vs body
        flow_body = quat.inverse_rotate(bodies.orientation, flow_world)
        d_body = flow_body / jnp.maximum(speed, 1e-9)
        q_dyn = 0.5 * pools.medium_density * speed[:, 0] ** 2  # [N]
        tables = pools.drag_map_table[jnp.maximum(pools.drag_map_index, 0)]
        # vectorized per-body bilinear lookup over each body's own table
        fc, tc = jax.vmap(sample_drag_load)(tables, d_body)
        f_map = quat.rotate(bodies.orientation, fc) * q_dyn[:, None]
        t_map = quat.rotate(bodies.orientation, tc) * q_dyn[:, None]
        f_drag = jnp.where(has_map[:, None], f_map, f_drag)
        t_drag = jnp.where(has_map[:, None], t_map, t_drag)
    force = force + jnp.where(drag_on[:, None], f_drag, 0.0)
    torque = torque + jnp.where(drag_on[:, None], t_drag, 0.0)

    # only dynamic bodies accumulate
    return bodies._replace(
        total_force=jnp.where(dyn[:, None], force, 0.0),
        total_torque=jnp.where(dyn[:, None], torque, 0.0),
    )
