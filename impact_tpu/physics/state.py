"""Rigid-body state as a pytree of dense SoA arrays.

TPU-first redesign of the reference's ``RigidBodyManager`` (ref:
impact_physics/src/rigid_body.rs:72-130): instead of separate Vec<DynamicRigidBody>
/ Vec<KinematicRigidBody> with KeyIndexMapper indirection, all bodies live in
one fixed-capacity pool of arrays with a per-slot ``kind`` code. XLA then
processes every body in each op; masks select behavior.

State variables mirror DynamicRigidBody (rigid_body.rs:94-109): mass, inertia
tensor (body frame, about the center of mass), position, orientation, momentum,
angular momentum, plus the force/torque accumulators reset each substep.
Kinematic bodies (rigid_body.rs:111) store velocity/angular velocity directly
and have inv_mass = 0 so impulses never move them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..math import quaternion as quat

KIND_NONE = 0
KIND_DYNAMIC = 1
KIND_KINEMATIC = 2


class BodyState(NamedTuple):
    """[N]-pooled rigid bodies. All arrays have leading dim N (static)."""

    kind: jnp.ndarray  # i32[N]: 0 none, 1 dynamic, 2 kinematic
    mass: jnp.ndarray  # f32[N]
    inv_mass: jnp.ndarray  # f32[N] (0 for kinematic/none)
    inertia_body: jnp.ndarray  # f32[N,3,3] body-frame inertia about COM
    inv_inertia_body: jnp.ndarray  # f32[N,3,3]
    position: jnp.ndarray  # f32[N,3] center of mass, world
    orientation: jnp.ndarray  # f32[N,4] quaternion (x,y,z,w)
    momentum: jnp.ndarray  # f32[N,3] (dynamic)
    angular_momentum: jnp.ndarray  # f32[N,3] (dynamic, world frame)
    velocity: jnp.ndarray  # f32[N,3] (kinematic primary; scratch for dynamic)
    angular_velocity: jnp.ndarray  # f32[N,3] (kinematic primary)
    total_force: jnp.ndarray  # f32[N,3] accumulator
    total_torque: jnp.ndarray  # f32[N,3] accumulator

    @property
    def n(self) -> int:
        return self.kind.shape[0]

    @property
    def is_dynamic(self):
        return self.kind == KIND_DYNAMIC

    @property
    def is_kinematic(self):
        return self.kind == KIND_KINEMATIC

    @property
    def alive(self):
        return self.kind != KIND_NONE


def empty_body_state(n: int) -> BodyState:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    z3 = jnp.zeros((n, 3), jnp.float32)
    return BodyState(
        kind=jnp.zeros(n, jnp.int32),
        mass=jnp.ones(n, jnp.float32),
        inv_mass=jnp.zeros(n, jnp.float32),
        inertia_body=eye,
        inv_inertia_body=jnp.zeros((n, 3, 3), jnp.float32),
        position=z3,
        orientation=quat.identity((n,)),
        momentum=z3,
        angular_momentum=z3,
        velocity=z3,
        angular_velocity=z3,
        total_force=z3,
        total_torque=z3,
    )


def world_inv_inertia(bodies: BodyState) -> jnp.ndarray:
    """World-frame inverse inertia tensors: R · I⁻¹_body · Rᵀ  [N,3,3]."""
    r = quat.to_rotation_matrix(bodies.orientation)
    return jnp.einsum("nij,njk,nlk->nil", r, bodies.inv_inertia_body, r)


def compute_velocities(bodies: BodyState):
    """(velocity, angular_velocity) [N,3] for every body.

    Dynamic: v = p/m, ω = I⁻¹_world · L (ref: rigid_body.rs compute_velocity /
    compute_angular_velocity). Kinematic: stored directly.
    """
    dyn = bodies.is_dynamic[:, None]
    v_dyn = bodies.momentum * bodies.inv_mass[:, None]
    w_dyn = jnp.einsum("nij,nj->ni", world_inv_inertia(bodies), bodies.angular_momentum)
    v = jnp.where(dyn, v_dyn, bodies.velocity)
    w = jnp.where(dyn, w_dyn, bodies.angular_velocity)
    return v, w


def synchronize_momenta(bodies: BodyState, velocity, angular_velocity) -> BodyState:
    """Set dynamic bodies' momenta from the given velocities and store the
    velocities for kinematic bodies (ref: rigid_body.rs synchronize_momentum /
    synchronize_angular_momentum)."""
    r = quat.to_rotation_matrix(bodies.orientation)
    inertia_world = jnp.einsum("nij,njk,nlk->nil", r, bodies.inertia_body, r)
    dyn = bodies.is_dynamic[:, None]
    momentum = jnp.where(dyn, bodies.mass[:, None] * velocity, bodies.momentum)
    ang_mom = jnp.where(
        dyn, jnp.einsum("nij,nj->ni", inertia_world, angular_velocity), bodies.angular_momentum
    )
    return bodies._replace(
        momentum=momentum,
        angular_momentum=ang_mom,
        velocity=velocity,
        angular_velocity=angular_velocity,
    )


def advance_momenta(bodies: BodyState, dt) -> BodyState:
    """Semi-implicit Euler force step (ref: rigid_body.rs:708-718)."""
    dyn = bodies.is_dynamic[:, None]
    return bodies._replace(
        momentum=jnp.where(dyn, bodies.momentum + bodies.total_force * dt, bodies.momentum),
        angular_momentum=jnp.where(
            dyn, bodies.angular_momentum + bodies.total_torque * dt, bodies.angular_momentum
        ),
    )


def advance_configurations(bodies: BodyState, dt, kinds) -> BodyState:
    """Advance position/orientation for bodies whose kind is in ``kinds``
    (ref: rigid_body.rs:722-744 advance_position / advance_orientation)."""
    v, w = compute_velocities(bodies)
    sel = jnp.zeros_like(bodies.kind, dtype=bool)
    for k in kinds:
        sel = sel | (bodies.kind == k)
    new_pos = bodies.position + v * dt
    new_q = quat.integrate_angular_velocity(bodies.orientation, w, dt)
    return bodies._replace(
        position=jnp.where(sel[:, None], new_pos, bodies.position),
        orientation=jnp.where(sel[:, None], new_q, bodies.orientation),
        # keep the velocity fields fresh (they are primary for kinematic
        # bodies — identity there — and derived bookkeeping for dynamic ones,
        # consumed by rendering motion vectors and tests)
        velocity=jnp.where(sel[:, None], v, bodies.velocity),
        angular_velocity=jnp.where(sel[:, None], w, bodies.angular_velocity),
    )


def reset_forces_and_torques(bodies: BodyState) -> BodyState:
    return bodies._replace(
        total_force=jnp.zeros_like(bodies.total_force),
        total_torque=jnp.zeros_like(bodies.total_torque),
    )
