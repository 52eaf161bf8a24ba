"""The physics step: one jit-compiled function per substep.

Ref: impact_physics/src/lib.rs:31-109 ``perform_physics_step`` — the exact
stage order is preserved:
  1. synchronize collidables with rigid bodies
  2. prepare constraints (narrow phase on pre-force velocities, warm start)
  3. advance dynamic momenta from the accumulated forces/torques
  4. solve + apply constrained velocities and corrected configurations
  5. advance dynamic configurations (semi-implicit Euler + quaternion step)
  6. advance kinematic configurations
  7. apply motion drivers
  8. apply forces/torques (fills accumulators for the NEXT substep)

The reference's per-frame task DAG collapses into this one function scanned
over substeps (SURVEY.md §7.0); XLA provides the intra-step parallelism the
reference's TaskScheduler exists for.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import ConstraintSolverConfig
from . import state as body_state
from .collision import CollidablePools, narrow_phase, synchronize_collidables
from .driven_motion import MotionDriverPools, apply_motion_drivers
from .forces import ForcePools, apply_forces_and_torques
from .solver import (
    JointPools,
    SolverCache,
    empty_joint_pools,
    prepare_contacts,
    solve_contacts,
    solve_joints,
)
from .state import BodyState


class PhysicsState(NamedTuple):
    """Device-resident physics state pytree carried across steps."""

    bodies: BodyState
    solver_cache: SolverCache
    time: jnp.ndarray  # f32 scalar simulation time


class PhysicsParams(NamedTuple):
    """Static-per-scene pools and configuration (also a pytree, but typically
    constant across steps unless entities are staged)."""

    collidables: CollidablePools
    forces: ForcePools
    drivers: MotionDriverPools
    joints: JointPools


def physics_substep(
    phys: PhysicsState,
    params: PhysicsParams,
    dt: float,
    solver_config: ConstraintSolverConfig,
    max_contacts: int,
    solver_mode: str = "scan",
    extra_contacts_fn=None,
) -> PhysicsState:
    """One substep, matching perform_physics_step (lib.rs:31-109).

    ``extra_contacts_fn(bodies) -> ContactBuffer`` lets the voxel subsystem
    append its probe-vs-SDF contacts (ref: impact_voxel/src/collidable.rs);
    they are merged before solving.
    """
    bodies = phys.bodies

    # 1-2. collidable sync + constraint preparation (pre-force velocities)
    world = synchronize_collidables(params.collidables, bodies.position, bodies.orientation)
    contacts = narrow_phase(params.collidables, world, max_contacts)
    if extra_contacts_fn is not None:
        contacts = extra_contacts_fn(bodies, contacts)
    prepared = prepare_contacts(bodies, contacts, phys.solver_cache, solver_config)

    # 3. advance momenta from forces accumulated at the end of the previous substep
    bodies = body_state.advance_momenta(bodies, dt)

    # 4. solve constraints (contacts, then spherical joints — the reference
    #    interleaves both kinds each iteration; sequential composition keeps
    #    the same fixed point for the small joint counts here)
    if solver_config.enabled:
        bodies, cache = solve_contacts(bodies, prepared, solver_config, mode=solver_mode)
        bodies = solve_joints(bodies, params.joints, solver_config)
    else:
        cache = phys.solver_cache

    # 5-6. advance configurations
    bodies = body_state.advance_configurations(
        bodies, dt, (body_state.KIND_DYNAMIC,)
    )
    bodies = body_state.advance_configurations(
        bodies, dt, (body_state.KIND_KINEMATIC,)
    )

    new_time = phys.time + dt

    # 7. motion drivers overwrite driven kinematic state at the new time
    bodies = apply_motion_drivers(bodies, params.drivers, new_time)

    # 8. forces/torques for the next substep
    bodies = apply_forces_and_torques(bodies, params.forces)

    return PhysicsState(bodies=bodies, solver_cache=cache, time=new_time)


def physics_step(
    phys: PhysicsState,
    params: PhysicsParams,
    dt: float,
    n_substeps: int,
    solver_config: ConstraintSolverConfig,
    max_contacts: int,
    solver_mode: str = "scan",
    extra_contacts_fn=None,
) -> PhysicsState:
    """Full step = lax.scan over substeps (ref: engine/src/physics.rs:288-305)."""
    sub_dt = dt / n_substeps

    def body(p, _):
        return (
            physics_substep(
                p, params, sub_dt, solver_config, max_contacts, solver_mode,
                extra_contacts_fn,
            ),
            None,
        )

    if n_substeps == 1:
        return physics_substep(
            phys, params, sub_dt, solver_config, max_contacts, solver_mode,
            extra_contacts_fn,
        )
    phys, _ = jax.lax.scan(body, phys, None, length=n_substeps)
    return phys


def init_physics_state(n_bodies: int, max_contacts: int) -> PhysicsState:
    from .solver import empty_solver_cache

    return PhysicsState(
        bodies=body_state.empty_body_state(n_bodies),
        solver_cache=empty_solver_cache(max_contacts),
        time=jnp.asarray(0.0, jnp.float32),
    )
