"""Rigid-body physics (ref: engine/crates/impact_physics).

Pools of bodies/collidables/forces/drivers as dense masked arrays; one
jit-compiled substep reproducing perform_physics_step's stage order; impulse
solver with Gauss-Seidel-parity scan mode and scalable Jacobi mode.
"""

from . import collision, driven_motion, forces, inertia, solver, state, step
from .state import BodyState, KIND_DYNAMIC, KIND_KINEMATIC, KIND_NONE, empty_body_state
from .step import PhysicsParams, PhysicsState, init_physics_state, physics_step

__all__ = [
    "state",
    "inertia",
    "forces",
    "driven_motion",
    "collision",
    "solver",
    "step",
    "BodyState",
    "PhysicsState",
    "PhysicsParams",
    "physics_step",
    "init_physics_state",
    "empty_body_state",
    "KIND_NONE",
    "KIND_DYNAMIC",
    "KIND_KINEMATIC",
]
