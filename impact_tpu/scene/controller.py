"""Motion and orientation controllers.

Ref: impact_controller — ``MotionController`` (semi-directional movement:
a set of active direction keys composed in the controlled entity's frame,
motion.rs) and ``OrientationController`` (roll-free camera: yaw about world-up,
pitch about local-right, orientation.rs), with ECS systems writing the
controlled entity's velocities into its rigid body (systems.rs).

Host-side controller state (it consumes input events); its output is a
(velocity, orientation) pair written into the controlled body slot before
each step — one tiny device update per frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..math import quaternion as quat

DIRECTIONS = ("forward", "backward", "left", "right", "up", "down")


@dataclass
class MotionController:
    """Semi-directional movement (ref: motion.rs SemiDirectional)."""

    movement_speed: float = 8.0
    vertical_control: bool = True
    _active: set = field(default_factory=set)

    def set_direction(self, direction: str, active: bool):
        assert direction in DIRECTIONS, direction
        if active:
            self._active.add(direction)
        else:
            self._active.discard(direction)

    def stop(self):
        self._active.clear()

    def local_velocity(self) -> np.ndarray:
        """Movement velocity in the controlled entity's local frame
        (camera convention: −z forward, +x right, +y up)."""
        v = np.zeros(3, np.float32)
        if "forward" in self._active:
            v[2] -= 1.0
        if "backward" in self._active:
            v[2] += 1.0
        if "left" in self._active:
            v[0] -= 1.0
        if "right" in self._active:
            v[0] += 1.0
        if self.vertical_control:
            if "up" in self._active:
                v[1] += 1.0
            if "down" in self._active:
                v[1] -= 1.0
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n * self.movement_speed
        return v

    def world_velocity(self, orientation_xyzw) -> np.ndarray:
        q = np.asarray(orientation_xyzw, np.float32)
        return np.asarray(quat.rotate(q, self.local_velocity()))


@dataclass
class RollFreeCameraOrientationController:
    """Yaw/pitch orientation without roll (ref: orientation.rs RollFreeCamera)."""

    sensitivity: float = 1.0
    yaw: float = 0.0  # radians about world +y
    pitch: float = 0.0  # radians about local +x, clamped

    def update(self, dx: float, dy: float):
        """Apply a mouse delta (radians pre-sensitivity)."""
        self.yaw -= dx * self.sensitivity
        self.pitch = float(
            np.clip(self.pitch - dy * self.sensitivity, -0.49 * np.pi, 0.49 * np.pi)
        )

    def orientation(self) -> np.ndarray:
        qy = quat.from_axis_angle(np.array([0.0, 1.0, 0.0], np.float32), self.yaw)
        qp = quat.from_axis_angle(np.array([1.0, 0.0, 0.0], np.float32), self.pitch)
        return np.asarray(quat.mul(qy, qp))


@dataclass
class EntityController:
    """Binds controllers to a body slot; produces per-frame state writes
    (ref: impact_controller systems.rs writing velocities into rigid bodies)."""

    body_index: int
    motion: MotionController = field(default_factory=MotionController)
    orientation: RollFreeCameraOrientationController = field(
        default_factory=RollFreeCameraOrientationController
    )

    def apply(self, sim):
        """Write the controlled body's orientation + velocity into the sim
        state (kinematic bodies only). Returns the updated SimState."""
        import jax.numpy as jnp

        b = sim.phys.bodies
        q = jnp.asarray(self.orientation.orientation(), jnp.float32)
        v = jnp.asarray(self.motion.world_velocity(np.asarray(q)), jnp.float32)
        b = b._replace(
            orientation=b.orientation.at[self.body_index].set(q),
            velocity=b.velocity.at[self.body_index].set(v),
        )
        return sim._replace(phys=sim.phys._replace(bodies=b))
