"""Driven motion: analytic drivers overwriting kinematic body state each step.

Ref: impact_physics/src/driven_motion.rs + 5 driver modules (circular,
constant_acceleration, constant_rotation, harmonic_oscillation, orbit) — each
driver recomputes its kinematic body's position/orientation/velocity from the
elapsed simulation time after the integration step (lib.rs:98-100).

TPU redesign: one fixed-capacity pool per driver kind; each apply is a masked
vectorized scatter into the body pool.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from .state import BodyState


def _orthonormal_basis(axis):
    """Two unit vectors spanning the plane ⟂ axis [...,3]."""
    h = jnp.where(
        jnp.abs(axis[..., 0:1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), axis.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), axis.shape),
    )
    e1 = jnp.cross(axis, h)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12)
    e2 = jnp.cross(axis, e1)
    return e1, e2


class MotionDriverPools(NamedTuple):
    # circular trajectory (ref: driven_motion/circular.rs)
    circ_body: jnp.ndarray  # i32[Cc]
    circ_center: jnp.ndarray  # f32[Cc,3]
    circ_radius: jnp.ndarray  # f32[Cc]
    circ_speed: jnp.ndarray  # f32[Cc] angular speed (rad/s)
    circ_axis: jnp.ndarray  # f32[Cc,3]
    circ_phase: jnp.ndarray  # f32[Cc]
    circ_mask: jnp.ndarray  # bool[Cc]
    # constant-acceleration trajectory (ref: driven_motion/constant_acceleration.rs)
    lin_body: jnp.ndarray
    lin_p0: jnp.ndarray
    lin_v0: jnp.ndarray
    lin_accel: jnp.ndarray
    lin_mask: jnp.ndarray
    # constant rotation (ref: driven_motion/constant_rotation.rs)
    rot_body: jnp.ndarray
    rot_q0: jnp.ndarray  # f32[Cr,4]
    rot_omega: jnp.ndarray  # f32[Cr,3]
    rot_mask: jnp.ndarray
    # harmonic oscillation (ref: driven_motion/harmonic_oscillation.rs)
    osc_body: jnp.ndarray
    osc_center: jnp.ndarray
    osc_dir: jnp.ndarray
    osc_amplitude: jnp.ndarray
    osc_period: jnp.ndarray
    osc_phase: jnp.ndarray
    osc_mask: jnp.ndarray
    # Keplerian orbit (ref: driven_motion/orbit.rs)
    orb_body: jnp.ndarray
    orb_focus: jnp.ndarray  # f32[Co,3] focal position
    orb_a: jnp.ndarray  # semi-major axis
    orb_e: jnp.ndarray  # eccentricity
    orb_period: jnp.ndarray
    orb_orient: jnp.ndarray  # f32[Co,4] orbit-plane orientation
    orb_phase: jnp.ndarray  # initial mean anomaly
    orb_mask: jnp.ndarray


def empty_motion_driver_pools(cap: int = 16) -> MotionDriverPools:
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    zi = jnp.zeros(cap, jnp.int32)
    zb = jnp.zeros(cap, bool)
    return MotionDriverPools(
        circ_body=zi, circ_center=z(cap, 3), circ_radius=z(cap), circ_speed=z(cap),
        circ_axis=z(cap, 3), circ_phase=z(cap), circ_mask=zb,
        lin_body=zi, lin_p0=z(cap, 3), lin_v0=z(cap, 3), lin_accel=z(cap, 3), lin_mask=zb,
        rot_body=zi, rot_q0=quat.identity((cap,)), rot_omega=z(cap, 3), rot_mask=zb,
        osc_body=zi, osc_center=z(cap, 3), osc_dir=z(cap, 3), osc_amplitude=z(cap),
        osc_period=jnp.ones(cap, jnp.float32), osc_phase=z(cap), osc_mask=zb,
        orb_body=zi, orb_focus=z(cap, 3), orb_a=jnp.ones(cap, jnp.float32),
        orb_e=z(cap), orb_period=jnp.ones(cap, jnp.float32),
        orb_orient=quat.identity((cap,)), orb_phase=z(cap), orb_mask=zb,
    )


def solve_kepler(mean_anomaly, eccentricity, n_newton: int = 8):
    """Eccentric anomaly E from M = E - e·sin E (Newton, fixed iterations)."""
    e = eccentricity
    E0 = mean_anomaly + e * jnp.sin(mean_anomaly)

    def body(_, E):
        f = E - e * jnp.sin(E) - mean_anomaly
        fp = 1.0 - e * jnp.cos(E)
        return E - f / jnp.maximum(fp, 1e-9)

    return jax.lax.fori_loop(0, n_newton, body, E0)


def _masked_idx(body, mask, n):
    """Scatter indices for masked pool entries: inactive entries point past the
    pool so ``mode="drop"`` discards them (duplicate in-range indices from
    inactive slots would otherwise race the active write)."""
    return jnp.where(mask, body, n)


def apply_motion_drivers(bodies: BodyState, pools: MotionDriverPools, t) -> BodyState:
    """Overwrite driven kinematic bodies' state at simulation time ``t``."""
    pos, vel = bodies.position, bodies.velocity
    ori, ang = bodies.orientation, bodies.angular_velocity

    # circular
    th = pools.circ_speed * t + pools.circ_phase
    e1, e2 = _orthonormal_basis(pools.circ_axis)
    p_c = pools.circ_center + pools.circ_radius[:, None] * (
        jnp.cos(th)[:, None] * e1 + jnp.sin(th)[:, None] * e2
    )
    v_c = pools.circ_radius[:, None] * pools.circ_speed[:, None] * (
        -jnp.sin(th)[:, None] * e1 + jnp.cos(th)[:, None] * e2
    )
    idx = _masked_idx(pools.circ_body, pools.circ_mask, bodies.n)
    pos = pos.at[idx].set(p_c, mode="drop")
    vel = vel.at[idx].set(v_c, mode="drop")

    # constant-acceleration trajectory
    p_l = pools.lin_p0 + pools.lin_v0 * t + 0.5 * pools.lin_accel * t * t
    v_l = pools.lin_v0 + pools.lin_accel * t
    idx = _masked_idx(pools.lin_body, pools.lin_mask, bodies.n)
    pos = pos.at[idx].set(p_l, mode="drop")
    vel = vel.at[idx].set(v_l, mode="drop")

    # constant rotation: q(t) = exp(½ω t)·q0
    w_norm = jnp.linalg.norm(pools.rot_omega, axis=-1)
    axis = pools.rot_omega / jnp.maximum(w_norm, 1e-12)[:, None]
    q_rot = quat.mul(quat.from_axis_angle(axis, w_norm * t), pools.rot_q0)
    idx = _masked_idx(pools.rot_body, pools.rot_mask, bodies.n)
    ori = ori.at[idx].set(q_rot, mode="drop")
    ang = ang.at[idx].set(pools.rot_omega, mode="drop")

    # harmonic oscillation
    ph = 2.0 * jnp.pi * t / pools.osc_period + pools.osc_phase
    p_o = pools.osc_center + pools.osc_dir * (pools.osc_amplitude * jnp.sin(ph))[:, None]
    v_o = pools.osc_dir * (
        pools.osc_amplitude * (2.0 * jnp.pi / pools.osc_period) * jnp.cos(ph)
    )[:, None]
    idx = _masked_idx(pools.osc_body, pools.osc_mask, bodies.n)
    pos = pos.at[idx].set(p_o, mode="drop")
    vel = vel.at[idx].set(v_o, mode="drop")

    # Keplerian orbit: standard orbital elements, x toward periapsis,
    # z = orbit normal in the orbit-local frame, rotated by orb_orient.
    n_mean = 2.0 * jnp.pi / pools.orb_period
    M = n_mean * t + pools.orb_phase
    E = solve_kepler(M, pools.orb_e)
    a, e = pools.orb_a, pools.orb_e
    b = a * jnp.sqrt(jnp.maximum(1.0 - e * e, 0.0))
    x = a * (jnp.cos(E) - e)
    y = b * jnp.sin(E)
    dE_dt = n_mean / jnp.maximum(1.0 - e * jnp.cos(E), 1e-9)
    vx = -a * jnp.sin(E) * dE_dt
    vy = b * jnp.cos(E) * dE_dt
    zeros = jnp.zeros_like(x)
    p_loc = jnp.stack([x, y, zeros], axis=-1)
    v_loc = jnp.stack([vx, vy, zeros], axis=-1)
    p_orb = pools.orb_focus + quat.rotate(pools.orb_orient, p_loc)
    v_orb = quat.rotate(pools.orb_orient, v_loc)
    idx = _masked_idx(pools.orb_body, pools.orb_mask, bodies.n)
    pos = pos.at[idx].set(p_orb, mode="drop")
    vel = vel.at[idx].set(v_orb, mode="drop")

    return bodies._replace(position=pos, velocity=vel, orientation=ori, angular_velocity=ang)
