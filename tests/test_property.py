"""Property-based invariant tests (hypothesis), mirroring the reference's
proptest coverage of impact_physics (rigid_body.rs, driven_motion/*.rs,
inertia.rs) and impact_math quaternions.

These run eagerly on tiny shapes (no jit) so each hypothesis example is
cheap; max_examples is capped to keep the module inside the fast gate.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from impact_tpu.math import quaternion as quat
from impact_tpu.physics import inertia as inertia_mod
from impact_tpu.physics import state as body_state
from impact_tpu.physics.driven_motion import solve_kepler

SETTINGS = dict(max_examples=25, deadline=None)

finite = st.floats(-10.0, 10.0, allow_nan=False, allow_infinity=False)
unit_ish = st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False)
positive = st.floats(0.1, 10.0, allow_nan=False, allow_infinity=False)


def _vec3(draw_floats=finite):
    return st.tuples(draw_floats, draw_floats, draw_floats).map(np.array)


def _nonzero_vec3():
    return _vec3().filter(lambda v: np.linalg.norm(v) > 1e-3)


def _random_quat():
    return st.tuples(unit_ish, unit_ish, unit_ish, unit_ish).map(
        np.array
    ).filter(lambda q: np.linalg.norm(q) > 1e-2)


# --- quaternions (ref: impact_math/src/quaternion.rs tests) -----------------


@settings(**SETTINGS)
@given(_random_quat())
def test_normalize_produces_unit_and_is_idempotent(q):
    qn = np.asarray(quat.normalize(jnp.asarray(q, jnp.float32)))
    assert abs(np.linalg.norm(qn) - 1.0) < 1e-5
    qnn = np.asarray(quat.normalize(jnp.asarray(qn)))
    np.testing.assert_allclose(qnn, qn, atol=1e-6)


@settings(**SETTINGS)
@given(_random_quat(), _vec3())
def test_rotation_preserves_length(q, v):
    qn = quat.normalize(jnp.asarray(q, jnp.float32))
    rv = np.asarray(quat.rotate(qn, jnp.asarray(v, jnp.float32)))
    assert abs(np.linalg.norm(rv) - np.linalg.norm(v)) < 1e-4 * (
        1.0 + np.linalg.norm(v)
    )


@settings(**SETTINGS)
@given(_random_quat(), _vec3())
def test_inverse_rotate_roundtrip(q, v):
    qn = quat.normalize(jnp.asarray(q, jnp.float32))
    v32 = jnp.asarray(v, jnp.float32)
    back = np.asarray(quat.inverse_rotate(qn, quat.rotate(qn, v32)))
    np.testing.assert_allclose(back, v, atol=1e-4)


@settings(**SETTINGS)
@given(_random_quat())
def test_rotation_matrix_roundtrip(q):
    qn = quat.normalize(jnp.asarray(q, jnp.float32))
    m = quat.to_rotation_matrix(qn)
    q2 = quat.from_rotation_matrix(m)
    # q and -q are the same rotation
    d = min(
        np.linalg.norm(np.asarray(q2) - np.asarray(qn)),
        np.linalg.norm(np.asarray(q2) + np.asarray(qn)),
    )
    assert d < 1e-3


@settings(**SETTINGS)
@given(_nonzero_vec3(), st.floats(-3.0, 3.0))
def test_axis_angle_matches_rodrigues(axis, angle):
    a = axis / np.linalg.norm(axis)
    q = quat.from_axis_angle(jnp.asarray(a, jnp.float32), jnp.float32(angle))
    v = np.array([1.0, -0.5, 2.0], np.float32)
    rv = np.asarray(quat.rotate(q, jnp.asarray(v)))
    # Rodrigues' formula
    c, s = np.cos(angle), np.sin(angle)
    expect = v * c + np.cross(a, v) * s + a * np.dot(a, v) * (1 - c)
    np.testing.assert_allclose(rv, expect, atol=1e-4)


@settings(**SETTINGS)
@given(_random_quat(), _random_quat(), _vec3())
def test_mul_composes_rotations(q1, q2, v):
    a = quat.normalize(jnp.asarray(q1, jnp.float32))
    b = quat.normalize(jnp.asarray(q2, jnp.float32))
    v32 = jnp.asarray(v, jnp.float32)
    lhs = np.asarray(quat.rotate(quat.mul(a, b), v32))
    rhs = np.asarray(quat.rotate(a, quat.rotate(b, v32)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)


# --- free flight (ref: rigid_body.rs advance_* proptests) -------------------


def _single_dynamic_body(pos, velocity, omega, mass, inertia_diag):
    b = body_state.empty_body_state(1)
    inertia = np.diag(inertia_diag).astype(np.float32)
    b = b._replace(
        kind=jnp.array([body_state.KIND_DYNAMIC], jnp.int32),
        mass=jnp.array([mass], jnp.float32),
        inv_mass=jnp.array([1.0 / mass], jnp.float32),
        inertia_body=jnp.asarray(inertia)[None],
        inv_inertia_body=jnp.asarray(np.linalg.inv(inertia))[None],
        position=jnp.asarray(pos, jnp.float32)[None],
    )
    return body_state.synchronize_momenta(
        b,
        jnp.asarray(velocity, jnp.float32)[None],
        jnp.asarray(omega, jnp.float32)[None],
    )


@settings(**SETTINGS)
@given(_vec3(), _vec3(), _vec3(), positive, st.tuples(positive, positive, positive))
def test_free_flight_conserves_momenta_and_linear_trajectory(
    pos, vel, omega, mass, inertia_diag
):
    b = _single_dynamic_body(pos, vel, omega, mass, np.array(inertia_diag))
    p0 = np.asarray(b.momentum[0])
    l0 = np.asarray(b.angular_momentum[0])
    dt = 0.01
    for _ in range(5):
        b = body_state.advance_momenta(b, dt)  # zero forces
        b = body_state.advance_configurations(b, dt, (body_state.KIND_DYNAMIC,))
    # momentum & world angular momentum exactly conserved with no forces
    np.testing.assert_allclose(np.asarray(b.momentum[0]), p0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.angular_momentum[0]), l0, atol=1e-5)
    # linear trajectory: x(t) = x0 + v t
    np.testing.assert_allclose(
        np.asarray(b.position[0]), np.asarray(pos) + np.asarray(vel) * 5 * dt,
        atol=1e-4 * (1 + np.linalg.norm(vel)),
    )
    # orientation stays unit
    assert abs(np.linalg.norm(np.asarray(b.orientation[0])) - 1.0) < 1e-4


@settings(**SETTINGS)
@given(_vec3(), _nonzero_vec3(), positive)
def test_free_rotation_conserves_kinetic_energy_for_spherical_inertia(
    pos, omega, mass
):
    # spherical inertia: ω constant, E = ½ωᵀIω constant exactly
    b = _single_dynamic_body(pos, np.zeros(3), omega, mass, np.full(3, 2.0))
    e0 = 0.5 * 2.0 * float(np.dot(omega, omega))
    for _ in range(10):
        b = body_state.advance_configurations(b, 0.01, (body_state.KIND_DYNAMIC,))
    _, w = body_state.compute_velocities(b)
    e1 = 0.5 * 2.0 * float(np.dot(np.asarray(w[0]), np.asarray(w[0])))
    assert abs(e1 - e0) < 1e-3 * (1.0 + e0)


# --- Kepler / drivers (ref: driven_motion/orbit.rs proptests) ---------------


@settings(**SETTINGS)
@given(
    st.floats(-20.0, 20.0, allow_nan=False),
    st.floats(0.0, 0.95, allow_nan=False),
)
def test_kepler_solution_satisfies_equation(mean_anomaly, eccentricity):
    E = float(solve_kepler(jnp.float32(mean_anomaly), jnp.float32(eccentricity)))
    assert abs(E - eccentricity * np.sin(E) - mean_anomaly) < 1e-3


# --- inertia (ref: inertia.rs proptests) ------------------------------------


@settings(**SETTINGS)
@given(positive, st.tuples(positive, positive, positive))
def test_box_inertia_positive_definite_and_triangle_inequality(mass, extents):
    inertia = np.asarray(inertia_mod.box_inertia(jnp.float32(mass), jnp.asarray(extents, jnp.float32)))
    eig = np.linalg.eigvalsh(inertia)
    assert (eig > 0).all()
    ix, iy, iz = np.diag(inertia)
    assert ix + iy >= iz - 1e-5
    assert iy + iz >= ix - 1e-5
    assert iz + ix >= iy - 1e-5


@settings(**SETTINGS)
@given(positive, positive, _vec3())
def test_translated_inertia_increases_moments(mass, radius, offset):
    base = np.asarray(inertia_mod.sphere_inertia(jnp.float32(mass), jnp.float32(radius)))
    moved = np.asarray(
        inertia_mod.translated_inertia(
            jnp.asarray(base), jnp.float32(mass), jnp.asarray(offset, jnp.float32)
        )
    )
    # parallel-axis theorem: trace grows by 2·m·|d|² and stays symmetric PD
    d2 = float(np.dot(offset, offset))
    assert abs(np.trace(moved) - (np.trace(base) + 2.0 * mass * d2)) < 1e-3 * (
        1.0 + np.trace(base) + mass * d2
    )
    np.testing.assert_allclose(moved, moved.T, atol=1e-5)
    assert (np.linalg.eigvalsh(moved) > -1e-5).all()


def test_mesh_inertia_matches_analytic_box():
    from impact_tpu.scene.mesh import box_mesh

    mesh = box_mesh((2.0, 1.0, 0.5))
    props = inertia_mod.mesh_inertial_properties(
        jnp.asarray(mesh.positions), jnp.asarray(mesh.indices), mass_density=3.0
    )
    mass, com, inertia = (np.asarray(p) for p in props)
    expect_mass = 3.0 * 2.0 * 1.0 * 0.5
    assert abs(mass - expect_mass) < 1e-3 * expect_mass
    np.testing.assert_allclose(com, np.zeros(3), atol=1e-4)
    expect = np.asarray(
        inertia_mod.box_inertia(
            jnp.float32(expect_mass), jnp.asarray([2.0, 1.0, 0.5], jnp.float32)
        )
    )
    np.testing.assert_allclose(inertia, expect, rtol=2e-3, atol=1e-4)
