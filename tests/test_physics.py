"""Physics tests — mirror impact_physics unit/property test coverage
(rigid_body integration, forces, drivers, contacts, solver behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impact_tpu.physics import (
    KIND_DYNAMIC,
    KIND_KINEMATIC,
    PhysicsParams,
    init_physics_state,
    physics_step,
)
from impact_tpu.physics import inertia as inr
from impact_tpu.physics.collision import empty_collidable_pools
from impact_tpu.physics.driven_motion import empty_motion_driver_pools, solve_kepler
from impact_tpu.physics.forces import empty_force_pools
from impact_tpu.utils.config import ConstraintSolverConfig

N_BODIES = 8
MAX_CONTACTS = 32


def make_scene():
    phys = init_physics_state(N_BODIES, MAX_CONTACTS)
    from impact_tpu.physics.solver import empty_joint_pools

    params = PhysicsParams(
        collidables=empty_collidable_pools(n_spheres=8, n_planes=2, n_capsules=4),
        forces=empty_force_pools(N_BODIES),
        drivers=empty_motion_driver_pools(),
        joints=empty_joint_pools(4),
    )
    return phys, params


def add_dynamic_sphere(phys, params, slot, pos, vel=(0, 0, 0), radius=0.5,
                       density=1.0, restitution=0.0, sf=0.5, df=0.3,
                       collider_slot=None, gravity=False):
    b = phys.bodies
    mass = float(inr.sphere_mass(density, radius))
    inertia = inr.sphere_inertia(jnp.asarray(mass), jnp.asarray(radius))
    b = b._replace(
        kind=b.kind.at[slot].set(KIND_DYNAMIC),
        mass=b.mass.at[slot].set(mass),
        inv_mass=b.inv_mass.at[slot].set(1.0 / mass),
        inertia_body=b.inertia_body.at[slot].set(inertia),
        inv_inertia_body=b.inv_inertia_body.at[slot].set(jnp.linalg.inv(inertia)),
        position=b.position.at[slot].set(jnp.asarray(pos, jnp.float32)),
        momentum=b.momentum.at[slot].set(mass * jnp.asarray(vel, jnp.float32)),
    )
    phys = phys._replace(bodies=b)
    c = params.collidables
    if collider_slot is not None:
        c = c._replace(
            sph_body=c.sph_body.at[collider_slot].set(slot),
            sph_radius=c.sph_radius.at[collider_slot].set(radius),
            sph_response=c.sph_response.at[collider_slot].set(
                jnp.array([restitution, sf, df])
            ),
            sph_mask=c.sph_mask.at[collider_slot].set(True),
        )
    f = params.forces
    if gravity:
        f = f._replace(
            const_accel_body=f.const_accel_body.at[slot].set(slot),
            const_accel=f.const_accel.at[slot].set(jnp.array([0.0, -9.81, 0.0])),
            const_accel_mask=f.const_accel_mask.at[slot].set(True),
        )
    params = params._replace(collidables=c, forces=f)
    # initialize accumulators as the reference does at scene start
    from impact_tpu.physics.forces import apply_forces_and_torques

    phys = phys._replace(bodies=apply_forces_and_torques(phys.bodies, f))
    return phys, params


def add_ground_plane(params, kin_slot=7, restitution=0.0, sf=0.5, df=0.3):
    c = params.collidables
    c = c._replace(
        pln_body=c.pln_body.at[0].set(kin_slot),
        pln_mask=c.pln_mask.at[0].set(True),
        pln_response=c.pln_response.at[0].set(jnp.array([restitution, sf, df])),
    )
    return params._replace(collidables=c)


def enable_kinematic(phys, slot):
    b = phys.bodies
    return phys._replace(bodies=b._replace(kind=b.kind.at[slot].set(KIND_KINEMATIC)))


from functools import partial

_CFG = ConstraintSolverConfig()


@partial(jax.jit, static_argnums=(4,))
def _run_jit(phys, params, dt, n, mode):
    def body(_, p):
        return physics_step(p, params, dt, 1, _CFG, MAX_CONTACTS, mode)

    return jax.lax.fori_loop(0, n, body, phys)


def run_steps(phys, params, n, dt=0.005, mode="scan", cfg=None):
    # One shared compile per mode: dt and n are traced, pools have fixed shapes.
    return jax.block_until_ready(
        _run_jit(phys, params, jnp.asarray(dt, jnp.float32), jnp.asarray(n), mode)
    )


@partial(jax.jit, static_argnums=(3,))
def _step1_jit(phys, params, dt, mode):
    return physics_step(phys, params, dt, 1, _CFG, MAX_CONTACTS, mode)


class TestIntegration:
    def test_free_fall_matches_semi_implicit_euler(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(phys, params, 0, (0, 10, 0), gravity=True)
        dt, n = 0.005, 100
        phys = run_steps(phys, params, n, dt)
        # semi-implicit Euler: v_k = -g k dt; y_n = y0 - g dt^2 (1+...+n)
        g = 9.81
        y_expected = 10.0 - g * dt * dt * (n * (n + 1) / 2)
        np.testing.assert_allclose(phys.bodies.position[0, 1], y_expected, rtol=1e-4)
        np.testing.assert_allclose(phys.bodies.velocity[0, 1], -g * dt * n, rtol=1e-4)

    def test_momentum_conserved_without_forces(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(phys, params, 0, (0, 0, 0), vel=(1, 2, 3))
        phys = run_steps(phys, params, 50)
        np.testing.assert_allclose(
            phys.bodies.position[0], np.array([1, 2, 3]) * 0.25, rtol=1e-4
        )

    def test_torque_free_rotation_conserves_angular_momentum(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(phys, params, 0, (0, 0, 0))
        b = phys.bodies
        L0 = jnp.array([0.1, 0.5, -0.2])
        phys = phys._replace(bodies=b._replace(angular_momentum=b.angular_momentum.at[0].set(L0)))
        phys = run_steps(phys, params, 100)
        np.testing.assert_allclose(phys.bodies.angular_momentum[0], L0, atol=1e-5)
        # orientation stays unit
        np.testing.assert_allclose(
            jnp.linalg.norm(phys.bodies.orientation[0]), 1.0, atol=1e-5
        )


class TestContacts:
    def test_resting_sphere_on_plane_does_not_sink(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(
            phys, params, 0, (0, 0.5, 0), collider_slot=0, gravity=True
        )
        phys = enable_kinematic(phys, 7)
        params = add_ground_plane(params)
        phys = run_steps(phys, params, 200)
        assert abs(float(phys.bodies.position[0, 1]) - 0.5) < 0.02
        assert abs(float(phys.bodies.velocity[0, 1])) < 0.05

    def test_bouncing_ball_restitution(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(
            phys, params, 0, (0, 2.0, 0), collider_slot=0, restitution=0.8,
            gravity=True,
        )
        phys = enable_kinematic(phys, 7)
        params = add_ground_plane(params, restitution=0.8)
        # drop from 1.5m above contact: v_impact = sqrt(2*g*1.5) ≈ 5.42 > bounce thresh
        dt = jnp.asarray(0.002, jnp.float32)
        ys = []
        for _ in range(1500):
            phys = _step1_jit(phys, params, dt, "scan")
            ys.append(float(phys.bodies.position[0, 1]))
        peak_after_bounce = max(ys[400:])
        # energy after one bounce: h' ≈ e^2 * h = 0.64 * 1.5 = 0.96 above contact
        assert 0.8 < (peak_after_bounce - 0.5) < 1.1, peak_after_bounce

    def test_equal_sphere_head_on_collision_exchanges_velocity(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(
            phys, params, 0, (-1.0, 0, 0), vel=(2, 0, 0), collider_slot=0,
            restitution=1.0,
        )
        phys, params = add_dynamic_sphere(
            phys, params, 1, (1.0, 0, 0), vel=(0, 0, 0), collider_slot=1,
            restitution=1.0,
        )
        phys = run_steps(phys, params, 300, dt=0.005)
        v0 = float(phys.bodies.velocity[0, 0])
        v1 = float(phys.bodies.velocity[1, 0])
        # elastic equal-mass: velocities exchange
        assert abs(v0) < 0.25, (v0, v1)
        assert abs(v1 - 2.0) < 0.25, (v0, v1)

    def test_friction_stops_sliding_sphere(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(
            phys, params, 0, (0, 0.5, 0), vel=(3, 0, 0), collider_slot=0,
            sf=0.8, df=0.6, gravity=True,
        )
        phys = enable_kinematic(phys, 7)
        params = add_ground_plane(params, sf=0.8, df=0.6)
        phys = run_steps(phys, params, 400)
        # friction converts sliding into rolling: terminal speed 5/7·v0 ≈ 2.14,
        # with ω·r matching v (rolling without slipping)
        v = float(phys.bodies.velocity[0, 0])
        w = float(phys.bodies.angular_velocity[0, 2])
        assert abs(v - 5.0 / 7.0 * 3.0) < 0.25, v
        assert abs((-w * 0.5) - v) < 0.25, (v, w)

    def test_jacobi_mode_agrees_roughly_with_scan(self):
        results = []
        for mode in ("scan", "jacobi"):
            phys, params = make_scene()
            phys, params = add_dynamic_sphere(
                phys, params, 0, (0, 0.6, 0), collider_slot=0, gravity=True
            )
            phys = enable_kinematic(phys, 7)
            params = add_ground_plane(params)
            phys = run_steps(phys, params, 150, mode=mode)
            results.append(np.asarray(phys.bodies.position[0]))
        np.testing.assert_allclose(results[0], results[1], atol=0.02)


class TestDrivers:
    def test_harmonic_oscillation(self):
        phys, params = make_scene()
        phys = enable_kinematic(phys, 0)
        d = params.drivers
        d = d._replace(
            osc_body=d.osc_body.at[0].set(0),
            osc_center=d.osc_center.at[0].set(jnp.array([0.0, 1.0, 0.0])),
            osc_dir=d.osc_dir.at[0].set(jnp.array([0.0, 1.0, 0.0])),
            osc_amplitude=d.osc_amplitude.at[0].set(2.0),
            osc_period=d.osc_period.at[0].set(1.0),
            osc_mask=d.osc_mask.at[0].set(True),
        )
        params = params._replace(drivers=d)
        phys = run_steps(phys, params, 50, dt=0.005)  # t = 0.25 = quarter period
        np.testing.assert_allclose(
            phys.bodies.position[0], [0.0, 3.0, 0.0], atol=1e-3
        )

    def test_circular_trajectory_radius_constant(self):
        phys, params = make_scene()
        phys = enable_kinematic(phys, 0)
        d = params.drivers
        d = d._replace(
            circ_body=d.circ_body.at[0].set(0),
            circ_center=d.circ_center.at[0].set(jnp.array([1.0, 0.0, 0.0])),
            circ_radius=d.circ_radius.at[0].set(2.0),
            circ_speed=d.circ_speed.at[0].set(3.0),
            circ_axis=d.circ_axis.at[0].set(jnp.array([0.0, 1.0, 0.0])),
            circ_mask=d.circ_mask.at[0].set(True),
        )
        params = params._replace(drivers=d)
        phys = run_steps(phys, params, 77, dt=0.01)
        r = np.linalg.norm(np.asarray(phys.bodies.position[0]) - np.array([1.0, 0, 0]))
        np.testing.assert_allclose(r, 2.0, rtol=1e-5)

    def test_kepler_solver(self):
        for e in [0.0, 0.3, 0.9]:
            for M in [0.1, 1.0, 3.0, 5.5]:
                E = float(solve_kepler(jnp.asarray(M), jnp.asarray(e)))
                assert abs(E - e * np.sin(E) - M) < 1e-5

    def test_orbit_period_closes(self):
        phys, params = make_scene()
        phys = enable_kinematic(phys, 0)
        d = params.drivers
        d = d._replace(
            orb_body=d.orb_body.at[0].set(0),
            orb_a=d.orb_a.at[0].set(2.0),
            orb_e=d.orb_e.at[0].set(0.5),
            orb_period=d.orb_period.at[0].set(1.0),
            orb_mask=d.orb_mask.at[0].set(True),
        )
        params = params._replace(drivers=d)
        phys0 = run_steps(phys, params, 10, dt=0.01)
        p_early = np.asarray(phys0.bodies.position[0])
        phys1 = run_steps(phys, params, 110, dt=0.01)  # one extra full period
        p_later = np.asarray(phys1.bodies.position[0])
        np.testing.assert_allclose(p_early, p_later, atol=1e-4)


class TestForces:
    def test_spring_oscillates_two_bodies(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(phys, params, 0, (-1.0, 0, 0))
        phys, params = add_dynamic_sphere(phys, params, 1, (1.0, 0, 0))
        f = params.forces
        f = f._replace(
            spring_body_a=f.spring_body_a.at[0].set(0),
            spring_body_b=f.spring_body_b.at[0].set(1),
            spring_stiffness=f.spring_stiffness.at[0].set(50.0),
            spring_rest_length=f.spring_rest_length.at[0].set(1.0),
            spring_mask=f.spring_mask.at[0].set(True),
        )
        params = params._replace(forces=f)
        from impact_tpu.physics.forces import apply_forces_and_torques

        phys = phys._replace(bodies=apply_forces_and_torques(phys.bodies, f))
        phys = run_steps(phys, params, 100)
        d = float(phys.bodies.position[1, 0] - phys.bodies.position[0, 0])
        assert d < 2.0  # spring pulled them together
        # symmetric: center of mass unmoved
        com = float(phys.bodies.position[0, 0] + phys.bodies.position[1, 0])
        assert abs(com) < 1e-4

    def test_dynamic_gravity_attracts(self):
        phys, params = make_scene()
        phys, params = add_dynamic_sphere(phys, params, 0, (-1.0, 0, 0), density=1e9)
        phys, params = add_dynamic_sphere(phys, params, 1, (1.0, 0, 0), density=1e9)
        f = params.forces
        f = f._replace(
            gravity_participant=f.gravity_participant.at[0].set(True)
            .at[1].set(True)
        )
        params = params._replace(forces=f)
        from impact_tpu.physics.forces import apply_forces_and_torques

        phys = phys._replace(bodies=apply_forces_and_torques(phys.bodies, f))
        phys = run_steps(phys, params, 50)
        assert float(phys.bodies.position[1, 0] - phys.bodies.position[0, 0]) < 2.0


class TestInertia:
    def test_sphere_inertia(self):
        i = inr.sphere_inertia(jnp.asarray(2.0), jnp.asarray(3.0))
        np.testing.assert_allclose(i, np.eye(3) * 0.4 * 2 * 9, rtol=1e-6)

    def test_box_inertia(self):
        i = inr.box_inertia(jnp.asarray(12.0), jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(jnp.diag(i), [4 + 9, 1 + 9, 1 + 4], rtol=1e-6)

    def test_parallel_axis(self):
        i = inr.sphere_inertia(jnp.asarray(1.0), jnp.asarray(1.0))
        it = inr.translated_inertia(i, jnp.asarray(1.0), jnp.array([0.0, 2.0, 0.0]))
        np.testing.assert_allclose(it[0, 0], 0.4 + 4.0, rtol=1e-6)
        np.testing.assert_allclose(it[1, 1], 0.4, rtol=1e-6)

    def test_capsule_mass_volume(self):
        m = inr.capsule_mass(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(0.0))
        np.testing.assert_allclose(m, 4.0 / 3.0 * np.pi, rtol=1e-5)


class TestJoints:
    def test_spherical_joint_holds_bodies_together(self):
        from impact_tpu.physics.solver import solve_joints  # noqa: F401

        phys, params = make_scene()
        phys, params = add_dynamic_sphere(phys, params, 0, (0.0, 2.0, 0.0), gravity=True)
        # body 7 kinematic anchor point at origin+3 up
        phys = enable_kinematic(phys, 7)
        b = phys.bodies
        phys = phys._replace(bodies=b._replace(
            position=b.position.at[7].set(jnp.array([0.0, 3.0, 0.0]))
        ))
        j = params.joints
        j = j._replace(
            body_a=j.body_a.at[0].set(0),
            body_b=j.body_b.at[0].set(7),
            anchor_a=j.anchor_a.at[0].set(jnp.array([0.0, 1.0, 0.0])),
            anchor_b=j.anchor_b.at[0].set(jnp.array([0.0, 0.0, 0.0])),
            mask=j.mask.at[0].set(True),
        )
        params = params._replace(joints=j)
        phys = run_steps(phys, params, 400)
        # pendulum: body's anchor (1 above its COM) must stay at the pivot (0,3,0)
        from impact_tpu.math import quaternion as quat

        anchor_world = np.asarray(
            phys.bodies.position[0]
            + quat.rotate(phys.bodies.orientation[0], jnp.array([0.0, 1.0, 0.0]))
        )
        np.testing.assert_allclose(anchor_world, [0.0, 3.0, 0.0], atol=0.05)
        # and the body hangs below the pivot, still moving or settled but finite
        assert np.isfinite(np.asarray(phys.bodies.position[0])).all()


class TestMeshInertia:
    def test_sphere_mesh_matches_analytic(self):
        """Mesh-based inertial properties (ref: inertia.rs:69
        of_uniform_triangle_mesh) match the analytic sphere within mesh
        discretization error."""
        from impact_tpu.physics.inertia import (
            mesh_inertial_properties,
            sphere_inertia,
        )
        from impact_tpu.scene.mesh import sphere_mesh

        m = sphere_mesh(radius=1.0, n_rings=48, n_segments=96)
        mass, com, inertia = mesh_inertial_properties(m.positions, m.indices, 1.0)
        vol = 4.0 / 3.0 * np.pi
        assert abs(float(mass) - vol) / vol < 0.01
        assert float(jnp.linalg.norm(com)) < 1e-3
        ref = np.asarray(sphere_inertia(jnp.asarray(float(mass)), jnp.asarray(1.0)))
        np.testing.assert_allclose(np.asarray(inertia), ref, rtol=0.02, atol=1e-4)

    def test_box_mesh_matches_analytic(self):
        from impact_tpu.physics.inertia import box_inertia, mesh_inertial_properties
        from impact_tpu.scene.mesh import box_mesh

        m = box_mesh((2.0, 1.0, 3.0))
        mass, com, inertia = mesh_inertial_properties(m.positions, m.indices, 2.0)
        assert abs(float(mass) - 12.0) < 1e-3
        ref = np.asarray(
            box_inertia(jnp.asarray(float(mass)), jnp.asarray([2.0, 1.0, 3.0]))
        )
        np.testing.assert_allclose(np.asarray(inertia), ref, rtol=1e-3, atol=1e-4)

    def test_translated_mesh_same_com_inertia(self):
        """COM inertia is invariant to where the mesh sits relative to the
        origin (the signed-tetra integrals handle arbitrary origins)."""
        from impact_tpu.physics.inertia import mesh_inertial_properties
        from impact_tpu.scene.mesh import sphere_mesh

        m = sphere_mesh(radius=1.0, n_rings=24, n_segments=48)
        m1 = mesh_inertial_properties(m.positions, m.indices, 1.0)
        shifted = np.asarray(m.positions) + np.array([5.0, -3.0, 2.0])
        m2 = mesh_inertial_properties(shifted, m.indices, 1.0)
        np.testing.assert_allclose(float(m1[0]), float(m2[0]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(m2[1]), np.asarray(m1[1]) + [5.0, -3.0, 2.0], atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(m1[2]), np.asarray(m2[2]), rtol=1e-3, atol=1e-4)


class TestInterlockSeparation:
    """Ref: contact.rs:610-780 — interlocked manifolds are replaced by one
    synthetic separating contact."""

    def _run(self, pos, nrm, dep, com_a, com_b):
        from impact_tpu.voxel.collision import (
            separating_contacts_for_interlocked,
        )

        pos = jnp.asarray(pos, jnp.float32)[None]
        nrm = jnp.asarray(nrm, jnp.float32)[None]
        dep = jnp.asarray(dep, jnp.float32)[None]
        act = jnp.ones(dep.shape, bool)
        return separating_contacts_for_interlocked(
            pos, nrm, dep, act,
            jnp.asarray(com_a, jnp.float32)[None],
            jnp.asarray(com_b, jnp.float32)[None],
        )

    def test_aligned_manifold_not_interlocked(self):
        """All normals share a direction → alignment 1.0 → no interlock."""
        pos = [[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]]
        nrm = [[0, 1, 0]] * 4
        dep = [0.1, 0.2, 0.1, 0.2]
        inter, _, _, _ = self._run(pos, nrm, dep, (0.5, 1, 0.5), (0.5, -1, 0.5))
        assert not bool(inter[0])

    def test_opposing_manifold_interlocked(self):
        """Opposing penetration vectors cancel → interlocked; the synthetic
        contact satisfies the reference's invariants (contact.rs:637-780):
        unit axis oriented to push COM_a from COM_b, depth = contact extent
        along the axis, position = the min-displacement contact point."""
        # 8 points spanning x:4, y:2, z:1 (diameter = the box diagonal — the
        # reference's exact pairwise scan picks it too)
        pos = np.array(
            [
                [x, y, z]
                for x in (0.0, 4.0)
                for y in (0.0, 2.0)
                for z in (0.0, 1.0)
            ],
            np.float32,
        )
        # half push +x, half push -x → cancel
        nrm = [[1, 0, 0]] * 4 + [[-1, 0, 0]] * 4
        dep = [0.3] * 8
        com_a, com_b = (2.0, 1.0, 3.0), (2.0, 1.0, -3.0)
        inter, spos, sax, sdep = self._run(pos, nrm, dep, com_a, com_b)
        assert bool(inter[0])
        ax = np.asarray(sax[0])
        np.testing.assert_allclose(np.linalg.norm(ax), 1.0, atol=1e-5)
        assert float(np.dot(ax, np.subtract(com_a, com_b))) > 0.0
        disp = pos @ ax
        np.testing.assert_allclose(
            float(sdep[0]), disp.max() - disp.min(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(spos[0]), pos[disp.argmin()], atol=1e-4
        )

    def test_zero_depth_manifold_not_interlocked(self):
        pos = [[0, 0, 0], [1, 0, 0]]
        nrm = [[1, 0, 0], [-1, 0, 0]]
        dep = [0.0, 0.0]
        inter, _, _, _ = self._run(pos, nrm, dep, (0, 0, 0), (1, 0, 0))
        assert not bool(inter[0])

    def test_collinear_manifold_falls_back_to_major(self):
        """Points along one line: middle/minor degenerate → separate along
        the major axis (ref fallback, contact.rs:668-672)."""
        pos = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]
        nrm = [[0, 1, 0], [0, -1, 0], [0, 1, 0], [0, -1, 0]]
        dep = [0.2] * 4
        inter, spos, sax, sdep = self._run(
            pos, nrm, dep, (5.0, 0, 0), (-5.0, 0, 0)
        )
        assert bool(inter[0])
        ax = np.asarray(sax[0])
        np.testing.assert_allclose(np.abs(ax), [1, 0, 0], atol=1e-5)
        assert ax[0] > 0
        np.testing.assert_allclose(float(sdep[0]), 3.0, atol=1e-5)
