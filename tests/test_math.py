"""Tests for the math foundation (mirrors impact_math unit-test coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impact_tpu.math import morton, quaternion as quat, random as irandom, transform as tf


def rand_unit_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return quat.normalize(q)


class TestQuaternion:
    def test_identity_rotation(self):
        v = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(quat.rotate(quat.IDENTITY, v), v, atol=1e-6)

    def test_axis_angle_roundtrip(self):
        axis = jnp.array([0.0, 0.0, 1.0])
        q = quat.from_axis_angle(axis, jnp.pi / 2)
        v = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(
            quat.rotate(q, v), jnp.array([0.0, 1.0, 0.0]), atol=1e-6
        )
        ax, ang = quat.to_axis_angle(q)
        np.testing.assert_allclose(ax, axis, atol=1e-6)
        np.testing.assert_allclose(ang, jnp.pi / 2, atol=1e-6)

    def test_mul_composes_rotations(self):
        key = jax.random.PRNGKey(0)
        q1, q2 = rand_unit_quats(key, 2)
        v = jnp.array([0.3, -1.2, 2.0])
        np.testing.assert_allclose(
            quat.rotate(quat.mul(q1, q2), v),
            quat.rotate(q1, quat.rotate(q2, v)),
            atol=1e-5,
        )

    def test_rotation_matrix_matches_rotate(self):
        qs = rand_unit_quats(jax.random.PRNGKey(1), 16)
        v = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        m = quat.to_rotation_matrix(qs)
        np.testing.assert_allclose(
            jnp.einsum("nij,nj->ni", m, v), quat.rotate(qs, v), atol=1e-5
        )

    def test_from_rotation_matrix_roundtrip(self):
        qs = rand_unit_quats(jax.random.PRNGKey(3), 64)
        m = quat.to_rotation_matrix(qs)
        q2 = quat.from_rotation_matrix(m)
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(qs * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(qs, q2 * sign, atol=1e-4)

    def test_conjugate_inverts(self):
        qs = rand_unit_quats(jax.random.PRNGKey(4), 8)
        v = jax.random.normal(jax.random.PRNGKey(5), (8, 3))
        np.testing.assert_allclose(
            quat.rotate(quat.conjugate(qs), quat.rotate(qs, v)), v, atol=1e-5
        )

    def test_integrate_angular_velocity_small_step(self):
        # Integrating omega = (0,0,w) for time t should approach rotation by w*t.
        q = quat.identity()
        omega = jnp.array([0.0, 0.0, 1.0])
        dt = 1e-4
        for _ in range(100):
            q = quat.integrate_angular_velocity(q, omega, dt)
        expected = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.01)
        np.testing.assert_allclose(q, expected, atol=1e-5)

    def test_slerp_endpoints(self):
        q0, q1 = rand_unit_quats(jax.random.PRNGKey(6), 2)
        np.testing.assert_allclose(quat.slerp(q0, q1, 0.0), q0, atol=1e-5)
        s1 = quat.slerp(q0, q1, 1.0)
        sign = jnp.sign(jnp.sum(q1 * s1))
        np.testing.assert_allclose(s1 * sign, q1, atol=1e-5)


class TestTransforms:
    def test_isometry_inverse(self):
        key = jax.random.PRNGKey(7)
        t = jax.random.normal(key, (5, 3))
        r = rand_unit_quats(jax.random.PRNGKey(8), 5)
        iso = tf.Isometry(t, r)
        p = jax.random.normal(jax.random.PRNGKey(9), (5, 3))
        np.testing.assert_allclose(
            tf.iso_apply(tf.iso_inverse(iso), tf.iso_apply(iso, p)), p, atol=1e-5
        )

    def test_isometry_compose(self):
        a = tf.Isometry(jnp.array([1.0, 0.0, 0.0]), quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2))
        b = tf.Isometry(jnp.array([0.0, 2.0, 0.0]), quat.identity())
        p = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(
            tf.iso_apply(tf.iso_compose(a, b), p),
            tf.iso_apply(a, tf.iso_apply(b, p)),
            atol=1e-6,
        )

    def test_similarity_scales(self):
        sim = tf.Similarity(
            jnp.zeros(3), quat.identity(), jnp.asarray(2.0)
        )
        np.testing.assert_allclose(
            tf.sim_apply(sim, jnp.array([1.0, 1.0, 1.0])),
            jnp.array([2.0, 2.0, 2.0]),
            atol=1e-6,
        )
        inv = tf.sim_inverse(sim)
        np.testing.assert_allclose(
            tf.sim_apply(inv, tf.sim_apply(sim, jnp.array([3.0, -1.0, 0.5]))),
            jnp.array([3.0, -1.0, 0.5]),
            atol=1e-6,
        )

    def test_matrix_agrees(self):
        t = jnp.array([1.0, 2.0, 3.0])
        r = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.7)
        sim = tf.Similarity(t, r, jnp.asarray(1.5))
        m = tf.sim_to_matrix(sim)
        p = jnp.array([0.2, -0.4, 0.9])
        hp = jnp.concatenate([p, jnp.ones(1)])
        np.testing.assert_allclose((m @ hp)[:3], tf.sim_apply(sim, p), atol=1e-5)


class TestRandom:
    def test_splitmix_deterministic(self):
        a = irandom.splitmix64_sequence(42, 8)
        b = irandom.splitmix64_sequence(42, 8)
        np.testing.assert_array_equal(a, b)
        assert len(set(a.tolist())) == 8

    def test_halton_first_values(self):
        # Halton base 2: 1/2, 1/4, 3/4, 1/8, ...
        assert irandom.halton(1, 2) == pytest.approx(0.5)
        assert irandom.halton(2, 2) == pytest.approx(0.25)
        assert irandom.halton(3, 2) == pytest.approx(0.75)
        assert irandom.halton(1, 3) == pytest.approx(1 / 3)

    def test_jitter_table_bounded(self):
        assert irandom.taa_jitter_offsets.shape == (32, 2)
        assert np.all(np.abs(irandom.taa_jitter_offsets) <= 0.5)


class TestMorton:
    def test_encode_ordering(self):
        # Morton codes must preserve locality: (0,0,0) < (1,1,1) block codes
        c000 = morton.morton_encode_3d(jnp.uint32(0), jnp.uint32(0), jnp.uint32(0))
        c100 = morton.morton_encode_3d(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0))
        c010 = morton.morton_encode_3d(jnp.uint32(0), jnp.uint32(1), jnp.uint32(0))
        c001 = morton.morton_encode_3d(jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))
        assert int(c000) == 0
        assert int(c100) == 1
        assert int(c010) == 2
        assert int(c001) == 4

    def test_points_quantization(self):
        pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        codes = morton.morton_codes_for_points(
            pts, jnp.zeros(3), jnp.ones(3)
        )
        assert int(codes[0]) == 0
        assert int(codes[1]) == (1 << 30) - 1
