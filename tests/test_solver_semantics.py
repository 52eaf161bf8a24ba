"""Solver-semantics parity tests against the reference's documented behavior
(contact.rs constants and clamping rules)."""

import jax.numpy as jnp
import numpy as np
import pytest

from impact_tpu.physics.solver import (
    NORMAL_SPEED_FOR_BOUNCE,
    _clamp_impulses,
    _construct_tangents,
    empty_solver_cache,
    prepare_contacts,
)
from impact_tpu.physics.collision import ContactBuffer
from impact_tpu.physics.state import empty_body_state, KIND_DYNAMIC
from impact_tpu.utils.config import ConstraintSolverConfig


def _bodies_with_velocity(v):
    b = empty_body_state(2)
    b = b._replace(
        kind=b.kind.at[0].set(KIND_DYNAMIC),
        inv_mass=b.inv_mass.at[0].set(1.0),
        inv_inertia_body=b.inv_inertia_body.at[0].set(jnp.eye(3)),
        momentum=b.momentum.at[0].set(jnp.asarray(v, jnp.float32)),
        position=b.position.at[0].set(jnp.array([0.0, 1.0, 0.0])),
    )
    return b


def _one_contact(restitution=0.8):
    c = 4
    buf = ContactBuffer(
        active=jnp.zeros(c, bool).at[0].set(True),
        key=jnp.arange(c, dtype=jnp.uint32),
        body_a=jnp.zeros(c, jnp.int32),
        body_b=jnp.ones(c, jnp.int32),
        position=jnp.zeros((c, 3)),
        normal=jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (c, 1)),
        depth=jnp.zeros(c),
        response=jnp.tile(jnp.array([[restitution, 0.5, 0.3]]), (c, 1)),
    )
    return buf


class TestRestitutionThreshold:
    def test_slow_impact_no_bounce(self):
        """Below NORMAL_SPEED_FOR_BOUNCE the restitution target is zero
        (ref: contact.rs:234-236 'resting contacts become less jittery')."""
        bodies = _bodies_with_velocity([0.0, -0.2, 0.0])  # slow
        prep = prepare_contacts(
            bodies, _one_contact(0.9), empty_solver_cache(4), ConstraintSolverConfig()
        )
        assert float(prep.target_sep_vel[0]) == 0.0

    def test_fast_impact_bounces(self):
        bodies = _bodies_with_velocity([0.0, -2.0, 0.0])
        prep = prepare_contacts(
            bodies, _one_contact(0.9), empty_solver_cache(4), ConstraintSolverConfig()
        )
        # separating velocity is -2 (approaching); target = -e * sep = +1.8
        np.testing.assert_allclose(float(prep.target_sep_vel[0]), 1.8, rtol=1e-5)

    def test_threshold_value_matches_reference(self):
        assert NORMAL_SPEED_FOR_BOUNCE == pytest.approx(0.4)


class TestCoulombClamp:
    def test_negative_normal_clamped(self):
        out = _clamp_impulses(jnp.array([[-1.0, 0.3, 0.0]]), jnp.array([0.5]))
        np.testing.assert_allclose(out, [[0.0, 0.0, 0.0]], atol=1e-7)

    def test_friction_cone(self):
        out = _clamp_impulses(jnp.array([[2.0, 3.0, 4.0]]), jnp.array([0.5]))
        t_mag = float(jnp.sqrt(out[0, 1] ** 2 + out[0, 2] ** 2))
        assert t_mag == pytest.approx(1.0, rel=1e-5)  # ≤ μ·n = 1.0
        # direction preserved
        np.testing.assert_allclose(out[0, 1] / out[0, 2], 3.0 / 4.0, rtol=1e-5)

    def test_inside_cone_untouched(self):
        imp = jnp.array([[2.0, 0.3, 0.4]])
        out = _clamp_impulses(imp, jnp.array([0.5]))
        np.testing.assert_allclose(out, imp, rtol=1e-6)


class TestTangentBasis:
    def test_orthonormal_for_any_normal(self):
        import jax

        normals = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        t1, t2 = _construct_tangents(normals)
        np.testing.assert_allclose(jnp.linalg.norm(t1, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.norm(t2, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(jnp.sum(t1 * normals, axis=-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(jnp.sum(t1 * t2, axis=-1), 0.0, atol=1e-5)
        # right-handed: t1 × t2 = n
        np.testing.assert_allclose(jnp.cross(t1, t2), normals, atol=1e-4)


class TestWarmStart:
    def test_warm_impulse_carried_and_weighted(self):
        bodies = _bodies_with_velocity([0.0, -2.0, 0.0])
        contacts = _one_contact()
        cache = empty_solver_cache(4)
        cfg = ConstraintSolverConfig()
        # seed the cache as if the same contact key was solved last step
        cache = cache._replace(
            key=contacts.key,
            impulses=jnp.tile(jnp.array([[1.0, 0.1, 0.0]]), (4, 1)),
            normal=contacts.normal,
            tangent=_construct_tangents(contacts.normal)[0],
        )
        prep = prepare_contacts(bodies, contacts, cache, cfg)
        np.testing.assert_allclose(
            prep.warm_impulses[0],
            np.array([1.0, 0.1, 0.0]) * cfg.old_impulse_weight,
            rtol=1e-5,
        )

    def test_rotated_normal_rejects_warm_start(self):
        bodies = _bodies_with_velocity([0.0, -2.0, 0.0])
        contacts = _one_contact()
        cache = empty_solver_cache(4)
        cache = cache._replace(
            key=contacts.key,
            impulses=jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1)),
            normal=jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1)),  # 90° off
            tangent=jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (4, 1)),
        )
        prep = prepare_contacts(bodies, contacts, cache, ConstraintSolverConfig())
        np.testing.assert_allclose(prep.warm_impulses[0], 0.0, atol=1e-7)


class TestSegmentAccumulation:
    """The pod-scale sorted segment-sum accumulation must be numerically
    interchangeable with the one-hot-matmul accumulation (the small-N oracle).
    Ref semantics: solver.rs compute_and_apply_constrained_state — the
    accumulation strategy is an implementation detail, not a behavior."""

    def _random_scene(self, n_bodies, n_contacts, seed=0):
        import impact_tpu.physics.solver as solver_mod

        rng = np.random.default_rng(seed)
        b = empty_body_state(n_bodies)
        q = rng.normal(size=(n_bodies, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        b = b._replace(
            kind=jnp.full(n_bodies, KIND_DYNAMIC, jnp.int32),
            inv_mass=jnp.asarray(
                rng.uniform(0.2, 2.0, n_bodies).astype(np.float32)
            ),
            inv_inertia_body=jnp.broadcast_to(
                jnp.eye(3, dtype=jnp.float32), (n_bodies, 3, 3)
            )
            * jnp.asarray(rng.uniform(0.5, 2.0, (n_bodies, 1, 1)).astype(np.float32)),
            position=jnp.asarray(rng.normal(size=(n_bodies, 3)).astype(np.float32)),
            orientation=jnp.asarray(q),
            momentum=jnp.asarray(
                rng.normal(size=(n_bodies, 3)).astype(np.float32)
            ),
            angular_momentum=jnp.asarray(
                rng.normal(size=(n_bodies, 3)).astype(np.float32)
            ),
        )
        ia = rng.integers(0, n_bodies, n_contacts)
        ib = (ia + 1 + rng.integers(0, n_bodies - 1, n_contacts)) % n_bodies
        nrm = rng.normal(size=(n_contacts, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        buf = ContactBuffer(
            active=jnp.asarray(rng.uniform(size=n_contacts) < 0.8),
            key=jnp.arange(n_contacts, dtype=jnp.uint32),
            body_a=jnp.asarray(ia.astype(np.int32)),
            body_b=jnp.asarray(ib.astype(np.int32)),
            position=jnp.asarray(rng.normal(size=(n_contacts, 3)).astype(np.float32)),
            normal=jnp.asarray(nrm),
            depth=jnp.asarray(
                rng.uniform(0.0, 0.05, n_contacts).astype(np.float32)
            ),
            response=jnp.tile(
                jnp.array([[0.3, 0.6, 0.4]], jnp.float32), (n_contacts, 1)
            ),
        )
        cfg = ConstraintSolverConfig()
        prep = prepare_contacts(b, buf, empty_solver_cache(n_contacts), cfg)
        return solver_mod, b, prep, cfg

    def test_segment_matches_one_hot(self, monkeypatch):
        from impact_tpu.physics.solver import solve_contacts

        solver_mod, b, prep, cfg = self._random_scene(200, 96, seed=3)
        assert 200 >= solver_mod.SEGMENT_ACCUMULATION_MIN_BODIES
        out_seg, cache_seg = solve_contacts(b, prep, cfg, mode="jacobi")
        monkeypatch.setattr(
            solver_mod, "SEGMENT_ACCUMULATION_MIN_BODIES", 10**9
        )
        out_oh, cache_oh = solve_contacts(b, prep, cfg, mode="jacobi")
        np.testing.assert_allclose(
            np.asarray(out_seg.velocity), np.asarray(out_oh.velocity),
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_seg.angular_velocity),
            np.asarray(out_oh.angular_velocity), atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_seg.position), np.asarray(out_oh.position),
            atol=1e-5, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(cache_seg.impulses), np.asarray(cache_oh.impulses),
            atol=1e-4, rtol=1e-4,
        )
