"""ECS world tests (mirrors impact_ecs tests/query.rs + tests/setup.rs coverage)."""

import numpy as np
import pytest

from impact_tpu.ecs import World, component
from impact_tpu.ecs.components import (
    ConstantAcceleration,
    DynamicRigidBodySubstance,
    Motion,
    ReferenceFrame,
    SphericalCollidable,
)


@component
class _TestTag:
    value: int = 7


class TestWorld:
    def test_create_and_query(self):
        w = World(capacity=16)
        e1 = w.create_entity(
            ReferenceFrame(position=(1.0, 2.0, 3.0)), Motion(linear_velocity=(1.0, 0.0, 0.0))
        )
        e2 = w.create_entity(ReferenceFrame(position=(4.0, 5.0, 6.0)))
        assert w.n_alive == 2
        idx, _ = w.query(ReferenceFrame, Motion)
        assert len(idx) == 1
        assert idx[0] == w.entity_index(e1)
        idx2, _ = w.query(ReferenceFrame)
        assert len(idx2) == 2
        # excluded filter
        idx3, _ = w.query(ReferenceFrame, excluded=[Motion])
        assert len(idx3) == 1 and idx3[0] == w.entity_index(e2)

    def test_column_mutation_visible(self):
        w = World(capacity=8)
        e = w.create_entity(ReferenceFrame(position=(0.0, 0.0, 0.0)))
        idx, [rf] = w.query(ReferenceFrame)
        rf["position"][idx] += np.array([1.0, 1.0, 1.0])
        got = w.get_component(e, ReferenceFrame)
        np.testing.assert_allclose(got.position, [1.0, 1.0, 1.0])

    def test_remove_entity_frees_slot(self):
        w = World(capacity=4)
        ids = [w.create_entity(ReferenceFrame()) for _ in range(4)]
        w.remove_entity(ids[1])
        assert w.n_alive == 3
        e_new = w.create_entity(Motion())
        assert w.n_alive == 4
        assert not w.has_component(e_new, ReferenceFrame)

    def test_capacity_exhaustion_raises(self):
        w = World(capacity=2)
        w.create_entity()
        w.create_entity()
        with pytest.raises(RuntimeError):
            w.create_entity()

    def test_entity_ids_stable_and_custom(self):
        w = World(capacity=8)
        e = w.create_entity(entity_id=12345)
        assert e == 12345
        with pytest.raises(ValueError):
            w.create_entity(entity_id=12345)

    def test_component_fields_roundtrip(self):
        w = World(capacity=8)
        e = w.create_entity(
            SphericalCollidable(kind=0, center=(0.0, 1.0, 0.0), radius=2.5, restitution=0.9)
        )
        c = w.get_component(e, SphericalCollidable)
        assert c.radius == pytest.approx(2.5)
        assert c.restitution == pytest.approx(0.9)
        np.testing.assert_allclose(c.center, [0.0, 1.0, 0.0])

    def test_setup_components_strip(self):
        w = World(capacity=8)
        e = w.create_entity(
            ReferenceFrame(),
            DynamicRigidBodySubstance(mass_density=2.0),
            ConstantAcceleration(),
        )
        assert w.has_component(e, DynamicRigidBodySubstance)
        w.strip_setup_components(e)
        assert not w.has_component(e, DynamicRigidBodySubstance)
        assert not w.has_component(e, ConstantAcceleration)
        assert w.has_component(e, ReferenceFrame)


class TestStager:
    def test_staged_create_remove(self):
        w = World(capacity=8)
        e1 = w.create_entity(ReferenceFrame())
        w.stager.stage_creation(ReferenceFrame(position=(1.0, 0.0, 0.0)), _TestTag(value=3))
        w.stager.stage_removal(e1)
        assert w.n_alive == 1  # not yet applied
        created = w.stager.apply()
        assert len(created) == 1
        assert w.n_alive == 1
        assert w.get_component(created[0], _TestTag).value == 3
        assert not w.has_entity(e1)
