"""Drag-load map tests (ref: impact_physics/src/force/detailed_drag —
direction-sampled force/torque tables, equirectangular storage, disk cache)."""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from impact_tpu.physics.drag_map import (
    build_drag_load_map,
    get_or_build_drag_load_map,
    sample_drag_load,
)
from impact_tpu.scene.mesh import box_mesh, sphere_mesh


class TestDragLoadMap:
    @pytest.mark.slow
    def test_sphere_force_opposes_motion_no_torque(self):
        m = sphere_mesh(radius=1.0, n_rings=24, n_segments=48)
        dm = build_drag_load_map(m.positions, m.indices)
        for d in ([1, 0, 0], [0, -1, 0], [0.577, 0.577, 0.577], [0, 0, -1]):
            d = np.asarray(d, np.float64)
            d /= np.linalg.norm(d)
            fc, tc = sample_drag_load(dm.table, jnp.asarray(d, jnp.float32))
            f, t = np.asarray(fc), np.asarray(tc)
            # drag force pushes the body along the incoming flow
            assert f @ d / np.linalg.norm(f) > 0.99
            # symmetric shape about its COM: no drag torque
            assert np.linalg.norm(t) < 0.05 * np.linalg.norm(f)

    @pytest.mark.slow
    def test_sphere_newtonian_drag_coefficient(self):
        """Newtonian flat-plate integration over a sphere gives |F| ≈ Cd·A
        with Cd ≈ 1 (per unit dynamic pressure)."""
        m = sphere_mesh(radius=1.0, n_rings=32, n_segments=64)
        dm = build_drag_load_map(m.positions, m.indices)
        fc, _ = sample_drag_load(dm.table, jnp.array([1.0, 0.0, 0.0]))
        cd = float(np.linalg.norm(np.asarray(fc))) / np.pi  # A = π r²
        assert 0.9 < cd < 1.2, cd

    def test_box_face_vs_corner_drag(self):
        """A box faces more drag flat-on than corner-on per the flat-plate
        model (projected-area × cos² weighting)."""
        m = box_mesh((2.0, 2.0, 2.0))
        dm = build_drag_load_map(m.positions, m.indices)
        f_face, _ = sample_drag_load(dm.table, jnp.array([1.0, 0.0, 0.0]))
        corner = jnp.asarray(np.ones(3) / np.sqrt(3), jnp.float32)
        f_corner, _ = sample_drag_load(dm.table, corner)
        assert np.linalg.norm(np.asarray(f_face)) > np.linalg.norm(
            np.asarray(f_corner)
        )

    def test_offset_com_produces_torque(self):
        """With the COM off the pressure center, drag exerts a torque."""
        m = sphere_mesh(radius=1.0, n_rings=24, n_segments=48)
        dm = build_drag_load_map(m.positions, m.indices, center_of_mass=(0, 0, 2.0))
        fc, tc = sample_drag_load(dm.table, jnp.array([1.0, 0.0, 0.0]))
        assert np.linalg.norm(np.asarray(tc)) > 0.1 * np.linalg.norm(np.asarray(fc))

    def test_disk_cache_round_trip(self, tmp_path):
        m = sphere_mesh(radius=0.5, n_rings=8, n_segments=16)
        a = get_or_build_drag_load_map(m.positions, m.indices, directory=tmp_path)
        files = list(pathlib.Path(tmp_path).iterdir())
        assert len(files) == 1 and files[0].suffix == ".npz"
        b = get_or_build_drag_load_map(m.positions, m.indices, directory=tmp_path)
        np.testing.assert_array_equal(np.asarray(a.table), np.asarray(b.table))

    @pytest.mark.slow
    def test_engine_integration_drag_map_slows_body(self):
        """A DetailedDrag sphere in a dense medium decelerates via the
        sampled map (setup assigns the map; forces.py samples it)."""
        import jax

        from impact_tpu.ecs import World, components as C
        from impact_tpu.runtime import HeadlessRuntime, compile_scene
        from impact_tpu.utils.config import EngineConfig

        cfg = EngineConfig()
        cfg.tpu.max_voxel_objects = 1
        cfg.tpu.max_bodies = 8
        cfg.tpu.max_contacts = 32
        cfg.tpu.voxel_grid_size = 16
        cfg.physics.medium.mass_density = 10.0
        cfg.physics.simulator.initial_time_step_duration = 0.01
        cfg.physics.rigid_body_force.drag_load_map_config.directory = None

        def make_world():
            # compile_scene strips setup components (ref: setup.rs:64-66), so
            # each compile needs a fresh world
            world = World()
            world.create_entity(
                C.ReferenceFrame(position=(0.0, 0.0, 0.0)),
                C.Motion(linear_velocity=(5.0, 0.0, 0.0)),
                C.SphericalCollidable(kind=0, radius=0.5),
                C.DynamicRigidBodySubstance(mass_density=100.0),
                C.DetailedDrag(drag_coefficient=1.0),
            )
            return world

        build = compile_scene(make_world(), cfg)
        assert int(build.params.phys_params.forces.drag_map_index[0]) == 0
        rt = HeadlessRuntime(build, cfg)
        v0 = float(rt.sim.phys.bodies.velocity[0, 0])
        rt.step(50)
        from impact_tpu.physics.state import compute_velocities

        v, _ = compute_velocities(rt.sim.phys.bodies)
        v1 = float(v[0, 0])
        assert 0.0 < v1 < v0  # decelerating along +x, not reversed
