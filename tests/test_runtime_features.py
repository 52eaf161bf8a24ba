"""Commands, checkpoint/resume, controllers, scene graph."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate

from impact_tpu.ecs import World
from impact_tpu.ecs import components as C
from impact_tpu.models import ball_pit
from impact_tpu.runtime import HeadlessRuntime, compile_scene
from impact_tpu.scene.controller import (
    EntityController,
    MotionController,
    RollFreeCameraOrientationController,
)
from impact_tpu.scene.graph import world_transforms
from impact_tpu.utils.config import EngineConfig


def tiny_runtime():
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = 2
    cfg.tpu.max_bodies = 24
    cfg.tpu.max_contacts = 64
    cfg.tpu.voxel_grid_size = 16
    cfg.tpu.render_width = 48
    cfg.tpu.render_height = 32
    cfg.rendering.shadow_mapping.enabled = False
    cfg.rendering.ambient_occlusion.enabled = False
    world = ball_pit(n_balls=3)
    return HeadlessRuntime(compile_scene(world, cfg), cfg)


class TestCommands:
    def test_pause_resume(self):
        rt = tiny_runtime()
        rt.step(5)
        p0 = np.asarray(rt.sim.phys.bodies.position)
        rt.enqueue_command("game_loop", "pause")
        rt.step(5)
        np.testing.assert_array_equal(p0, np.asarray(rt.sim.phys.bodies.position))
        rt.enqueue_command("game_loop", "resume")
        rt.step(5)
        assert not np.array_equal(p0, np.asarray(rt.sim.phys.bodies.position))

    def test_physics_command_changes_solver(self):
        rt = tiny_runtime()
        rt.enqueue_command("physics", "set_n_iterations", 2)
        rt.step(1)
        assert rt.config.physics.constraint_solver.n_iterations == 2

    def test_gizmo_overlay_renders(self):
        """Gizmo overlays draw visible line pixels over the frame
        (ref: impact_gizmo dedicated passes + GizmoAdminCommand)."""
        rt = tiny_runtime()
        rt.step(3)
        base = np.asarray(rt.render())
        rt.enqueue_command("gizmo", "show", "reference_frame_axes")
        rt.enqueue_command("gizmo", "show", "linear_velocity")
        rt.apply_commands()
        assert rt.visible_gizmos == ("linear_velocity", "reference_frame_axes")
        overlaid = np.asarray(rt.render())
        assert (overlaid != base).any()
        rt.enqueue_command("gizmo", "set_visible", ())
        rt.apply_commands()
        assert rt.visible_gizmos == ()

    def test_all_21_gizmo_types_render(self):
        """Every reference GizmoType (impact_gizmo/src/lib.rs:39-61) builds
        and overlays without error in one pass."""
        from impact_tpu.render.gizmos import ALL_GIZMO_TYPES

        assert len(ALL_GIZMO_TYPES) == 21
        rt = tiny_runtime()
        rt.step(2)
        base = np.asarray(rt.render())
        rt.enqueue_command("gizmo", "set_visible", ALL_GIZMO_TYPES)
        rt.apply_commands()
        overlaid = np.asarray(rt.render())
        assert overlaid.shape == base.shape
        assert (overlaid != base).any()

    def test_rendering_command_rebuilds_config(self):
        rt = tiny_runtime()
        rt.enqueue_command("rendering", "set_tone_mapping", "KhronosPBRNeutral")
        rt.apply_commands()
        assert rt.render_config.tone_mapping == "KhronosPBRNeutral"

    def test_reset_world(self):
        rt = tiny_runtime()
        p0 = np.asarray(rt.sim.phys.bodies.position)
        rt.step(20)
        rt.enqueue_command("system", "reset_world")
        rt.apply_commands()
        np.testing.assert_array_equal(p0, np.asarray(rt.sim.phys.bodies.position))

    def test_unknown_command_raises(self):
        rt = tiny_runtime()
        rt.enqueue_command("rendering", "bogus", 1)
        with pytest.raises(ValueError):
            rt.apply_commands()


class TestCheckpoint:
    def test_roundtrip_bit_exact(self, tmp_path):
        rt = tiny_runtime()
        rt.step(10)
        path = rt.save_checkpoint(tmp_path / "ckpt.npz", {"frame": 10})
        saved_pos = np.asarray(rt.sim.phys.bodies.position)
        rt.step(10)
        meta = rt.load_checkpoint(path)
        assert meta == {"frame": 10}
        np.testing.assert_array_equal(
            saved_pos, np.asarray(rt.sim.phys.bodies.position)
        )

    def test_resume_determinism(self, tmp_path):
        rt = tiny_runtime()
        rt.step(5)
        rt.save_checkpoint(tmp_path / "c.npz")
        rt.step(7)
        end_a = np.asarray(rt.sim.phys.bodies.position)
        rt.load_checkpoint(tmp_path / "c.npz")
        rt.step(7)
        end_b = np.asarray(rt.sim.phys.bodies.position)
        np.testing.assert_array_equal(end_a, end_b)


class TestController:
    def test_motion_controller_directions(self):
        mc = MotionController(movement_speed=2.0)
        mc.set_direction("forward", True)
        v = mc.local_velocity()
        np.testing.assert_allclose(v, [0, 0, -2.0], atol=1e-6)
        mc.set_direction("right", True)
        v = mc.local_velocity()
        assert np.linalg.norm(v) == pytest.approx(2.0)
        mc.stop()
        np.testing.assert_allclose(mc.local_velocity(), 0.0)

    def test_orientation_roll_free(self):
        oc = RollFreeCameraOrientationController(sensitivity=1.0)
        oc.update(0.5, 0.2)
        q = oc.orientation()
        # no roll: the rotated x-axis stays horizontal
        from impact_tpu.math import quaternion as quat

        right = np.asarray(quat.rotate(q, np.array([1.0, 0, 0])))
        assert abs(right[1]) < 1e-6

    def test_pitch_clamped(self):
        oc = RollFreeCameraOrientationController()
        oc.update(0.0, -100.0)
        assert oc.pitch <= 0.49 * np.pi + 1e-6

    def test_entity_controller_writes_body(self):
        rt = tiny_runtime()
        ctl = EntityController(body_index=0)
        ctl.motion.set_direction("forward", True)
        rt.sim = ctl.apply(rt.sim)
        v = np.asarray(rt.sim.phys.bodies.velocity[0])
        assert np.linalg.norm(v) > 0


class TestSceneGraph:
    def test_parent_compose(self):
        w = World(capacity=8)
        parent = w.create_entity(
            C.ReferenceFrame(position=(1.0, 0.0, 0.0),
                             orientation=tuple(np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)))
        )
        child = w.create_entity(
            C.ReferenceFrame(position=(1.0, 0.0, 0.0)),
            C.Parent(entity_id=parent),
        )
        t = world_transforms(w)
        p, q = t[child]
        # child at parent + 90°-rotated (1,0,0) = (1,1,0)
        np.testing.assert_allclose(p, [1.0, 1.0, 0.0], atol=1e-5)

    def test_cycle_detection(self):
        w = World(capacity=4)
        a = w.create_entity(C.ReferenceFrame())
        b = w.create_entity(C.ReferenceFrame(), C.Parent(entity_id=a))
        w.add_component(a, C.Parent(entity_id=b))
        with pytest.raises(ValueError):
            world_transforms(w)


def test_profile_trace_writes_events(tmp_path):
    """rt.profile captures an XProf/Perfetto trace (the Tracy analog)."""
    rt = tiny_runtime()
    with rt.profile(str(tmp_path)):
        rt.step(2)
    import pathlib

    files = list(pathlib.Path(tmp_path).rglob("*"))
    assert any(f.is_file() for f in files), files


class TestDistanceTriggeredRules:
    def test_shadow_disable_and_removal(self):
        """Beyond no_shadowing distance the object stops casting shadows;
        beyond removal distance its body and voxel slot deactivate
        (ref: impact_scene DistanceTriggeredRules, systems.rs:80)."""
        cfg = EngineConfig()
        cfg.tpu.max_voxel_objects = 2
        cfg.tpu.max_bodies = 16
        cfg.tpu.max_contacts = 32
        cfg.tpu.voxel_grid_size = 16
        cfg.tpu.render_width = 48
        cfg.tpu.render_height = 32
        cfg.rendering.shadow_mapping.enabled = False
        cfg.rendering.ambient_occlusion.enabled = False
        cfg.physics.simulator.initial_time_step_duration = 0.01
        world = World()
        anchor = world.create_entity(
            C.ReferenceFrame(position=(0.0, 0.0, 0.0)),
            C.KinematicRigidBodyMarker(),
        )
        world.create_entity(
            C.ReferenceFrame(position=(4.0, 0.0, 0.0)),
            C.Motion(linear_velocity=(2.0, 0.0, 0.0)),
            C.VoxelBox(voxel_extent=0.25, extent_x=6, extent_y=6, extent_z=6),
            C.SameVoxelType(voxel_type=0),
            C.DynamicVoxels(),
            C.DistanceTriggeredRules(
                anchor_id=anchor,
                no_shadowing_dist_squared=36.0,  # 6 units
                removal_dist_squared=100.0,  # 10 units
            ),
        )
        rt = HeadlessRuntime(compile_scene(world, cfg), cfg)
        assert bool(rt.sim.voxels.casts_shadows[0])
        rt.step(1)  # at ~4 units: both within limits
        assert bool(rt.sim.voxels.casts_shadows[0])
        assert bool(rt.sim.voxels.alive[0])
        rt.step(180)  # drifts to ~7.6 units: shadows off, still alive
        assert not bool(rt.sim.voxels.casts_shadows[0])
        assert bool(rt.sim.voxels.alive[0])
        rt.step(200)  # beyond 10 units: removed
        assert not bool(rt.sim.voxels.alive[0])
        body = int(rt.params.dist_rules.body[0])
        assert int(rt.sim.phys.bodies.kind[body]) == 0
